"""Analysis-only smoke over the registry: build every ``queries()`` plan
against the REAL testdata and force Spark analysis (``.schema``) without
executing a job — catches schema-drift crashes (the round-4 class:
AnalysisException at plan time from a stale physical-layout assumption)
in seconds instead of at the driver's correctness gate.

Note: ``stream_hourly_counts`` runs a real micro-batch when its DataFrame
is built, so this script is "analysis-only" for 49/50 entries and a small
execution for that one — still fast at sf0.001.

Usage: python scripts/smoke_analysis.py [sf_dir]
Exit code 0 = every registered query analyzes cleanly.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from datawarehouse_group10_spark.contract import QUERIES
    from datawarehouse_group10_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    failures = []
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            schema = fn(spark, sf_dir).schema
            print(f"OK    {name}: {len(schema.fields)} cols "
                  f"[{time.time() - t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
    print(f"\n{len(QUERIES) - len(failures)} ok, {len(failures)} fail")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

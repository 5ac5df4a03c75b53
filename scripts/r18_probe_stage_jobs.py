"""Per-job wall-clock breakdown of the cold snapshot stages (r18
continuation, guide §1): stage each of {cdf, mor, tf, merge, evolve}
in a SCRATCH warehouse and print every Spark job's description +
duration plus the py4j-side gap (time not inside any job = driver/
metadata work). Run AFTER pytest finishes — needs a quiet host.

Usage: python scripts/r18_probe_stage_jobs.py [cdf|mor|tf|merge|evolve|all]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
scratch = tempfile.mkdtemp(prefix="graft_probe_wh_")
os.environ["SPARK_GRAFT_WAREHOUSE"] = scratch

from datawarehouse_group10_spark import contract  # noqa: E402
from datawarehouse_group10_spark.session import get_spark  # noqa: E402

STAGES = {
    "cdf": contract.cdf_snapshot_orders,
    "mor": contract.mor_snapshot_orders,
    "tf": contract.merged_snapshot_orders_tf,
    "merge": contract.merged_snapshot_orders,
    "evolve": contract.evolve_snapshot_orders,
}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(STAGES) if which == "all" else [which]
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # burn-in + reference burn to classify the host window
    t0 = time.time()
    spark.range(2_000_000_000, numPartitions=32).selectExpr(
        "bit_xor(xxhash64(id, 7)) as x"
    ).collect()
    print(f"ref_burn_32t: {time.time() - t0:.2f}s")

    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    for name in names:
        fn = STAGES[name]
        t0 = time.time()
        fn(spark, SF_DIR)
        wall = time.time() - t0
        # pull job data from the status store via the REST-ish API
        store = jsc.statusStore()
        jobs = store.jobsList(None)
        total_job = 0.0
        rows = []
        for i in range(jobs.size()):
            j = jobs.apply(i)
            sub = j.submissionTime()
            comp = j.completionTime()
            if sub.isEmpty() or comp.isEmpty():
                continue
            t_sub = sub.get().getTime() / 1000.0
            t_comp = comp.get().getTime() / 1000.0
            if t_comp < t0:
                continue
            dur = t_comp - max(t_sub, t0)
            total_job += dur
            desc = j.description()
            d = desc.get() if not desc.isEmpty() else j.name()
            rows.append((dur, j.jobId(), str(d)[:110]))
        rows.sort(key=lambda r: -r[0])
        print(f"\n=== {name}: wall {wall:.2f}s, in-job {total_job:.2f}s, "
              f"gap {wall - total_job:.2f}s, jobs {len(rows)} ===")
        for dur, jid, d in rows[:28]:
            print(f"  {dur:6.2f}s  job{jid:<4d} {d}")
    spark.stop()
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()

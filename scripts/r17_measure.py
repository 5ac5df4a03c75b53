"""Round-17 measurement helper: time contract q_* bodies through the
noop sink (guide §1.4) and capture .explain('formatted') to
plans/r17/<name>_<tag>.txt (the judge-facing plan artifacts).

Usage:
  python scripts/r17_measure.py [--tag before|after] [--reps N] [--sf DIR]
         [--no-plan] name [name ...]

Names are q_* function suffixes (bench.py convention). Timing
methodology matches bench.py: 1 untimed warmup, then N timed noop
writes, report min/median/all. Job descriptions are set per query
(guide §1.5).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    from datawarehouse_group10_spark import contract
    from datawarehouse_group10_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")
    plan_dir = os.path.join(REPO, "plans", "r17")
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.names:
        fn = getattr(contract, f"q_{name}")
        sc = spark.sparkContext
        sc.setJobDescription(f"r17 {args.tag}: {name} warmup")
        for _ in range(args.warmup):
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(args.reps):
            sc.setJobDescription(f"r17 {args.tag}: {name} rep{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        if not args.no_plan:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(plan_dir,
                                   f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        print(f"{name}: min={min(samples)} "
              f"median={statistics.median(samples)} all={samples}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-18 measurement helper: time contract q_* bodies through the
noop sink (guide §1.4) and capture .explain('formatted') to
plans/r18/<name>_<tag>.txt, plus time the one-time STAGING functions
this round targets (VERDICT r17 #3/#5/#6: pq_train, ann_index,
minhash_shingle, snapshot_cdf) cold via a fresh warehouse.

Usage:
  python scripts/r18_measure.py [--tag before|after] [--reps N] [--sf DIR]
         [--no-plan] name [name ...]

Names are q_* function suffixes (bench.py convention), or one of the
stage pseudo-names: stage:shingles stage:ann stage:cdf stage:mor
stage:tf stage:merge (these wipe nothing themselves — run with a fresh
GRAFT_WAREHOUSE / fresh process for cold numbers). Timing methodology
matches bench.py: 1 untimed warmup, then N timed noop writes, report
min/median/all. Job descriptions are set per query (guide §1.5).
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
    plan_dir = os.path.join(REPO, "plans", "r18")
    os.makedirs(plan_dir, exist_ok=True)
    sc = spark.sparkContext

    def stage(name: str) -> None:
        """One-time staging cost: run once, print the phase stats."""
        t0 = time.time()
        if name == "shingles":
            contract.staged_shingles(spark, args.sf)
            extra = dict(contract.SHINGLE_STAGE_TIMINGS)
        elif name == "ann":
            contract.ann_index(spark, args.sf)
            extra = {**contract.ANN_STAGE_TIMINGS,
                     **{f"pq_{k}": v
                        for k, v in contract.PQ_TRAIN_STATS.items()}}
        elif name == "cdf":
            contract.cdf_snapshot_orders(spark, args.sf)
            extra = dict(contract.CDF_STATS)
        elif name == "mor":
            contract.mor_snapshot_orders(spark, args.sf)
            extra = dict(contract.MOR_STATS)
        elif name == "tf":
            contract.merged_snapshot_orders_tf(spark, args.sf)
            extra = dict(contract.MERGE_TF_STATS)
        elif name == "merge":
            contract.merged_snapshot_orders(spark, args.sf)
            extra = dict(contract.MERGE_STATS)
        else:
            raise SystemExit(f"unknown stage pseudo-name: {name}")
        print(f"stage:{name}: total={round(time.time() - t0, 3)} "
              f"stats={extra}", flush=True)

    for name in args.names:
        if name.startswith("stage:"):
            sc.setJobDescription(f"r18 {args.tag}: {name}")
            stage(name.split(":", 1)[1])
            sc.setJobDescription(None)
            continue
        fn = getattr(contract, f"q_{name}")
        sc.setJobDescription(f"r18 {args.tag}: {name} warmup")
        for _ in range(args.warmup):
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(args.reps):
            sc.setJobDescription(f"r18 {args.tag}: {name} rep{i}")
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

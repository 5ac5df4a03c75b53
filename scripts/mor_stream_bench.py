"""COW vs merge-on-read streaming-CDC trade, re-measurable per round
(r15 PERF item 13; re-run r16 after VERDICT r15 #2 made MOR delete
application a single scan regardless of outstanding-ref count).

Stages a snapshot of sf0.1 orders (80 month partitions), generates 20
one-file microbatches of ~150 mixed changes (2/3 upserts over existing
keys, 1/6 inserts, 1/6 deletes), then drives run_stream_cdc_apply over
them in each requested mode and reports wall seconds, bytes written
under the table, and the final row count (must be identical across
modes).

Usage: python scripts/mor_stream_bench.py [cow] [mor] [mor8] [morb]
(default: mor). ``morb`` = mor with a key-bloom policy on the merge
key — on this uuid-ish-keyed workload the manifest range stats prune
nothing (every batch's key range spans every month), so the digest is
what turns the per-batch probe from ~all partitions into the true
homes. Run solo (bench co-tenancy protocol). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 20


def tree_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, names in os.walk(path):
        for f in names:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    modes = sys.argv[1:] or ["mor"]

    from pyspark.sql import functions as F

    from datawarehouse_group10_spark.session import get_spark
    from datawarehouse_group10_spark.sources.layout import (
        snapshot_read,
        snapshot_write,
    )
    from datawarehouse_group10_spark.streaming import run_stream_cdc_apply

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="mor_stream_")
    out: dict[str, dict] = {}
    try:
        po = (
            spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
            .select(
                F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
                "o_orderkey",
                "o_totalprice",
            )
        )
        # 20 one-file microbatches, ~150 mixed changes each, keyed so
        # every batch is deterministic and touches many partitions
        cdc_dir = os.path.join(root, "cdc")
        k = F.col("o_orderkey")
        for b in range(N_BATCHES):
            upd = (
                po.filter(k % 997 == b)
                .limit(100)
                .withColumn(
                    "o_totalprice", F.col("o_totalprice") + F.lit(1.0 + b)
                )
                .withColumn("_del", F.lit(False))
            )
            ins = (
                po.filter(k % 991 == b)
                .limit(25)
                .withColumn("o_orderkey", -(k + b * 10_000_000))
                .withColumn("_del", F.lit(False))
            )
            dele = (
                po.filter(k % 983 == b)
                .limit(25)
                .withColumn("_del", F.lit(True))
            )
            (
                upd.unionByName(ins)
                .unionByName(dele)
                .withColumn("_seq", F.lit(b))
                .coalesce(1)
                .write.mode("append")
                .parquet(cdc_dir)
            )

        for mode in modes:
            tbl = os.path.join(root, f"tbl_{mode}")
            snapshot_write(
                po, tbl, "o_month",
                key_bloom=["o_orderkey"] if mode == "morb" else None,
            )
            base_bytes = tree_bytes(tbl)
            stream = (
                spark.readStream.schema(
                    "o_month string, o_orderkey bigint, "
                    "o_totalprice double, _del boolean, _seq int"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(cdc_dir)
            )
            t0 = time.time()
            run_stream_cdc_apply(
                stream,
                tbl,
                "o_month",
                ["o_orderkey"],
                delete_col="_del",
                seq_col="_seq",
                checkpoint_dir=os.path.join(root, f"ck_{mode}"),
                update_mode="cow" if mode == "cow" else "mor",
                exactly_once_id=None,
                compact_every=8 if mode == "mor8" else None,
                timeout_sec=1800,
            )
            secs = time.time() - t0
            t1 = time.time()
            n = snapshot_read(spark, tbl).count()
            out[mode] = {
                "secs": round(secs, 1),
                "mb_written": round(
                    (tree_bytes(tbl) - base_bytes) / 1e6, 2
                ),
                "final_rows": n,
                "final_read_secs": round(time.time() - t1, 2),
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps({"metric": "mor_stream_bench", "modes": out}))


if __name__ == "__main__":
    main()

"""A/B probe (r18, VERDICT r17 #6): the cdf_snapshot_orders fixture
chain with its two source commits as copy-on-write merges (the r17
shape) vs merge-on-read upserts (the r18 shape). Same machine, same
process. Verifies the destination table AND the v1->v2 4-tag diff are
IDENTICAL between the two chains, and times each phase."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datawarehouse_group10_spark.session import get_spark
from datawarehouse_group10_spark.sources.layout import (
    snapshot_diff,
    snapshot_merge,
    snapshot_read,
    snapshot_upsert_mor,
    snapshot_write,
)
from datawarehouse_group10_spark.streaming import apply_cdf_to_snapshot

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

po = (
    spark.read.parquet(os.path.join(SF, "orders.parquet"))
    .select(
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
        "o_orderkey",
        "o_totalprice",
    )
)
po.count()  # warm
k = F.col("o_orderkey")
upd = po.filter(k % 113 == 0).withColumn(
    "o_totalprice", F.col("o_totalprice") + F.lit(3.0)
)
ins = po.filter((k % 127 == 0) & (k != 0)).withColumn("o_orderkey", -k)
dele = po.filter(k % 119 == 0).withColumn("_d", F.lit(True))


def chain(mode: str) -> tuple[str, dict]:
    base = tempfile.mkdtemp(prefix=f"cdfab_{mode}_")
    src, dst = os.path.join(base, "src"), os.path.join(base, "dst")
    t = {}
    t0 = time.time()
    snapshot_write(po, src, "o_month")
    snapshot_write(po, dst, "o_month")
    t["write"] = round(time.time() - t0, 3)
    t0 = time.time()
    if mode == "cow":
        snapshot_merge(spark, upd.unionByName(ins), src, "o_month",
                       ["o_orderkey"])
        snapshot_merge(spark, dele, src, "o_month", ["o_orderkey"],
                       delete_col="_d")
    else:
        snapshot_upsert_mor(spark, upd.unionByName(ins), src, "o_month",
                            ["o_orderkey"])
        snapshot_upsert_mor(spark, dele, src, "o_month", ["o_orderkey"],
                            delete_col="_d")
    t["src_commits"] = round(time.time() - t0, 3)
    t0 = time.time()
    apply_cdf_to_snapshot(spark, src, dst, "o_month", ["o_orderkey"],
                          start_version=1)
    st2 = apply_cdf_to_snapshot(spark, src, dst, "o_month", ["o_orderkey"])
    assert st2["delivered"] == 0
    t["apply"] = round(time.time() - t0, 3)
    t["total"] = round(sum(t.values()), 3)
    return base, t


res = {}
for mode in ("cow", "mor"):
    base, t = chain(mode)
    res[mode] = (base, t)
    print(f"{mode}: {t}", flush=True)

# equivalence: dst final state + the 4-tag v1->v2 diff off the source
def _same(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols, (a.columns, b.columns)
    a, b = a.select(*cols), b.select(*cols)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


same_dst = _same(
    snapshot_read(spark, os.path.join(res["cow"][0], "dst")),
    snapshot_read(spark, os.path.join(res["mor"][0], "dst")),
)
same_diff = _same(
    snapshot_diff(spark, os.path.join(res["cow"][0], "src"), 1, 2,
                  "o_month", update_keys=["o_orderkey"]),
    snapshot_diff(spark, os.path.join(res["mor"][0], "src"), 1, 2,
                  "o_month", update_keys=["o_orderkey"]),
)
print("dst identical:", same_dst, " v1->v2 4-tag diff identical:", same_diff)
spark.stop()
sys.exit(0 if (same_dst and same_diff) else 1)

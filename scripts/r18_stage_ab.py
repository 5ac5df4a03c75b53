"""A/B capture for the r18-continuation merge/upsert touched-set
fusion: time the cold snapshot stage chains against a given repo tree
(old=pre-fusion / new=HEAD), fresh process, fresh scratch warehouse,
reference burn printed first so the host window is classified in-band.

Usage: python r18_stage_ab.py <tree_root> <tag> [stage ...]
(default stages: merge mor tf cdf). Prints one RES line per stage.
"""
import os
import sys
import tempfile
import time

TREE, TAG = sys.argv[1], sys.argv[2]
STAGES = sys.argv[3:] or ["merge", "mor", "tf", "cdf"]
sys.path.insert(0, TREE)
os.environ["SPARK_GRAFT_WAREHOUSE"] = tempfile.mkdtemp(prefix=f"whab_{TAG}_")

from datawarehouse_group10_spark.session import get_spark  # noqa: E402
from datawarehouse_group10_spark import contract  # noqa: E402

spark = get_spark(master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

t0 = time.time()
spark.range(2_000_000_000, numPartitions=32).selectExpr(
    "bit_xor(xxhash64(id, 7)) as x"
).collect()
print(f"RES {TAG} ref_burn_32t {round(time.time() - t0, 2)}", flush=True)

FNS = {
    "merge": contract.merged_snapshot_orders,
    "mor": contract.mor_snapshot_orders,
    "tf": contract.merged_snapshot_orders_tf,
    "cdf": contract.cdf_snapshot_orders,
}
for name in STAGES:
    t0 = time.time()
    FNS[name](spark, SF)
    print(f"RES {TAG} {name}_stage_cold {round(time.time() - t0, 3)}",
          flush=True)
spark.stop()
import shutil  # noqa: E402

shutil.rmtree(os.environ["SPARK_GRAFT_WAREHOUSE"], ignore_errors=True)

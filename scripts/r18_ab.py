"""A/B capture for r18: run the ANN/shingle/dedup chain cold + warm
query reps against a given repo tree (old=4c10ec2 / new=HEAD), fresh
process, fresh warehouse. Usage: python r18_ab.py <tree_root> <tag>
[--plans]  — plans land in /root/repo/plans/r18/<q>_<tag>.txt."""
import contextlib
import io
import os
import statistics
import sys
import tempfile
import time

TREE, TAG = sys.argv[1], sys.argv[2]
PLANS = "--plans" in sys.argv
sys.path.insert(0, TREE)
os.environ["SPARK_GRAFT_WAREHOUSE"] = tempfile.mkdtemp(prefix=f"wh_{TAG}_")

from datawarehouse_group10_spark.session import get_spark
from datawarehouse_group10_spark import contract

spark = get_spark(master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
contract.q_a5_minmax_scalars(spark, SF).collect()

t0 = time.time()
contract.ann_index(spark, SF)
print(f"RES {TAG} ann_chain_cold "
      f"{round(time.time() - t0, 3)} "
      f"(train {contract.PQ_TRAIN_STATS.get('seconds')} + res "
      f"{contract.PQ_TRAIN_STATS.get('res_seconds')} + stage "
      f"{contract.ANN_STAGE_TIMINGS.get('stage')})", flush=True)

t0 = time.time()
contract.staged_shingles(spark, SF)
print(f"RES {TAG} shingle_stage_cold {round(time.time() - t0, 3)} "
      f"{contract.SHINGLE_STAGE_TIMINGS}", flush=True)

QUERIES = [
    "dedup_minhash_lsh",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "sim_cosine_scores",
    "dedup_semantic",
    "dedup_ngram_jaccard",
]
plan_dir = "/root/repo/plans/r18"
os.makedirs(plan_dir, exist_ok=True)
for name in QUERIES:
    fn = getattr(contract, f"q_{name}")
    fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"RES {TAG} {name} min={min(samples)} "
          f"med={statistics.median(samples)} all={samples}", flush=True)
    if PLANS:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF).explain("formatted")
        with open(os.path.join(plan_dir, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(buf.getvalue())

if PLANS:
    # VERDICT r17 #9: the dedup_semantic PAIR-GENERATION subtree,
    # captured BEFORE any checkpoint truncates lineage — must show the
    # ids+codes-only exchange payload.
    from pyspark.sql import functions as F
    from datawarehouse_group10_spark.functions.similarity import (
        banded_pairs_from_codes,
    )

    emb = contract._t(spark, SF, "embeddings").select("vec_id", "embedding")
    pairgen = banded_pairs_from_codes(
        contract.ann_index(spark, SF).select("vec_id", "_bc"),
        emb, threshold=0.4, max_bucket_size=None,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairgen.explain("formatted")
    with open(os.path.join(plan_dir, f"dedup_semantic_pairgen_{TAG}.txt"),
              "w") as fh:
        fh.write(buf.getvalue())
    print(f"RES {TAG} pairgen plan captured", flush=True)
spark.stop()

"""Probe (r18, VERDICT r17 #3): is the ANN train/encode cost driver
plan/codegen time from per-element F.lit trees, and does a single
Literal array (F.lit(list)) + HOF argmin produce BIT-IDENTICAL codes
faster?

Two shapes over the same 2000x64 corpus slice:
  A (current): per-entry dists = lit(c.c) - 2*aggregate(zip_with(v_s, array(lit...)))
  B (flat):    one F.lit([[...]]) codebook; zip_with(selfdots, cb, ...)

Prints wall times and whether the code columns are identical.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from datawarehouse_group10_spark.session import get_spark
from datawarehouse_group10_spark.functions.similarity import (
    _dot,
    _pydot,
    pq_codebooks,
    pq_encode,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
emb = emb.select("vec_id", "embedding")

t0 = time.time()
books = pq_codebooks(emb, 4, 16)
print("init pq_codebooks:", round(time.time() - t0, 3))


def pq_encode_flat(df, codebooks, vec_col="embedding"):
    sub = len(codebooks[0][0])
    codes = []
    for s, cb in enumerate(codebooks):
        v = F.slice(F.col(vec_col), s * sub + 1, sub)
        cb_lit = F.lit([[float(x) for x in c] for c in cb])
        sd_lit = F.lit([_pydot(c, c) for c in cb])
        darr = F.zip_with(sd_lit, cb_lit, lambda sd, c: sd - 2 * _dot(v, c))
        codes.append(
            (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
        )
    return df.withColumn("_pq", F.array(*codes))


for name, fn in (("A_current", pq_encode), ("B_flat", pq_encode_flat)):
    for rep in range(3):
        t0 = time.time()
        out = fn(emb, books)
        t_build = time.time() - t0
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        t_exec = time.time() - t0
        print(f"{name} rep{rep}: build={t_build:.3f} exec={t_exec:.3f}")

a = pq_encode(emb, books).orderBy("vec_id").select("_pq").collect()
b = pq_encode_flat(emb, books).orderBy("vec_id").select("_pq").collect()
print("codes identical:", a == b)

# and the training-iteration aggregation job cost, both shapes
from datawarehouse_group10_spark.functions.similarity import (
    pq_train_codebooks,
)

t0 = time.time()
bk_a = pq_train_codebooks(emb, m=4, k=16, n_iter=2)
print("train A (current):", round(time.time() - t0, 3))
spark.stop()

"""Round-3 empirical probes (throwaway): do the approximate queries'
outputs equal their exact counterparts at the driver-relevant scales?

1. minhash_lsh(threshold=0.5) pairs vs exact 3-shingle Jaccard pairs
2. lsh_bucket_topk(n_planes=6) vs brute_force_topk
3. ivf_topk(lowest-id centroids) vs brute_force_topk

Usage: python scripts/probe_r3.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_group10_spark.contract import _query_vector, _t, _utc  # noqa: E402
from datawarehouse_group10_spark.functions.dedup import (  # noqa: E402
    minhash_lsh_dup_pairs,
    ngram_jaccard_pairs,
)
from datawarehouse_group10_spark.functions.similarity import (  # noqa: E402
    brute_force_topk,
    deterministic_centroids,
    ivf_topk,
    lsh_bucket_topk,
)
from datawarehouse_group10_spark.session import get_spark  # noqa: E402

spark = get_spark(master="local[8]", shuffle_partitions=8)
_utc(spark)
docs = _t(spark, sf_dir, "documents")
emb = _t(spark, sf_dir, "embeddings")

t0 = time.time()
mh = {
    (r["id_a"], r["id_b"], round(r["jaccard"], 9))
    for r in minhash_lsh_dup_pairs(docs, jaccard_threshold=0.5).collect()
}
t_mh = time.time() - t0
t0 = time.time()
ex = {
    (r["id_a"], r["id_b"], round(r["jaccard"], 9))
    for r in ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_posting_len=None).collect()
}
t_ex = time.time() - t0
print(f"minhash pairs={len(mh)} [{t_mh:.1f}s]  exact pairs={len(ex)} [{t_ex:.1f}s]")
print(f"  minhash == exact: {mh == ex}")
if mh != ex:
    print(f"  missed by LSH: {sorted(ex - mh)[:10]}")
    print(f"  extra in LSH:  {sorted(mh - ex)[:10]}")
jacs = sorted(j for _, _, j in ex)
print(f"  exact-pair jaccard range: {jacs[:3]} .. {jacs[-3:]}")

q = _query_vector(spark, sf_dir)
brute = [(r["vec_id"], round(r["cosine"], 9)) for r in brute_force_topk(emb, q, k=10).collect()]
lsh = [(r["vec_id"], round(r["cosine"], 9)) for r in lsh_bucket_topk(emb, q, k=10, n_planes=6).collect()]
cents = deterministic_centroids(emb, k=16)
ivf = [(r["vec_id"], round(r["cosine"], 9)) for r in ivf_topk(emb, q, cents, k=10, n_probe=4).collect()]
print(f"brute == lsh: {brute == lsh}")
print(f"brute == ivf: {brute == ivf}")
if brute != lsh:
    print(f"  brute: {brute}\n  lsh:   {lsh}")
if brute != ivf:
    print(f"  brute: {brute}\n  ivf:   {ivf}")

# cell balance of current centroids
from datawarehouse_group10_spark.functions.similarity import ivf_assign  # noqa: E402

sizes = (
    ivf_assign(emb, cents)
    .groupBy("_cell")
    .count()
    .orderBy("_cell")
    .collect()
)
print("cell sizes:", [r["count"] for r in sizes])
spark.stop()

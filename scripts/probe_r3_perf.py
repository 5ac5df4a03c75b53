"""Round-3 perf experiments at sf0.1 (results go to PERF.md):

1. minhash_lsh_dup_pairs wall time with the multi-arg band hash
   (vs 11.0s recorded for the string-join shape in BENCH_r02), and
   num_perm=64/bands=16 vs num_perm=32/bands=8 cost + output parity.
2. IVF centroids: lowest-id seed vs kmeans (2 iter) — cell balance and
   recall@10 at n_probe=4, plus training cost.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from datawarehouse_group10_spark.contract import _query_vector, _t, _utc  # noqa: E402
from datawarehouse_group10_spark.functions.dedup import minhash_lsh_dup_pairs  # noqa: E402
from datawarehouse_group10_spark.functions.similarity import (  # noqa: E402
    brute_force_topk,
    deterministic_centroids,
    ivf_assign,
    ivf_topk,
    kmeans_centroids,
)
from datawarehouse_group10_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(master="local[32]", shuffle_partitions=32)
_utc(spark)
docs = _t(spark, sf_dir, "documents")
emb = _t(spark, sf_dir, "embeddings")

for num_perm, bands in [(64, 16), (32, 8)]:
    t0 = time.time()
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dup_pairs(
            docs, num_perm=num_perm, bands=bands, jaccard_threshold=0.5
        ).collect()
    }
    print(f"minhash num_perm={num_perm} bands={bands}: "
          f"{len(pairs)} pairs in {time.time()-t0:.1f}s")
    if num_perm == 64:
        ref_pairs = pairs
    else:
        print(f"  vs num_perm=64 output: equal={pairs == ref_pairs} "
              f"(missing {len(ref_pairs - pairs)}, extra {len(pairs - ref_pairs)})")

q = _query_vector(spark, sf_dir)
brute = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}

t0 = time.time()
seed = deterministic_centroids(emb, k=16)
t_seed = time.time() - t0
t0 = time.time()
km = kmeans_centroids(emb, k=16, n_iter=2)
t_km = time.time() - t0

for name, cents, t_build in [("seed", seed, t_seed), ("kmeans2", km, t_km)]:
    sizes = sorted(
        r["count"] for r in ivf_assign(emb, cents).groupBy("_cell").count().collect()
    )
    got = {r["vec_id"] for r in ivf_topk(emb, q, cents, k=10, n_probe=4).collect()}
    rec = len(got & brute) / 10
    print(f"ivf[{name}]: build={t_build:.1f}s recall@10={rec:.2f} "
          f"cells(min/med/max)={sizes[0]}/{sizes[len(sizes)//2]}/{sizes[-1]}")

spark.stop()

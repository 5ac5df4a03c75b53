"""Sampled semantic-dedup validation for sweep tiers ABOVE the
quadratic oracle CAP (r12, VERDICT r11 #7).

The registry oracle for `dedup_semantic` enumerates candidate pairs in
SQL, which is quadratic-by-contract and CAP'd at sf0.3 in sweeps — so
above that tier nothing validated the end-to-end keep decisions. This
script closes that gap WITHOUT enumerating all pairs:

1. GLOBAL label self-consistency on the full engine output (linear):
   one row per corpus vector, canonical_id <= vec_id, kept iff
   canonical, and the labeling is idempotent (canonical of a canonical
   is itself).
2. SAMPLED exact-cosine check: recompute the banded sign-LSH codes
   independently (numpy, from the same data-derived planes), pick a
   deterministic subset of (band, code) blocks, and for EVERY
   within-block pair with exact cosine >= threshold assert the engine
   put both rows in the same component. This is sound because the
   engine's uncapped banding makes every same-block pair a candidate:
   a missed union here is a real bug, not sampling noise.

Borderline fencing: rows with any |plane projection| < 1e-9 are
excluded from the block check (their sign bit can differ between
numpy's and the engine's summation order), and only pairs with cosine
>= threshold + 1e-9 are asserted (pairs AT the threshold may fall on
either side of it per fold order). Both exclusions are counted and
printed, so the coverage claim stays explicit.

Usage: python scripts/sampled_semantic_check.py [sf_dir] [--mod 7]
                                                [--cap N]
       (--mod M samples blocks where (band*1000003+code) % M == 0;
        --cap N runs the PRODUCTION semantic_dedup configuration with
        max_bucket_size=N instead of the registry query's uncapped one
        — blocks larger than N are then skipped on BOTH sides, since
        the engine legitimately drops them from candidate generation.
        Use --cap at replica-heavy scale tiers: gen_scale.py replicates
        vectors verbatim, so uncapped banding on sfK grows pair counts
        ~K^2 in the hot buckets — the exact degenerate-bucket shape the
        cap exists to fence off in production.)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BANDS = 4
N_PLANES = 16
THRESHOLD = 0.4
EPS = 1e-9


def main() -> int:
    args = list(sys.argv[1:])
    mod = 7
    cap = None
    if "--mod" in args:
        i = args.index("--mod")
        mod = int(args[i + 1])
        del args[i : i + 2]
    if "--cap" in args:
        i = args.index("--cap")
        cap = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import duckdb

    from datawarehouse_group10_spark.contract import (
        _lsh_data_planes,
        _t,
        q_dedup_semantic,
    )
    from datawarehouse_group10_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    if cap is None:
        out = q_dedup_semantic(spark, sf_dir).toPandas()
    else:
        from pyspark.sql import functions as F

        from datawarehouse_group10_spark.functions.similarity import (
            semantic_dedup,
        )

        emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        out = (
            semantic_dedup(
                emb,
                _lsh_data_planes(spark, sf_dir, n=N_PLANES),
                bands=BANDS,
                threshold=THRESHOLD,
                max_bucket_size=cap,
            )
            .orderBy(F.col("vec_id"))
            .toPandas()
        )
    engine_sec = time.time() - t0
    canon = dict(zip(out["vec_id"], out["canonical_id"]))

    # --- 1. global self-consistency (linear in corpus size) -------------
    problems: list[str] = []
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    n_corpus = con.execute(
        f"SELECT COUNT(*) FROM '{emb_path}'"
    ).fetchone()[0]
    if len(out) != n_corpus:
        problems.append(f"rows {len(out)} != corpus {n_corpus}")
    if (out["canonical_id"] > out["vec_id"]).any():
        problems.append("canonical_id > vec_id somewhere")
    if (out["kept"] != (out["canonical_id"] == out["vec_id"])).any():
        problems.append("kept != (canonical == id) somewhere")
    if any(canon.get(c, c) != c for c in set(out["canonical_id"])):
        problems.append("labeling not idempotent")

    # --- 2. sampled block check -----------------------------------------
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{emb_path}' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.array([r[1] for r in rows], dtype=np.float64)
    planes = np.array(_lsh_data_planes(spark, sf_dir, n=N_PLANES))
    P = V @ planes.T  # (n, 16) projections
    ambiguous = (np.abs(P) < EPS).any(axis=1)
    bits = P > 0
    r = N_PLANES // BANDS
    norms = np.linalg.norm(V, axis=1)

    blocks_sampled = members = pairs_above = violations = over_cap = 0
    for b in range(BANDS):
        codes = np.zeros(len(ids), dtype=np.int64)
        for k in range(r):
            codes |= bits[:, b * r + k].astype(np.int64) << k
        for code in np.unique(codes):
            if (b * 1_000_003 + int(code)) % mod != 0:
                continue
            if cap is not None and int((codes == code).sum()) > cap:
                # the engine drops over-cap buckets from candidate
                # generation — skip them here too (counted for honesty)
                over_cap += 1
                continue
            idx = np.where((codes == code) & ~ambiguous)[0]
            if len(idx) < 2:
                continue
            blocks_sampled += 1
            members += len(idx)
            sub = V[idx]
            nrm = norms[idx]
            cos = (sub @ sub.T) / np.outer(nrm, nrm)
            ii, jj = np.triu_indices(len(idx), k=1)
            above = cos[ii, jj] >= THRESHOLD + EPS
            pairs_above += int(above.sum())
            for a_i, b_i in zip(ii[above], jj[above]):
                va, vb = int(ids[idx[a_i]]), int(ids[idx[b_i]])
                if canon[va] != canon[vb]:
                    violations += 1
                    if violations <= 5:
                        problems.append(
                            f"pair ({va},{vb}) cos>{THRESHOLD} but "
                            f"canon {canon[va]} != {canon[vb]} "
                            f"(band {b} code {int(code)})"
                        )

    status = "FAIL" if problems or violations else "OK"
    cap_note = f", cap={cap} ({over_cap} over-cap blocks skipped)" if cap else ""
    print(
        f"{status}  dedup_semantic sampled check @ {sf_dir}: "
        f"{n_corpus} rows, {blocks_sampled} blocks sampled (mod {mod}"
        f"{cap_note}), "
        f"{members} members, {pairs_above} above-threshold pairs asserted, "
        f"{violations} violations, {int(ambiguous.sum())} sign-ambiguous "
        f"rows excluded [engine {engine_sec:.1f}s, total "
        f"{time.time() - t0:.1f}s]"
    )
    for p in problems:
        print(f"  - {p}")
    spark.stop()
    return 1 if (problems or violations) else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced through the `noop` sink — full plan execution
(scan, shuffle, window, UDF) with zero serialization back to Python, so
the timing measures the engine, not the driver round-trip.

Each query runs WARMUP (1) untimed iteration, then REPEATS (5, r9 — was
3) timed ones, reporting the per-query MINIMUM (headline "value" total,
the round-over-round series) plus the per-query MEDIAN. The untimed
warm-up (r7, after the round-6 pipeline_mart variance audit) exists
because repeat-0 of every query pays one-time JVM costs — whole-stage-
codegen class compilation + C2 JIT of the generated code — measured at
2-3x the steady-state time and MONOTONICALLY decreasing (4.4s -> 1.3s
over 8 repeats for pipeline_mart), i.e. warm-up asymmetry, not
run-to-run noise. With repeat-0 excluded, min and median both estimate
the steady state of a long-lived session (the serving/cluster context)
and the "variance" field (max/min per query) measures actual noise
instead of JIT slope.

r9 (VERDICT r8 #5): repeats were raised 3 -> 5 because the r8
cross-RUN band on per-query numbers was +-30% whole-process (GC, page
cache), wide enough to hide real regressions. median-of-5 is the
cross-run comparison metric: PERF.md r9 re-measures the band on two
same-HEAD runs at <=+-10% for the headline total. min-of-N stays the
headline "value" so the series remains comparable to r1-r8.

r12 (VERDICT r11 #6) — interleaved A/B drift probe: twice in three
rounds the headline series moved by a uniform ~1.16x on byte-untouched
code, attributed post-hoc to host co-tenancy. Now the claim is
MEASURED in-band: after the full pass-A sweep (the unchanged r1-r11
protocol — every reported headline stat still comes from pass A
alone), a pass B re-samples every headline query minutes later in the
SAME session and the JSON carries per-query min(B)/min(A) ratios plus
their median/max ("interleaved"). Identical code on a quiet host
shows ratio_median ~1.0; a co-tenancy window shows the same uniform
inflation WITHIN one run that the cross-round series shows between
runs — so a cross-round mover can be read against the run's own
measured drift band instead of a hand-wave. SPARK_GRAFT_BENCH_AB=0
disables pass B.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: The headline set: one per workload family (full medallion pipeline,
#: scan+agg, broadcast join, window, exact dedup, LSH near-dup, ANN,
#: text quality, streaming ingest). Names are q_* function names in
#: contract.py (NOT registry keys): several are timed individually here
#: but registered inside consolidated suite queries, and benching the
#: function keeps the series comparable across rounds.
HEADLINE = [
    "pipeline_mart",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "j1_broadcast_join",
    "j6_asof_join",
    "w2_days_since_last",
    "w7_sessionize",
    "a8_rollup",
    "dedup_exact",
    # SEAM at r14 (VERDICT r13 #6): the single "dedup_paragraph" entry
    # timed BOTH surfaces from r13 on (para + spans), which made the
    # r13 surface addition read as a 3.2x mover. The halves are now
    # timed separately: dedup_para continues the r6-r13 series' para
    # half; dedup_spans starts its own series. The REGISTRY query (and
    # its oracle) stays the combined q_dedup_paragraph.
    "dedup_para",
    "dedup_spans",
    "dedup_minhash_lsh",
    "sim_cosine_scores",
    "text_quality",
    "tpch_scalar_suite",
    "stream_hourly_counts",
    # r8 additions (VERDICT r7 #7): the r7 heavyweight suites join the
    # headline so regressions in them move the tracked number. SEAM:
    # the headline total is NOT comparable to r7's 15-query total —
    # compare the common-15 subset round-over-round (PERF.md r8).
    # tpch_subquery_suite includes the q21/q20 bucketed-layout variants
    # (their one-time bucketing cost is staged before the loop and
    # reported as the bucketed_fact_stage secondary).
    "tpch_join_suite",
    "tpch_subquery_suite",
]

#: Timed and reported, but NOT part of the headline total: alternative
#: code paths and new compositions whose cost should stay visible
#: without double-counting an operator in the sum or breaking the
#: headline series' round-over-round comparability.
#: - dedup_minhash_oneshot: in-query-shingling variant of the (now
#:   materialized-path) dedup_minhash_lsh headline entry.
#: - corpus_curation_pipeline: the composed quality→dedup→near-dup→
#:   split/mixture run (near-dup stage reuses the staged shingle
#:   parquet; the pair join is the oracle-exact uncapped configuration —
#:   production caps postings).
#: - minhash_shingle_stage (reported separately below): the ONE-TIME
#:   shingle-parquet materialization that dedup_minhash_lsh and
#:   corpus_curation_pipeline share. It is staged explicitly before the
#:   headline loop and timed as its own secondary, so the headline
#:   min-of-repeats numbers are explicit about excluding it. NOTE: the
#:   dedup_minhash_lsh headline series has a SEAM at round 6 (one-shot
#:   implementation before, staged-shingle after — PERF.md round 6/7).
#: - stream_suite: the stateful streaming suite (foreachBatch mart
#:   upsert + inner/left-outer stream-stream interval joins + session
#:   windows — r7, extended r8).
#: - dedup_ngram_jaccard: the four-surface set-similarity suite
#:   (exact/cap1000/fuzzy/setcos) over the staged shingle artifact
#:   (r8 — 7.44s in-query → 3.01s staged at sf0.1); tracked so the
#:   staged-path speedup stays visible round-over-round.
#: - r11 additions: sim_pq_topk (PQ ADC scan + exact rerank — the
#:   memory-bounded ANN path), dedup_semantic (embedding near-dup keep
#:   decisions: LSH pairs -> components -> corpus left join), and
#:   text_lm_scores (unigram-LM perplexity scoring). Secondary, not
#:   headline, to keep the 17-query headline series comparable. In the
#:   REGISTRY these ride sim_ann_suite ('pq' surface) / text_features
#:   (lm_* columns) so the registry holds at the driver's 50-entry
#:   correctness window; here they are timed as their standalone q_*
#:   bodies so each series isolates one operator. SEAM r11: the
#:   registry consolidation also folded stream_hourly_counts into
#:   stream_suite, so the stream_suite secondary series gains the
#:   hourly micro-batch run (~+5s) from r11 on; the headline
#:   stream_hourly_counts series itself is unchanged (still timed
#:   standalone).
SECONDARY = [
    "dedup_minhash_oneshot",
    "corpus_curation_pipeline",
    "stream_suite",
    "dedup_ngram_jaccard",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "dedup_semantic",
    "text_lm_scores",
    # r14: cross-document sequence packing at production shape
    # (seq_len=2048, shards=32); the registry rides text_chunks'
    # 'pack' surface at oracle-friendly parameters.
    "text_pack",
]


def main() -> None:
    from datawarehouse_group10_spark import contract
    from datawarehouse_group10_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not first-touch costs.
    contract.q_a5_minmax_scalars(spark, SF_DIR).collect()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    times: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    secondary: dict[str, float] = {}

    # One-time shared shingle staging, timed as its own secondary (the
    # honest accounting for what the minhash/curation repeats exclude).
    # Since r8 the cold build is INCREMENTAL (bulk ~90% of the corpus,
    # then the full corpus presented so only the ~10% delta stages);
    # the phase split shows delta cost ~ delta size, not corpus size.
    t0 = time.time()
    contract.staged_shingles(spark, SF_DIR)
    secondary["minhash_shingle_stage"] = round(time.time() - t0, 3)
    secondary["minhash_shingle_stage_bulk"] = contract.SHINGLE_STAGE_TIMINGS.get(
        "bulk", 0.0
    )
    secondary["minhash_shingle_stage_delta"] = contract.SHINGLE_STAGE_TIMINGS.get(
        "delta", 0.0
    )

    # One-time bucketed fact-table layouts (q21/q20 bucketed variants) —
    # the amortized write the zero-Exchange reads pay for, priced
    # explicitly like the shingle staging. Since r9 the layouts persist
    # in GRAFT_WAREHOUSE: a warm directory re-attaches to the catalog
    # (~0 stage cost) instead of restaging — the split shows which path
    # this run took.
    t0 = time.time()
    contract.bucketed_facts(spark, SF_DIR)
    secondary["bucketed_fact_stage"] = round(time.time() - t0, 3)
    secondary["bucketed_fact_stage_cold"] = contract.BUCKETED_STAGE_TIMINGS.get(
        "stage", 0.0
    )
    secondary["bucketed_fact_stage_attach"] = contract.BUCKETED_STAGE_TIMINGS.get(
        "attach", 0.0
    )

    # Partitioned layout staging (r9): priced the same way; ~0 warm.
    t0 = time.time()
    contract.partitioned_orders(spark, SF_DIR)
    secondary["partitioned_fact_stage"] = round(time.time() - t0, 3)

    # Row-level MERGE through the snapshot layout (r11): the one-time
    # snapshot_merge cost (update/delete/insert/move batch) — ~0 warm.
    t0 = time.time()
    contract.merged_snapshot_orders(spark, SF_DIR)
    secondary["snapshot_merge_stage"] = round(time.time() - t0, 3)
    secondary["snapshot_merge_apply"] = contract.MERGE_STATS.get("seconds", 0.0)
    # r13 merge variants: composite-partition and partial-row (one-time
    # staging costs; the apply entries are the snapshot_merge call alone)
    t0 = time.time()
    contract.merged_snapshot_orders_mc(spark, SF_DIR)
    secondary["snapshot_merge_mc_stage"] = round(time.time() - t0, 3)
    secondary["snapshot_merge_mc_apply"] = contract.MERGE_MC_STATS.get(
        "seconds", 0.0
    )
    t0 = time.time()
    contract.merged_snapshot_orders_pc(spark, SF_DIR)
    secondary["snapshot_merge_pc_stage"] = round(time.time() - t0, 3)
    secondary["snapshot_merge_pc_apply"] = contract.MERGE_PC_STATS.get(
        "seconds", 0.0
    )
    # r14: hidden-transform (months x bucket) partition merge
    t0 = time.time()
    contract.merged_snapshot_orders_tf(spark, SF_DIR)
    secondary["snapshot_merge_tf_stage"] = round(time.time() - t0, 3)
    secondary["snapshot_merge_tf_apply"] = contract.MERGE_TF_STATS.get(
        "seconds", 0.0
    )
    # r14: merge-on-read delete lifecycle (two equality-delete commits
    # + a COW re-insert of a deleted-key subset); the apply entry is
    # the deletes+merge alone, the stage entry includes the base load
    t0 = time.time()
    contract.mor_snapshot_orders(spark, SF_DIR)
    secondary["snapshot_mor_stage"] = round(time.time() - t0, 3)
    secondary["snapshot_mor_apply"] = contract.MOR_STATS.get("seconds", 0.0)
    # r14: partition-spec evolution (metadata-only re-spec + the lazy-
    # migration merge); the apply entry is evolve+merge alone
    t0 = time.time()
    contract.respec_snapshot_orders(spark, SF_DIR)
    secondary["snapshot_respec_stage"] = round(time.time() - t0, 3)
    secondary["snapshot_respec_apply"] = contract.RESPEC_STATS.get(
        "seconds", 0.0
    )
    # r15: schema evolution (field-id add/rename/widen/drop + merges);
    # the apply entry is the evolve+merge chain alone
    t0 = time.time()
    contract.evolve_snapshot_orders(spark, SF_DIR)
    secondary["snapshot_evolve_stage"] = round(time.time() - t0, 3)
    secondary["snapshot_evolve_apply"] = contract.EVOLVE_STATS.get(
        "seconds", 0.0
    )
    # r15: exactly-once CDF chain (src commits -> per-window merges
    # into dst); the apply entry is the two applier passes alone
    t0 = time.time()
    contract.cdf_snapshot_orders(spark, SF_DIR)
    secondary["snapshot_cdf_stage"] = round(time.time() - t0, 3)
    secondary["snapshot_cdf_apply"] = contract.CDF_STATS.get(
        "seconds", 0.0
    )

    warmup = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))

    # Sub-second queries are dominated by fixed job-scheduling jitter
    # (~100 ms floor), so their median-of-5 still banded +-25-50%
    # across runs (PERF.md r9); extending them to 15 samples costs
    # ~1 min total and brings the per-query median band in line with
    # the heavier queries'.
    short_extra = int(os.environ.get("SPARK_GRAFT_BENCH_SHORT_SAMPLES", "15"))

    def run(name: str, n: int | None = None, warm: int | None = None) -> list[float]:
        fn = getattr(contract, f"q_{name}")
        for _ in range(warmup if warm is None else warm):
            # untimed: codegen compile + C2 JIT
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples = []
        target = repeats if n is None else n
        while len(samples) < target or (
            n is None
            and statistics.median(samples) < 1.0
            and len(samples) < short_extra
        ):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return samples

    for name in HEADLINE:
        samples = run(name)
        times[name] = round(min(samples), 3)
        medians[name] = round(statistics.median(samples), 3)
        spreads[name] = round(max(samples) / max(min(samples), 1e-9), 2)
    for name in SECONDARY:
        secondary[name] = round(min(run(name)), 3)
        if name == "stream_suite":
            # r18 (VERDICT r17 #4): per-pipeline wall seconds of the
            # suite's LAST run — which pipeline is the floor, visible
            # round-over-round. Additions-only; no timed region
            # changed.
            for pipe, sec in sorted(
                contract.STREAM_SUITE_TIMINGS.items()
            ):
                secondary[f"stream_pipe_{pipe}"] = sec
    # One-time PQ codebook training (r12): q_sim_pq_topk's warm-up call
    # trained + cached the books, so the timed repeats price the ADC
    # scan; the index-build cost is surfaced here like the other stages.
    secondary["pq_train_stage"] = contract.PQ_TRAIN_STATS.get("seconds", 0.0)
    secondary["pq_train_res_stage"] = contract.PQ_TRAIN_STATS.get(
        "res_seconds", 0.0
    )
    # One-time ANN index staging (r17): cell assignment + PQ/residual/
    # band codes persisted per corpus; query-time probes read codes
    # (training is priced by the two entries above, not here).
    secondary["ann_index_stage"] = contract.ANN_STAGE_TIMINGS.get(
        "stage", 0.0
    )

    # Interleaved A/B drift probe (r12): re-sample every headline query
    # minutes after its pass-A measurement, same session, same code.
    # Per-query min(B)/min(A) measures machine drift in-band; every
    # reported headline stat above still comes from pass A alone, so the
    # r1-r11 series stays comparable.
    ab_samples = int(os.environ.get("SPARK_GRAFT_BENCH_AB", "2"))
    interleaved = None
    if ab_samples > 0:
        b_min: dict[str, float] = {}
        ratio: dict[str, float] = {}
        for name in HEADLINE:
            b = min(run(name, n=ab_samples, warm=0))
            b_min[name] = round(b, 3)
            ratio[name] = round(b / max(times[name], 1e-9), 3)
        interleaved = {
            "b_min": b_min,
            "ratio": ratio,
            "ratio_median": round(statistics.median(ratio.values()), 3),
            "ratio_max": round(max(ratio.values()), 3),
            "b_samples": ab_samples,
        }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_queries_total_wall_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        # Explicit alias of "queries" (r11, VERDICT r10 #8): the
        # headline per-query stat IS the min-of-repeats — min was
        # measured (PERF.md r9/r10) to be the stable statistic,
        # while medians swing in a ~±20% per-query tail band on
        # identical code. Movers should be judged on "min";
        # "median" is the cross-run comparison series.
        "min": times,
        "median": medians,
        "median_total": round(sum(medians.values()), 3),
        "repeats": repeats,
        "warmup": warmup,
        "variance": spreads,
        "interleaved": interleaved,
        "secondary": secondary,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(payload))
    # r16 (VERDICT r15 #8): the driver's BENCH_r*.json capture truncates
    # stdout, so the per-query numbers were only recoverable by grepping
    # a tail. Persist the FULL payload as a machine-readable artifact
    # next to bench.py so round-over-round comparisons read a file, not
    # a log. SPARK_GRAFT_BENCH_OUT overrides the path; write failures
    # never fail the bench run itself.
    # r18 (VERDICT r17 #2): the full payload line above kept growing
    # (35+ secondaries) and the driver's tail capture truncated it at
    # r16, breaking the round-over-round comparison. Emit a COMPACT
    # headline-only JSON as the FINAL stdout line — same "metric"/
    # "value"/"unit"/"queries"/"sf" contract, every headline entry
    # present, ~1.5 KB so a tail capture always holds it intact. The
    # full line above and bench_results.json are unchanged (additions
    # only; no timed region touched).
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": times,
        "min": times,
        "median": medians,
        "median_total": payload["median_total"],
        "repeats": repeats,
        "warmup": warmup,
        "sf": payload["sf"],
    }
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_results.json"),
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # bench numbers already printed; don't fail
        print(f"bench_results.json write failed: {exc}", file=sys.stderr)
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()

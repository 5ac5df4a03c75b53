"""Commit-time and commit-metadata-bytes vs partition count for the
manifest-list snapshot layout (r13, VERDICT r12 #1).

Stages snapshot tables of N partitions (2 rows each — the DATA cost is
deliberately trivial so the measurement isolates the METADATA plane),
then times a 1-partition snapshot_merge per table and reports:

- commit_meta_bytes: what the manifest-list commit actually wrote
  (one touched-entry segment + the version file);
- inline_equiv_bytes: what the r12 inline layout would have written
  (the full resolved partitions dict re-serialized);
- merge_secs: wall time of the whole merge (probe + rewrite + commit).

Usage: python scripts/meta_commit_curve.py [--shard S] [N ...]
(default shard 256, N = 100 400 1000). ``--shard 4096`` measures at
the PRODUCTION shard size (r15, VERDICT r14 #7) — pair it with
N >= 10000 so the shape is visible. Each point also carries a
MIXED-SPEC leg (r15, VERDICT r14 #1): the table's spec evolves to
bucket(16, k) and a mid-migration 1-key merge + scoped read are
measured — probe and plan-time metadata must stay O(batch) /
O(relevant) while pc_history is non-empty.
Prints one JSON line. Run it alone (bench co-tenancy protocol).
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


def main() -> None:
    args = sys.argv[1:]
    shard = 256
    if "--shard" in args:
        i = args.index("--shard")
        shard = int(args[i + 1])
        del args[i:i + 2]
    ns = [int(a) for a in args] or [100, 400, 1000]

    from datawarehouse_group10_spark.session import get_spark
    import datawarehouse_group10_spark.sources.layout as L
    from datawarehouse_group10_spark.sources.layout import (
        snapshot_backfill,
        snapshot_evolve_partitioning,
        snapshot_manifest,
        snapshot_merge,
        snapshot_scan_groups,
        snapshot_write,
    )

    # Default 256-entry shards make the READ-side curve (r14, VERDICT
    # r13 #1) visible at small N; --shard 4096 (r15, VERDICT r14 #7)
    # measures the production constant with N >= 10000.
    L.SEGMENT_SHARD_ENTRIES = shard

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    out = []
    root = tempfile.mkdtemp(prefix="meta_curve_")
    try:
        for n in ns:
            path = os.path.join(root, f"t{n}")
            df = spark.createDataFrame(
                [
                    (f"p{i:05d}", i * 10 + j, float(i))
                    for i in range(n)
                    for j in range(2)
                ],
                "p string, k int, v double",
            )
            snapshot_write(df, path, "p")
            inline = len(
                json.dumps(
                    snapshot_manifest(path)["partitions"],
                    separators=(",", ":"),
                )
            )
            batch = spark.createDataFrame(
                [(f"p{n // 2:05d}", (n // 2) * 10, 999.0)],
                "p string, k int, v double",
            )
            t0 = time.time()
            st = snapshot_merge(spark, batch, path, "p", ["k"])
            secs = time.time() - t0
            # read-side curve (r14): metadata bytes a 1-partition
            # scoped plan parses vs the full manifest resolve
            snapshot_manifest(path)
            full_read = L.LAST_RESOLVE_META_BYTES
            t0 = time.time()
            snapshot_scan_groups(path, partitions={f"p{n // 2:05d}"})
            pruned_plan_secs = time.time() - t0
            point = {
                "partitions": n,
                "shard": shard,
                "commit_meta_bytes": L.LAST_COMMIT_META_BYTES,
                "inline_equiv_bytes": inline,
                "merge_secs": round(secs, 3),
                "probe_partitions": st["probe_partitions"],
                "read_meta_bytes_full": full_read,
                "read_meta_bytes_pruned": L.LAST_RESOLVE_META_BYTES,
                "read_segments_pruned": L.LAST_RESOLVE_SEGMENTS_READ,
                "pruned_plan_secs": round(pruned_plan_secs, 4),
            }
            # commit-side WIDE-backfill leg (r16, VERDICT r15 #1): one
            # commit touching many partitions — footer stats for every
            # freshly-written file must collect in O(1) executor jobs,
            # ZERO serial driver footer reads (the old shape issued one
            # driver GET per file inside the commit path).
            wide_n = min(n, 512)
            wide = spark.createDataFrame(
                [(f"p{i:05d}", i * 10, 555.0) for i in range(wide_n)],
                "p string, k int, v double",
            )
            fs0 = dict(L.FOOTER_STAT_COUNTS)
            t0 = time.time()
            snapshot_backfill(wide, path, "p")
            point["backfill_secs_wide"] = round(time.time() - t0, 3)
            point["backfill_partitions_wide"] = wide_n
            point["footer_driver_files_wide"] = (
                L.FOOTER_STAT_COUNTS["driver_files"]
                - fs0["driver_files"]
            )
            point["footer_stat_jobs_wide"] = (
                L.FOOTER_STAT_COUNTS["jobs"] - fs0["jobs"]
            )
            # MIXED-SPEC leg (r15): evolve to bucket(16, k) and issue
            # a 1-key merge MID-migration (composite key so BOTH
            # specs scope exactly); then a scoped literal-key read.
            snapshot_evolve_partitioning(
                path, {"kb16": ("bucket", 16, "k")}
            )
            batch2 = spark.createDataFrame(
                [(f"p{n // 4:05d}", (n // 4) * 10, 777.0)],
                "p string, k int, v double",
            )
            t0 = time.time()
            st2 = snapshot_merge(
                spark, batch2, path,
                {"kb16": ("bucket", 16, "k")}, ["p", "k"],
            )
            point["merge_secs_mixed"] = round(time.time() - t0, 3)
            point["probe_partitions_mixed"] = st2["probe_partitions"]
            snapshot_scan_groups(
                path, partitions={f"p{(3 * n) // 4:05d}"}
            )
            point["read_meta_bytes_pruned_mixed"] = (
                L.LAST_RESOLVE_META_BYTES
            )
            point["read_segments_pruned_mixed"] = (
                L.LAST_RESOLVE_SEGMENTS_READ
            )
            out.append(point)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps({"metric": "meta_commit_curve", "points": out}))


if __name__ == "__main__":
    main()

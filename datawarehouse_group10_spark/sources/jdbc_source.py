"""JDBC source / sink wrappers (operators S4/S5).

The reference is JDBC end-to-end: CsvLoader batch-inserts into MySQL
staging (StagingDW/src/main/java/vn/edu/hcmuaf/fit/CsvLoader.java:28-47)
and ETLMain full-table-scans staging/dims/fact back out
(load_warehouse/src/main/java/ETLMain.java:195-220,237-241,293-297).

Spark's JDBC data source replaces both hand-rolled loops:

- reads become *partitioned parallel scans* — ``partition_column`` +
  bounds splits the table into ``num_partitions`` range predicates, one
  task each, instead of one single-threaded ResultSet;
- writes become batched prepared-statement inserts per partition
  (``batchsize`` maps to the reference's ``executeBatch`` cadence).

Tested END-TO-END against the embedded Apache Derby database whose driver
ships on Spark's own classpath (tests/test_pipeline_infra.py::
test_jdbc_roundtrip_embedded_derby): real batched inserts, real bounded
range scans. For the reference's MySQL, the identical calls apply with
``spark-submit --jars mysql-connector-j.jar`` and a ``jdbc:mysql://`` url
(recipe in DEPLOY.md §JDBC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_read_options(
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Options for a partitioned JDBC scan. Without a partition column the
    scan is a single task (the reference's behavior); with one, Spark
    issues ``num_partitions`` bounded range queries in parallel."""
    opts: dict[str, str] = {"dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    **partition_opts,
) -> DataFrame:
    """S5: JDBC table scan (ETLMain.java:195-220) as a (parallel) Spark
    read. ``partition_opts`` are forwarded to :func:`jdbc_read_options`."""
    reader: DataFrameReader = spark.read.format("jdbc").option("url", url)
    for k, v in jdbc_read_options(table, **partition_opts).items():
        reader = reader.option(k, v)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 1_000,
    isolation_level: str = "READ_COMMITTED",
    properties: dict[str, str] | None = None,
) -> None:
    """S4: batched JDBC insert (CsvLoader.java:28-47's
    addBatch/executeBatch, batch size 1000 implicit in the loop) — each
    Spark partition opens one connection and writes in ``batchsize``
    chunks. ``mode='append'`` matches INSERT; 'overwrite' truncates first.
    """
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
        .options(**(properties or {}))
        .mode(mode)
        .save()
    )

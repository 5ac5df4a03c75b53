"""Control-database config tables (SURVEY.md §1.1 control.* rows).

The reference drives every stage from two small MySQL control tables:
``config_source`` (source_id -> urls/paths, read at
crawl_data/.../LotteryCrawler.java:116-117 and
transform_staging/.../LotteryTransform.java:43-44) and ``config_database``
(key/value connection + schema names, load_warehouse/src/main/java/Util.java:10-21).

Here they are parquet (or any Spark-readable) tables with the same
columns; the orchestrator consumes them instead of hardcoded kwargs, so a
deployment keeps the reference's control contract: change the control
table, not the code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CONFIG_DATABASE, CONFIG_SOURCE


def read_config_source(spark: SparkSession, path: str) -> DataFrame:
    """config_source table: one row per source (Util.java / LotteryCrawler
    contract)."""
    return spark.read.schema(CONFIG_SOURCE).parquet(path)


def source_config(spark: SparkSession, path: str, source_id: int) -> dict:
    """The reference's per-source lookup (`WHERE source_id = ?`) as a dict:
    {source_name, source_url, file_location, destination_staging}."""
    rows = read_config_source(spark, path).filter(f"source_id = {int(source_id)}").collect()
    if not rows:
        raise KeyError(f"source_id {source_id} not in config_source at {path}")
    return rows[0].asDict()


def read_config_database(spark: SparkSession, path: str) -> DataFrame:
    """config_database key/value table (Util.java:10-21)."""
    return spark.read.schema(CONFIG_DATABASE).parquet(path)


def database_config(spark: SparkSession, path: str) -> dict[str, str]:
    """The key/value map the reference builds in Util.readDatabaseConfig —
    db_host, db_port, db_username, db_password, staging_schema,
    staging_table, warehouse_schema, transform_table (ETLMain.java:58-59,
    132,141). A one-collect driver read of a tiny table."""
    return {
        r["config_key"]: r["config_value"]
        for r in read_config_database(spark, path).collect()
    }


def write_config_tables(
    spark: SparkSession,
    config_source_rows: list[dict],
    config_database_map: dict[str, str],
    source_path: str,
    database_path: str,
) -> None:
    """Bootstrap helper: materialize both control tables from plain Python
    values (the reference seeds them by hand in MySQL)."""
    src = spark.createDataFrame(
        [
            (
                int(r["source_id"]),
                r.get("source_name"),
                r.get("source_url"),
                r.get("file_location"),
                r.get("destination_staging"),
            )
            for r in config_source_rows
        ],
        CONFIG_SOURCE,
    )
    src.write.mode("overwrite").parquet(source_path)
    db = spark.createDataFrame(list(config_database_map.items()), CONFIG_DATABASE)
    db.write.mode("overwrite").parquet(database_path)

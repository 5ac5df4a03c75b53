"""The reference's orchestrated end-to-end run (ETLMain.java:23-79 +
StagingController.java:171-180) as one config-driven Spark job.

Stage map (SURVEY §3.4): P1 = crawl output lands as CSV files (out of
engine scope — the gate just checks the directory), P2 = CSV -> bronze,
P3 = bronze -> silver, P4 = silver -> star schema + mart. Every stage is
gated through the process_log ledger (predecessor-SUCCESS,
self-not-RUNNING) and written as a parquet layer, so a re-run is
idempotent layer-by-layer and any stage failure leaves a FAILED row with
the error message — the reference's control contract, minus the MySQL.

Config comes from the control tables (sources.config_tables) exactly like
the reference reads config_source/config_database (Util.java:10-21), so a
deployment repoints the job by editing the control table, not the code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..sources.config_tables import source_config
from ..sources.csv_source import read_crawl_csv_dir
from ..sources.parquet_source import write_layer
from .medallion import run_full_pipeline
from .orchestrator import ProcessLog


def run_warehouse_job(
    spark: SparkSession,
    csv_dir: str | None = None,
    output_dir: str = "/tmp/dwh",
    ledger_path: str | None = None,
    config_source_path: str | None = None,
    source_id: int = 1,
    as_of: str | None = None,
) -> dict[str, DataFrame]:
    """Run P1-gate..P4 with ledger gating; returns the materialized layers.

    ``csv_dir`` may come from the config_source control table
    (file_location column) instead of an argument — pass
    ``config_source_path`` + ``source_id`` for the reference's lookup
    (LotteryTransform.java:43-56).
    """
    if csv_dir is None:
        if config_source_path is None:
            raise ValueError("need csv_dir or config_source_path")
        csv_dir = source_config(spark, config_source_path, source_id)["file_location"]

    log = ProcessLog(spark, ledger_path or os.path.join(output_dir, "process_log"))

    # P1: the crawler ran out-of-band; its observable contract is "CSV
    # files exist in the directory" (CsvLoader.java:8-24).
    def _p1() -> int:
        names = [n for n in os.listdir(csv_dir) if n.lower().endswith(".csv")]
        if not names:
            raise FileNotFoundError(f"no *.csv in {csv_dir}")
        return len(names)

    log.run_stage("P1", _p1)

    # P2: CSV directory -> bronze layer.
    def _p2() -> int:
        bronze = read_crawl_csv_dir(spark, csv_dir)
        write_layer(bronze, os.path.join(output_dir, "bronze"))
        return spark.read.parquet(os.path.join(output_dir, "bronze")).count()

    log.run_stage("P2", _p2)

    bronze = spark.read.parquet(os.path.join(output_dir, "bronze"))
    layers = run_full_pipeline(bronze, as_of=as_of)

    # P3: silver layer.
    log.run_stage(
        "P3",
        lambda: (
            write_layer(layers["silver"], os.path.join(output_dir, "silver")),
            layers["silver"].count(),
        )[1],
    )

    # P4: star schema + mart (the reference's loadDimDate/loadDimNumber/
    # loadFactPrize + mart build, ETLMain.java:233-430).
    def _p4() -> int:
        write_layer(layers["dim_date"], os.path.join(output_dir, "dim_date"))
        write_layer(layers["dim_number"], os.path.join(output_dir, "dim_number"))
        write_layer(
            layers["fact_prize"],
            os.path.join(output_dir, "fact_prize"),
            partition_by=["date_key"],
        )
        write_layer(layers["mart"], os.path.join(output_dir, "mart"))
        return layers["fact_prize"].count()

    log.run_stage("P4", _p4)
    return layers


def register_views(spark: SparkSession, layers: dict[str, DataFrame]) -> None:
    """Thin SQL layer (SURVEY §7): every medallion layer as a temp view so
    the serving queries run as plain spark.sql — the Q1/Q2 REST endpoints'
    query text maps 1:1."""
    for name, df in layers.items():
        df.createOrReplaceTempView(name)


#: Q2 /mart/statistic as SQL over the registered views — the JPQL from
#: MartRepository.java:14-33 collapsed into one ANSI aggregate.
SQL_MART_STATISTIC = """
SELECT
  CAST(MAX(total_draws) AS INT)                         AS total_occurrences,
  CAST(max_by(number_value, named_struct(
       'occ', total_occurrences,
       'neg', -CAST(number_value AS INT))) AS INT)      AS most_number,
  CAST(min_by(number_value, named_struct(
       'occ', total_occurrences,
       'num', CAST(number_value AS INT))) AS INT)       AS least_number,
  MAX(last_appeared_date)                               AS last_update
FROM mart
"""

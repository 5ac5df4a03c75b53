"""Sources, orchestration ledger, streaming, and the driver contract's
internal consistency."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datawarehouse_group10_spark.plans.medallion import bronze_to_silver
from datawarehouse_group10_spark.plans.orchestrator import ProcessLog
from datawarehouse_group10_spark.sources import (
    database_config,
    jdbc_read_options,
    read_crawl_csv_dir,
    source_config,
    write_config_tables,
    write_crawl_csv,
)
from datawarehouse_group10_spark.streaming import (
    read_crawl_csv_stream,
    run_stream_to_table,
    stream_bronze_to_silver,
)


@pytest.fixture()
def csv_dir(tmp_path):
    (tmp_path / "data_01012024.csv").write_text(
        "prize,number_value,full_date,created_at\n"
        "Giải Bảy,07,01-01-2024,2024-01-01T19:05:00.000Z\n"
        "Giải Bảy,23,01-01-2024,2024-01-01T19:05:00.000Z\n",
        encoding="utf-8",
    )
    # BOM variant + malformed row (both must be tolerated)
    (tmp_path / "data_02012024.csv").write_text(
        "prize,number_value,full_date,created_at\n"
        "Giải Bảy,41,02-01-2024,2024-01-02T19:05:00.000Z\n"
        "short-row\n",
        encoding="utf-8-sig",
    )
    (tmp_path / "ignore.txt").write_text("not a csv")
    return str(tmp_path)


def test_s3_csv_dir_scan(spark, csv_dir):
    df = read_crawl_csv_dir(spark, csv_dir)
    rows = df.collect()
    assert len(rows) == 3                      # malformed + txt skipped
    assert {r["number_value"] for r in rows} == {"07", "23", "41"}
    assert all(r["load_timestamp"] is not None for r in rows)  # S6 audit col


def test_s2_csv_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a", "1")], "x string, y string")
    out = str(tmp_path / "out")
    write_crawl_csv(df, out)
    back = spark.read.option("header", "true").csv(out)
    assert back.collect()[0]["x"] == "a"


def test_jdbc_options():
    opts = jdbc_read_options("t", partition_column="id", lower_bound=0,
                             upper_bound=1000, num_partitions=16)
    assert opts["numPartitions"] == "16" and opts["partitionColumn"] == "id"
    with pytest.raises(ValueError):
        jdbc_read_options("t", partition_column="id")


def test_config_tables_roundtrip(spark, tmp_path):
    sp, dp = str(tmp_path / "cs"), str(tmp_path / "cd")
    write_config_tables(
        spark,
        [{"source_id": 2, "source_name": "xsmb", "source_url": "http://localhost",
          "file_location": "/data", "destination_staging": "stg"}],
        {"staging_schema": "staging", "staging_table": "stg_lottery_data"},
        sp, dp,
    )
    cfg = source_config(spark, sp, 2)
    assert cfg["destination_staging"] == "stg"
    db = database_config(spark, dp)
    assert db["staging_table"] == "stg_lottery_data"
    with pytest.raises(KeyError):
        source_config(spark, sp, 99)


def test_process_log_gating(spark, tmp_path):
    log = ProcessLog(spark, str(tmp_path / "ledger"))
    assert log.can_start("P1")                 # first stage always startable
    assert not log.can_start("P2")             # P1 never succeeded
    log.run_stage("P1", lambda: 42)
    assert log.latest_status("P1") == "SUCCESS"
    assert log.can_start("P2")
    # failure is recorded and re-raised
    with pytest.raises(RuntimeError, match="boom"):
        log.run_stage("P2", lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    assert log.latest_status("P2") == "FAILED"
    # a gated-out attempt writes GATED, not FAILED, and doesn't poison state
    log.log("P3", "RUNNING")
    with pytest.raises(RuntimeError, match="gated"):
        log.run_stage("P3", lambda: 1)
    assert log.latest_status("P3") == "GATED"
    assert not log.can_start("P3")             # still RUNNING underneath


def test_streaming_silver_matches_batch(spark, csv_dir):
    stream = stream_bronze_to_silver(read_crawl_csv_stream(spark, csv_dir))
    got = run_stream_to_table(stream, "silver_stream_test", output_mode="append")
    batch = bronze_to_silver(read_crawl_csv_dir(spark, csv_dir))
    a = {tuple(r) for r in got.drop("load_timestamp").collect()}
    b = {tuple(r) for r in batch.drop("load_timestamp").collect()}
    assert a == b and len(a) == 3


def test_contract_registry_consistent():
    from datawarehouse_group10_spark.contract import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    documented_rows_only = {
        "dedup_minhash_lsh", "dedup_simhash", "sim_brute_topk", "sim_lsh_topk",
    }
    assert set(QUERIES) - set(ORACLES) == documented_rows_only

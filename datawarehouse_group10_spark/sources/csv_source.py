"""CSV directory source / sink for the crawl layer.

Replaces the reference's hand-rolled directory scan + line splitter
(StagingDW/src/main/java/vn/edu/hcmuaf/fit/CsvLoader.java:8-50, operator S3)
and CSV writer with BOM (crawl_data/.../LotteryCrawler.java:298-308, S2).

Spark reads the whole directory natively — one job, splittable across
executors — so the per-file Java loop disappears. Short rows (<4 fields,
CsvLoader.java:39): Spark null-pads missing TRAILING fields rather than
flagging them malformed, so a 2-field row reaches bronze with NULL date
and is dropped by the silver transform's null filter — the same
skip-and-continue tolerance (T6) as the reference, applied one layer
later; rows that are structurally unparseable are dropped at read by
DROPMALFORMED. UTF-8 BOM files parse because Spark's univocity parser
strips the BOM from the first header cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import RAW_CRAWL, RAW_CRAWL_ALT


def read_crawl_csv_dir(spark: SparkSession, path: str) -> DataFrame:
    """Bronze ingest: every ``*.csv`` under ``path`` -> typed staging rows.

    Output columns follow the staging DDL (prize, number_value, full_date as
    raw strings) plus the ``load_timestamp`` audit column the reference stamps
    per row (CsvLoader.java:43, operator S6).

    At scale: the directory listing is distributed, each file splits on block
    boundaries, and the explicit schema avoids an inference pass over 100 TB.
    """
    schema = "prize STRING, number_value STRING, full_date STRING, created_at STRING"
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .option("pathGlobFilter", "*.csv")
        .option("encoding", "UTF-8")
        .csv(path)
    )
    # The reference drops rows with fewer than 4 fields (CsvLoader.java:39):
    # with DROPMALFORMED short rows already vanish, but rows where the prize
    # or number is empty would survive as NULLs — filter them the same way.
    return df.filter(
        F.col("prize").isNotNull() & F.col("number_value").isNotNull()
    ).withColumn("load_timestamp", F.current_timestamp())


def write_crawl_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (operator S2). BOM is not reproduced — Spark
    writes clean UTF-8; readers of both forms behave identically."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_alt_crawl_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution path: the reference's alternate crawl layout
    (crawl_data/xsmb_23102025_CRAWL_001.csv:1 — BOM-prefixed
    ``process_code,ngay_trung,thu,ten_giai,so_trung,range_group,
    is_weekend,is_even,crawl_time`` with yyyy-MM-dd dates and true/false
    booleans) mapped onto the canonical bronze columns so the same silver
    transform runs on either vintage of file."""
    df = (
        spark.read.schema(RAW_CRAWL_ALT)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .option("pathGlobFilter", "*.csv")
        .option("encoding", "UTF-8")
        .csv(path)
    )
    return df.filter(
        F.col("ten_giai").isNotNull() & F.col("so_trung").isNotNull()
    ).select(
        F.col("ten_giai").alias("prize"),
        F.col("so_trung").alias("number_value"),
        # canonical bronze carries dd-MM-yyyy (LotteryCrawler.java:24) —
        # re-render the alt layout's yyyy-MM-dd to it.
        F.date_format(F.to_date("ngay_trung", "yyyy-MM-dd"), "dd-MM-yyyy").alias(
            "full_date"
        ),
        F.col("crawl_time").alias("created_at"),
        F.current_timestamp().alias("load_timestamp"),
    )

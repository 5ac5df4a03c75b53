"""Operator-level checks for SURVEY §2.2 (T1-T12), pinning the §2.7
correctness traps at the smallest possible surface."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datawarehouse_group10_spark.operators.transforms import (
    decade_bucket,
    derive_flags,
    filter_prize,
    iso_z_timestamp,
    last_digit,
    last_k_digits,
    normalize_numeric_string,
    parse_draw_date,
    surrogate_date_key,
    vietnamese_day_name,
)


def _one(spark, expr, value, schema="v string"):
    return spark.createDataFrame([(value,)], schema).select(expr.alias("r")).first()["r"]


def test_t1_filter_utf8_literal(spark):
    df = spark.createDataFrame(
        [("Giải Bảy",), ("Giải Bay",), ("Giải Nhất",)], "prize string"
    )
    kept = filter_prize(df).collect()
    assert [r["prize"] for r in kept] == ["Giải Bảy"]


def test_t2_last_k_digits_guard_and_parse(spark):
    assert _one(spark, last_k_digits(F.col("v")), "12345") == 45
    assert _one(spark, last_k_digits(F.col("v")), "07") == 7
    assert _one(spark, last_k_digits(F.col("v")), "7") is None      # len<2 skip
    assert _one(spark, last_k_digits(F.col("v")), "ab") is None     # non-digit


def test_t3_date_parse_tolerant(spark):
    assert _one(spark, parse_draw_date(F.col("v")), "23-10-2025") == dt.date(2025, 10, 23)
    assert _one(spark, parse_draw_date(F.col("v")), "zz-10-2025") is None


def test_t4_decade_bucket_zero_pad(spark):
    assert _one(spark, decade_bucket(F.col("v").cast("int")), "7") == "00-09"
    assert _one(spark, decade_bucket(F.col("v").cast("int")), "73") == "70-79"


def test_t5_flags(spark):
    df = spark.createDataFrame(
        [(4, dt.date(2024, 1, 6)), (7, dt.date(2024, 1, 8))], "n int, d date"
    )
    flags = derive_flags("n", "d")
    out = df.select(flags["is_even"].alias("e"), flags["is_weekend"].alias("w")).collect()
    assert [(r["e"], r["w"]) for r in out] == [(1, 1), (0, 0)]  # Sat=weekend, Mon=not


def test_t7_normalize_strip_zeros_keep_text(spark):
    assert _one(spark, normalize_numeric_string(F.col("v")), "07") == "7"
    assert _one(spark, normalize_numeric_string(F.col("v")), "000") == "0"
    assert _one(spark, normalize_numeric_string(F.col("v")), " abc ") == "abc"
    assert _one(spark, normalize_numeric_string(F.col("v")), "12a") == "12a"


def test_t8_t9_t10_calendar(spark):
    df = spark.createDataFrame([(dt.date(2025, 10, 23),)], "d date")
    row = df.select(
        surrogate_date_key("d").alias("k"),
        vietnamese_day_name("d").alias("name"),
    ).first()
    assert row["k"] == 20251023
    assert row["name"] == "Thứ 5"  # 2025-10-23 is a Thursday
    sunday = spark.createDataFrame([(dt.date(2024, 1, 7),)], "d date")
    assert sunday.select(vietnamese_day_name("d").alias("n")).first()["n"] == "Chủ nhật"


def test_t11_last_digit_zero_default(spark):
    assert _one(spark, last_digit(F.col("v")), "47") == 7
    assert _one(spark, last_digit(F.col("v")), "abc") == 0   # the 0-default quirk
    assert _one(spark, last_digit(F.col("v")), "") == 0


def test_t12_iso_z_format(spark):
    df = spark.createDataFrame([(dt.datetime(2025, 10, 23, 19, 5, 0),)], "t timestamp")
    assert (
        df.select(iso_z_timestamp("t").alias("s")).first()["s"]
        == "2025-10-23T19:05:00.000Z"
    )

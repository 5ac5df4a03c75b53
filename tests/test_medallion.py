"""End-to-end medallion semantics on crafted rows — the SURVEY §2.7 trap
list as executable assertions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datawarehouse_group10_spark.operators.aggregates import mart_statistics
from datawarehouse_group10_spark.plans.medallion import (
    bronze_to_silver,
    build_dim_date,
    build_dim_number,
    build_fact_prize,
    build_mart,
    full_dim_number,
    run_full_pipeline,
)


def test_silver_drops_exactly_the_bad_rows(spark, lottery_bronze_rows):
    silver = bronze_to_silver(lottery_bronze_rows)
    rows = silver.collect()
    # 6 valid Giải-Bảy rows survive (dup kept at silver); the other tiers,
    # len<2, non-numeric, and bad-date rows are gone.
    assert len(rows) == 6
    assert all(0 <= r["number_value"] <= 99 for r in rows)


def test_fact_grain_and_total_draws(spark, lottery_bronze_rows):
    out = run_full_pipeline(lottery_bronze_rows, as_of="2024-01-10")
    fact = out["fact_prize"].collect()
    # 2.7.1: the duplicate (01-01, 07) collapses -> 3 facts on 01-01, 2 on 02-01
    assert len(fact) == 5
    assert all(r["occurrence_count"] == 1 for r in fact)
    by_date = {r["date_key"]: r["total_draws"] for r in fact}
    # 2.7.2: total_draws counts ALL silver rows of the date, including dups
    assert by_date[20240101] == 4
    assert by_date[20240102] == 2


def test_days_since_last_null_on_first(spark, lottery_bronze_rows):
    out = run_full_pipeline(lottery_bronze_rows, as_of="2024-01-10")
    fact = out["fact_prize"]
    dim = out["dim_number"]
    joined = fact.join(dim, "number_key").select("number_value", "date_key", "days_since_last")
    rows = {(r["number_value"], r["date_key"]): r["days_since_last"] for r in joined.collect()}
    assert rows[("23", 20240101)] is None     # 2.7.3: first appearance
    assert rows[("23", 20240102)] == 1        # next day


def test_dim_number_normalization_and_keys(spark, lottery_bronze_rows):
    dim = build_dim_number(bronze_to_silver(lottery_bronze_rows)).collect()
    values = [r["number_value"] for r in dim]
    assert values == ["7", "23", "41", "99"]           # zeros stripped, int order
    assert [r["number_key"] for r in dim] == [1, 2, 3, 4]
    assert dim[0]["last_digit"] == 7


def test_dim_number_guard_rejects_high_cardinality(spark, lottery_bronze_rows):
    """The unpartitioned row_number() surrogate is safe only for a bounded
    domain: the builder must refuse when distinct natural keys exceed
    max_natural_keys instead of silently serializing a big dimension
    through one task."""
    import pytest

    silver = bronze_to_silver(lottery_bronze_rows)  # 4 distinct numbers
    with pytest.raises(ValueError, match="distinct natural keys"):
        build_dim_number(silver, max_natural_keys=3)
    # at or under the bound (and with the guard off) it still builds
    assert build_dim_number(silver, max_natural_keys=4).count() == 4
    assert build_dim_number(silver, max_natural_keys=None).count() == 4


def test_incremental_dim_number_keys_continue(spark, lottery_bronze_rows):
    silver = bronze_to_silver(lottery_bronze_rows)
    existing = build_dim_number(silver)
    # new batch introduces 55 (and repeats 23, which must not be re-issued)
    ts = dt.datetime(2024, 1, 7)
    new_bronze = spark.createDataFrame(
        [
            ("Giải Bảy", "55", "05-01-2024", "x", ts),
            ("Giải Bảy", "23", "05-01-2024", "x", ts),
        ],
        lottery_bronze_rows.schema,
    )
    new_silver = bronze_to_silver(new_bronze)
    delta = build_dim_number(new_silver, existing=existing).collect()
    assert [(r["number_value"], r["number_key"]) for r in delta] == [("55", 5)]
    full = full_dim_number(
        build_dim_number(new_silver, existing=existing), existing
    )
    assert full.count() == 5
    # keys stay unique and stable
    assert full.select("number_key").distinct().count() == 5


def test_mart_probability_and_denominator(spark, lottery_bronze_rows):
    out = run_full_pipeline(lottery_bronze_rows, as_of="2024-01-10")
    mart = {r["number_value"]: r for r in out["mart"].collect()}
    # denominator = 4 + 2 silver rows = 6 (including the intra-date dup)
    assert all(r["total_draws"] == 6 for r in mart.values())
    assert float(mart["23"]["probability"]) == 0.3333  # 2/6 at DECIMAL(36,4)
    assert int(mart["23"]["total_occurrences"]) == 2
    assert mart["23"]["days_since_last"] == 8          # as_of 01-10 vs 01-02


def test_statistics_deterministic_tiebreak(spark, lottery_bronze_rows):
    out = run_full_pipeline(lottery_bronze_rows, as_of="2024-01-10")
    stats = mart_statistics(out["mart"]).first()
    assert stats["most_number"] == 23                  # unique max
    # 7, 41, 99 all tie at 1 occurrence -> lowest wins deterministically
    assert stats["least_number"] == 7
    assert stats["total_occurrences"] == 6             # MAX(total_draws)
    assert stats["last_update"] == dt.date(2024, 1, 2)


def test_dim_date_attributes(spark, lottery_bronze_rows):
    dim = build_dim_date(bronze_to_silver(lottery_bronze_rows))
    rows = {r["date_key"]: r for r in dim.collect()}
    assert set(rows) == {20240101, 20240102}
    r = rows[20240101]
    assert (r["day_of_month"], r["month_of_year"], r["year_value"]) == (1, 1, 2024)
    assert r["year_month_value"] == "2024-01"
    assert r["day_name"] == "Thứ 2"                    # 2024-01-01 is a Monday
    assert r["is_weekend"] == 0


def test_fact_anti_join_idempotent_reload(spark, lottery_bronze_rows):
    silver = bronze_to_silver(lottery_bronze_rows)
    dim = build_dim_number(silver)
    fact1 = build_fact_prize(silver, dim)
    # re-loading the same batch against the existing fact adds nothing (J4)
    fact2 = build_fact_prize(silver, dim, existing=fact1)
    assert fact2.count() == 0


def test_merge_mart_equals_full_recompute(spark, lottery_bronze_rows):
    from datawarehouse_group10_spark.plans.medallion import merge_mart

    # split the batch by date: 01-01 rows vs later rows
    b1 = lottery_bronze_rows.filter("full_date = '01-01-2024'")
    b2 = lottery_bronze_rows.filter("full_date <> '01-01-2024'")
    m1 = run_full_pipeline(b1, as_of="2024-01-10")["mart"]
    m2 = run_full_pipeline(b2, as_of="2024-01-10")["mart"]
    merged = merge_mart(m1, m2)
    full = run_full_pipeline(lottery_bronze_rows, as_of="2024-01-10")["mart"]
    a = {tuple(map(str, r)) for r in merged.collect()}
    b = {tuple(map(str, r)) for r in full.collect()}
    assert a == b


def test_profile_and_approx_distinct(spark):
    from datawarehouse_group10_spark.operators.aggregates import (
        approx_distinct_counts,
        profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "a")], "k int, v string"
    )
    prof = {r["column"]: r for r in profile(df).collect()}
    assert prof["v"]["n_nulls"] == 1 and prof["v"]["n_distinct"] == 2
    assert prof["k"]["min_value"] == "1" and prof["k"]["max_value"] == "4"
    assert prof["k"]["n_rows"] == 4
    big = spark.range(0, 10000).select((F.col("id") % 1000).alias("x"))
    approx = approx_distinct_counts(big, ["x"]).first()["x_approx"]
    assert abs(approx - 1000) / 1000 < 0.1   # HLL within guaranteed rsd


def test_repeated_pipeline_runs_do_not_leak_cached_rdds(spark, lottery_bronze_rows):
    """A long-lived driver (serving, bench repeats) re-running the pipeline
    must not accumulate dead cached RDDs: each invocation releases the
    previous one's caches (r5 verdict item 6)."""
    from datawarehouse_group10_spark.plans.medallion import (
        release_pipeline_caches,
    )

    def n_cached() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    release_pipeline_caches()
    baseline = n_cached()  # other tests' caches may be resident; assert DELTAs
    for _ in range(3):
        out = run_full_pipeline(lottery_bronze_rows, as_of="2024-01-10")
        out["mart"].count()  # materialize -> populates the caches
    # after 3 runs only the LAST invocation's caches (silver + dim_number)
    # may have been added
    assert n_cached() - baseline <= 2
    release_pipeline_caches()
    assert n_cached() - baseline <= 0

from __future__ import annotations

import datetime as dt

import pytest

from datawarehouse_group10_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.enabled": "false",
            # static conf: needed by the bucketed-table test's saveAsTable
            "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def lottery_bronze_rows(spark):
    """Crafted bronze rows covering every SURVEY §2.7 trap:
    - intra-date duplicate Giải-Bảy number (07 twice on 01-01)
    - leading-zero vs stripped form of the same number ('07' then '7'... but
      '7' is len<2 so it is DROPPED by T2 — included to pin that rule)
    - non-Bảy tiers that must be filtered out
    - unparseable date and non-numeric number (T6 tolerance)
    """
    rows = [
        ("Giải Bảy", "07", "01-01-2024"),
        ("Giải Bảy", "07", "01-01-2024"),   # intra-date duplicate
        ("Giải Bảy", "23", "01-01-2024"),
        ("Giải Bảy", "99", "01-01-2024"),
        ("Giải Bảy", "23", "02-01-2024"),
        ("Giải Bảy", "41", "02-01-2024"),
        ("Giải Nhất", "12345", "01-01-2024"),  # filtered by T1
        ("Giải Bảy", "7", "03-01-2024"),       # len<2 -> dropped (T2)
        ("Giải Bảy", "xx", "01-01-2024"),      # non-numeric -> NULL -> dropped
        ("Giải Bảy", "55", "zz-zz-zzzz"),      # bad date -> dropped (T3/T6)
    ]
    ts = dt.datetime(2024, 1, 5, 12, 0, 0)
    return spark.createDataFrame(
        [(p, n, d, "x", ts) for p, n, d in rows],
        "prize string, number_value string, full_date string, "
        "created_at string, load_timestamp timestamp",
    )

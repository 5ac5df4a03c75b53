"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``datawarehouse_group10_spark.contract`` —
one named query per SURVEY.md §2 operator plus the LLM-data-pipeline ops
(dedup / similarity / text / multimodal / streaming). Since round 3
EVERY registered query carries a full DuckDB oracle: the hash-based ops
were made engine-portable (md5-half SimHash, data-derived LSH planes,
SQL-expressible IVF) or oracled on their exact-verified outputs
(MinHash-LSH pairs, recursive-CTE connected components).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datawarehouse_group10_spark.contract import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full medallion pipeline (bronze -> silver ->
    star schema -> mart) over the sf0.001 testdata, returning the serving
    mart — the reference's entire P2-P4 + mart build as one declarative
    plan."""
    return QUERIES["pipeline_mart"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and per
    LLM-pipeline op). Each callable takes (spark, sf_dir) and returns a
    DataFrame with oracle-matching column names."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — since round 3 EVERY
    registered query has one (the hash-bucket ops were made
    engine-portable or oracled on their exact-verified outputs), so the
    driver records a full rows+schema+hash check for all 50 entries."""
    return dict(ORACLES)

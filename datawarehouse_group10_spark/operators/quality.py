"""Declarative data-quality expectations, evaluated in single passes.

The reference's only quality control is silent bad-record dropping in
its loaders (SURVEY §2.7); a warehouse also needs the ASSERTION side:
declare what must hold, measure violations, and publish the report the
pipeline gates on. Three rule families, each with the cheapest plan that
can evaluate it:

- row rules (:func:`expect_rows`): arbitrary boolean expressions —
  ALL rules fold into ONE aggregate over ONE scan (a conditional sum
  per rule), whatever their number;
- uniqueness (:func:`expect_unique`): violations = rows − distinct
  keys — one hash aggregate on the key;
- referential integrity (:func:`expect_reference`): orphan foreign
  keys via a left-anti join against the (broadcastable) dimension key
  set.

All three return the same (rule, n_rows, n_violations, passed) shape so
reports union into one gate result; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect_rows", "expect_unique", "expect_reference", "observe_rows"]

def expect_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate boolean row expectations (true = row OK; NULL counts as a
    violation — an expectation that cannot be established is not met).
    One aggregate over one scan regardless of rule count.

    Rule names are carried as literal Columns (array-of-structs +
    explode over the single aggregate row), never interpolated into SQL
    text — a name containing quotes or any other character is data, not
    expression syntax (ADVICE r7)."""
    aggs = [
        F.sum(
            F.when(F.coalesce(v, F.lit(False)), F.lit(0)).otherwise(F.lit(1))
        ).cast("bigint").alias(f"_v_{i}")
        for i, v in enumerate(rules.values())
    ]
    row = df.agg(F.count("*").cast("bigint").alias("_n"), *aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return row.select(F.col("_n"), F.explode(pairs).alias("_p")).select(
        F.col("_p.rule").alias("rule"),
        F.col("_n").alias("n_rows"),
        F.col("_p.n_violations").alias("n_violations"),
        (F.col("_p.n_violations") == 0).cast("int").alias("passed"),
    )


def expect_unique(df: DataFrame, cols: list[str], rule: str | None = None) -> DataFrame:
    """Uniqueness expectation over ``cols``: violations = total rows −
    distinct key combinations (NULL keys group like values)."""
    name = rule or ("unique_" + "_".join(cols))
    return (
        df.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (F.count("*") - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("bigint")
            .alias("n_violations"),
        )
        .select(
            F.lit(name).alias("rule"),
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).cast("int").alias("passed"),
        )
    )


def expect_reference(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
    rule: str | None = None,
) -> DataFrame:
    """Referential integrity: rows of ``df`` whose ``col`` has no match
    in ``dim.dim_col`` (NULL foreign keys are orphans too). The
    dimension key set deduplicates then broadcasts under AQE when small;
    violations come from a left-anti join, counted distributed."""
    name = rule or f"ref_{col}_in_{dim_col}"
    keys = dim.select(F.col(dim_col).alias("_ref")).distinct()
    orphans = df.select(F.col(col).alias("_fk")).join(
        keys, F.col("_fk") == F.col("_ref"), "left_anti"
    )
    total = df.agg(F.count("*").cast("bigint").alias("n_rows"))
    bad = orphans.agg(F.count("*").cast("bigint").alias("n_violations"))
    return total.crossJoin(F.broadcast(bad)).select(
        F.lit(name).alias("rule"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def observe_rows(
    df: DataFrame, name: str, rules: dict[str, Column]
) -> tuple[DataFrame, "object"]:
    """Attach the row expectations to a plan as OBSERVED METRICS
    (``DataFrame.observe`` + ``pyspark.sql.Observation``): the audit
    numbers are computed DURING whatever action the caller was going to
    run anyway — a write, a count, a collect — with zero extra passes
    over the data, where :func:`expect_rows` spends its own aggregate
    job. This is the in-flight instrumentation half of the quality
    family; expect_rows stays the standalone gate.

    Returns ``(observed_df, observation)``. After the FIRST action on
    ``observed_df`` completes, ``observation.get`` yields
    ``{"n_rows": …, "<rule>": <violations>, …}`` (same NULL-counts-as-
    violation semantics as expect_rows). The metrics ride the task
    results back to the driver — on a 1000-executor cluster this is an
    accumulator merge, not a second 100 TB scan.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).cast("bigint").alias("n_rows")] + [
        F.sum(
            F.when(F.coalesce(v, F.lit(False)), F.lit(0)).otherwise(F.lit(1))
        )
        .cast("bigint")
        .alias(rule)
        for rule, v in rules.items()
    ]
    return df.observe(obs, *metrics), obs

"""Slowly-changing dimension maintenance (SCD Type 2).

Beyond the reference's SCD1-style dims (its dim_number/dim_date rows are
insert-only and never restated — ETLMain.java anti-join loads), a general
warehouse needs versioned dimensions: when a tracked attribute changes,
close the open row and open a new one, preserving history for as-of
joins.

Scale shape: one shuffle on the natural key (the join between the open
slice and the update batch), map-side everything else. The update batch
is usually tiny relative to the dimension — Spark broadcasts it under
AQE / the autoBroadcastJoinThreshold without help. History rows
(``is_current = false``) never enter the join: they are filtered out
before the shuffle and unioned back untouched, so cost is
O(open rows + batch), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HIGH_DATE = "9999-12-31"


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension; returns the new full
    dimension table.

    ``current`` carries key + tracked columns plus the bookkeeping
    columns (``valid_from``/``valid_to`` dates, boolean
    ``current_flag``); ``updates`` carries key + tracked columns plus
    ``effective_col`` (the change date). Per key, only the LATEST update
    in the batch (by ``effective_col``) is applied — intra-batch
    intermediate states are not versioned, matching warehouse batch
    semantics.

    Outcomes per open row / update pair:

    - attribute values differ (null-safe): the open row closes at the
      update's effective date and a new open row starts there;
    - values equal: the open row is kept untouched (idempotent re-loads);
    - new key: a new open row starts at its effective date;
    - no update for a key: row passes through untouched.

    History rows are never touched or shuffled.
    """
    hist = current.filter(~F.col(current_flag))
    open_rows = current.filter(F.col(current_flag))

    # Latest update per key; deterministic under ties via the tracked
    # columns as a final tiebreak.
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(effective_col).desc(), *[F.col(c).desc() for c in tracked_cols]
    )
    upd = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    u = upd.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols + tracked_cols],
        F.col(effective_col).cast("date").alias("_u_eff"),
    )
    cond = [F.col(k) == F.col(f"_u_{k}") for k in key_cols]
    joined = open_rows.join(u, cond, "full_outer")

    changed = F.coalesce(
        ~F.struct(*[F.col(c) for c in tracked_cols]).eqNullSafe(
            F.struct(*[F.col(f"_u_{c}") for c in tracked_cols])
        ),
        F.lit(False),
    )
    has_open = F.col(valid_from).isNotNull()
    has_upd = F.col("_u_eff").isNotNull()

    untouched = joined.filter(has_open & (~has_upd | ~changed)).select(
        *current.columns
    )
    closed = joined.filter(has_open & has_upd & changed).select(
        *key_cols,
        *tracked_cols,
        F.col(valid_from),
        F.col("_u_eff").alias(valid_to),
        F.lit(False).alias(current_flag),
    )
    opened = joined.filter(has_upd & (~has_open | changed)).select(
        *[F.col(f"_u_{c}").alias(c) for c in key_cols],
        *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
        F.col("_u_eff").alias(valid_from),
        F.lit(HIGH_DATE).cast("date").alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    return (
        hist.unionByName(untouched)
        .unionByName(closed.select(*current.columns))
        .unionByName(opened.select(*current.columns))
    )


def scd2_as_of(
    dim: DataFrame,
    as_of: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """The dimension as it stood on ``as_of``: rows whose validity
    interval covers the date (half-open ``[valid_from, valid_to)``).
    Both bounds are plain date columns, so a partitioned/sorted layout on
    ``valid_from`` gives the scan min/max pruning."""
    d = F.lit(as_of).cast("date")
    return dim.filter((F.col(valid_from) <= d) & (F.col(valid_to) > d))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data capture between two snapshots of the same keyed table:
    one row per CHANGED key — ``change`` in ('insert', 'delete',
    'update'), ``changed_cols`` the array of compare columns whose values
    differ (NULL-safe), plus ``old_<c>`` / ``new_<c>`` value pairs.
    Unchanged keys are dropped. This is the upstream feed of
    :func:`scd2_apply` (an 'update'/'insert' row becomes the SCD2 update
    batch) and of any incremental downstream refresh.

    Scale shape: ONE full-outer shuffle join on the key columns —
    everything else is null-safe column compares in the projection. At
    100 TB both sides are scans of columnar snapshots pruned to
    key + compare columns; if the snapshots share a bucketed layout on
    the keys (operators/skew.py: write_bucketed_table) the join is
    shuffle-free.
    """
    compare_cols = compare_cols or [
        c for c in old.columns if c not in key_cols
    ]
    o = old.select(
        *key_cols, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("_in_old", F.lit(1))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("_in_new", F.lit(1))
    j = o.join(n, key_cols, "full_outer")
    changed_cols = F.array_compact(
        F.array(*[
            F.when(
                ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")), F.lit(c)
            )
            for c in compare_cols
        ])
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(F.size(changed_cols) > 0, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .withColumn("changed_cols", changed_cols)
        .select(
            *key_cols,
            "change",
            "changed_cols",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )

"""Window / ordered computation operators (SURVEY.md section 2.5, W1-W6).

The reference implements W2 as a global sort + running HashMap over the
whole batch in driver heap (ETLMain.java:359-412). A window function
partitioned by the entity key replaces it: Spark shuffles once on the key,
sorts within partitions, and streams the lag state — no driver
materialization, scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def days_since_last(
    df: DataFrame,
    key: str = "number_key",
    date_col: str = "full_date",
    out_col: str = "days_since_last",
) -> DataFrame:
    """W1+W2: per-key days since previous appearance; NULL on the first
    appearance (ETLMain.java:394-397). The reference's global date sort (W1)
    is subsumed by the window's per-partition ordering."""
    w = Window.partitionBy(key).orderBy(date_col)
    return df.withColumn(
        out_col,
        F.datediff(F.col(date_col), F.lag(date_col, 1).over(w)).cast("int"),
    )


def recency_bucket(col: Column | str, recent: int = 10, old: int = 30) -> Column:
    """W5: dashboard recency classification
    (lottery_frontend/.../TableComponent.jsx:71-75)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c <= recent, "recent").when(c <= old, "old").otherwise("long")
    )


def percent_display(col: Column | str, decimals: int = 2) -> Column:
    """W6: probability -> percentage rounded for display
    (TableComponent.jsx:46-55)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, decimals)


def top_k(df: DataFrame, order_col: str, k: int, desc: bool = True) -> DataFrame:
    """W3+W4: ordered pagination (sortable dashboard table + LIMIT). A global
    sort-limit is optimized by Spark into per-partition top-k + single merge
    (TakeOrderedAndProject), so it never materializes a full global sort."""
    order = F.col(order_col).desc() if desc else F.col(order_col).asc()
    return df.orderBy(order).limit(k)


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the key's gap
    since the previous event exceeds ``gap_minutes``. session_id is the
    running count of session starts (1-based) per key — the classic
    lag + conditional cumulative-sum window composition.

    Physically: one shuffle on the key, one sort within partitions, both
    window functions share the same window frame — a single WindowExec.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    gap_sec = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(
        gap_sec.isNull() | (gap_sec > gap_minutes * 60), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )

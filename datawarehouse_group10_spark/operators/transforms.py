"""Row-level transforms (SURVEY.md section 2.2, operators T1-T12).

Every operator is a pure Column expression or a thin DataFrame function —
all JVM-side builtin functions, so the whole chain stays inside one
whole-stage-codegen span and Catalyst can push the T1 filter into the scan.
No Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The prize tier P3 keeps (transform_staging/.../LotteryTransform.java:114).
#: UTF-8 Vietnamese literal; equality must hold byte-for-byte (SURVEY 2.7.7).
GIAI_BAY = "Giải Bảy"

#: Vietnamese day names keyed by Spark dayofweek() (1=Sunday..7=Saturday),
#: reproducing ETLMain.java:275-285 (T10). A map literal, NOT
#: date_format(..,'EEEE'), which is locale-dependent.
_VI_DAY_BY_DOW = {
    1: "Chủ nhật",  # Sunday
    2: "Thứ 2",
    3: "Thứ 3",
    4: "Thứ 4",
    5: "Thứ 5",
    6: "Thứ 6",
    7: "Thứ 7",
}


def filter_prize(df: DataFrame, prize: str = GIAI_BAY) -> DataFrame:
    """T1: equality predicate filter; Catalyst pushes it to the source scan
    exactly as the reference pushed it into MySQL WHERE
    (LotteryTransform.java:113-114)."""
    return df.filter(F.col("prize") == prize)


def last_k_digits(col: Column | str, k: int = 2) -> Column:
    """T2: last-k characters of a digit string as int; NULL when the string
    is shorter than k (reference skips those rows,
    LotteryTransform.java:128-130)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_cast, not cast: ANSI mode would throw on non-digit strings; the
    # reference skips such rows (T6 tolerance), so NULL -> filtered later.
    return F.when(F.length(c) >= k, F.substring(c, -k, k).try_cast("int"))


def parse_draw_date(col: Column | str, fmt: str = "dd-MM-yyyy") -> Column:
    """T3: dd-MM-yyyy string -> DATE (LotteryTransform.java:125,131).
    try_to_date keeps T6 bad-record tolerance: unparseable -> NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(c, fmt)


def decade_bucket(col: Column | str, width: int = 10) -> Column:
    """T4: bucket an integer into '%02d-%02d' decades, e.g. 73 -> '70-79'
    (LotteryTransform.java:133-135). ``width`` generalizes to any bucket size
    (width_bucket-style)."""
    c = F.col(col) if isinstance(col, str) else col
    lower = (F.floor(c / width) * width).cast("int")
    return F.format_string("%02d-%02d", lower, lower + (width - 1))


def derive_flags(number_col: Column | str, date_col: Column | str) -> dict[str, Column]:
    """T5: is_even / is_weekend as 0/1 ints, derived from the data itself
    (the committed staging DDL lacks these columns — SURVEY 2.2 T5 note)."""
    n = F.col(number_col) if isinstance(number_col, str) else number_col
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "is_even": (n % 2 == 0).cast("int"),
        "is_weekend": F.dayofweek(d).isin(1, 7).cast("int"),
    }


def normalize_numeric_string(col: Column | str) -> Column:
    """T7: trim, strip leading zeros via int round-trip; non-numeric strings
    pass through trimmed ('07'->'7', 'abc'->'abc') — ETLMain.java:432-442.

    Divergence note: SQL trim removes only ' ' whereas Java String.trim
    also removes control chars <= 0x20; the domain (digit strings) never
    hits the difference, and SQL semantics keep oracle parity."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(c.rlike(r"^\d+$"), c.try_cast("bigint").cast("string")).otherwise(c)


def surrogate_date_key(col: Column | str) -> Column:
    """T8: DATE -> int yyyyMMdd surrogate key (ETLMain.java:210)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def calendar_attributes(col: Column | str) -> dict[str, Column]:
    """T9: calendar attribute family for dim_date (ETLMain.java:261-264)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "day_of_month": F.dayofmonth(c),
        "month_of_year": F.month(c),
        "year_value": F.year(c),
        "year_month_value": F.date_format(c, "yyyy-MM"),
    }


def vietnamese_day_name(col: Column | str) -> Column:
    """T10: Vietnamese day-of-week name via a CASE chain over dayofweek()
    (ETLMain.java:275-285)."""
    c = F.col(col) if isinstance(col, str) else col
    dow = F.dayofweek(c)
    expr = F.lit(None).cast("string")
    for k, v in _VI_DAY_BY_DOW.items():
        expr = F.when(dow == k, F.lit(v)).otherwise(expr)
    return expr


def last_digit(col: Column | str) -> Column:
    """T11: last digit of a numeric string; 0 when unparseable — preserves the
    reference's 0-default quirk (ETLMain.java:314-316)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("int") % 10, F.lit(0))


def iso_z_timestamp(col: Column | str) -> Column:
    """T12: timestamp -> ISO-8601 text with literal Z
    (LotteryCrawler.java:26,249)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

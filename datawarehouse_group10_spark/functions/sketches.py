"""Mergeable frequency sketches: count-min over item streams.

Companion to the cardinality sketches in ``operators/aggregates.py``
(Datasketches HLL + the portable register variant): where HLL answers
"how many DISTINCT items", count-min answers "about how often does item
x occur" in fixed memory, with one-sided error (estimates never
undercount) and ELEMENTWISE-SUM mergeability — per-partition or per-day
sketches add up to the corpus sketch without touching raw data, the
property that makes frequency monitoring possible over a 100 TB stream
where an exact per-item count would shuffle every token.

Hashing is the repo's portable idiom (md5 hex halves — identical on
every engine), so the whole sketch matrix is exact integers and the
registered surface carries a full DuckDB oracle (see
``text_corpus_stats``'s cms sections) — same move as
``simhash_portable`` / ``hll_portable_registers``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item, j: int, width: int):
    """Row-j bucket for an item column: first md5 half of 'j:item' as an
    unsigned 32-bit int, mod width — JVM-side, codegen, portable."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), item)), 1, 8), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(width)).cast("int")


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the CMS matrix over the item STREAM (one increment per input
    row): returns (j, bucket, cnt) for the non-zero cells of a
    ``depth`` x ``width`` counter matrix.

    Plan shape: each row explodes to exactly ``depth`` (j, bucket) cells
    (bounded duplication) and ONE hash aggregate on the uniform
    (j, bucket) key counts them — map-side partial combine applies, so
    the shuffle moves at most depth*width rows per partition no matter
    the input size. Merging two sketches is a union + the same groupBy
    (elementwise sum); :func:`merge_count_min` does exactly that, and
    the pytest property pins split-merge == whole-corpus equality.
    """
    item = F.col(item_col)
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"), _bucket(item, j, width).alias("bucket")
                )
                for j in range(depth)
            ])
        ).alias("cell")
    )
    return (
        cells.groupBy(
            F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def merge_count_min(*sketches: DataFrame) -> DataFrame:
    """Elementwise-sum merge of CMS matrices built with the SAME
    (depth, width, hash family): union + one aggregate on (j, bucket)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def cms_point_estimates(
    cms: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: estimate =
    min over rows j of the item's bucket counter (the CMS guarantee:
    estimate >= true count, overshoot bounded by collisions ~ N/width
    per row, minimized over ``depth`` independent rows).

    The sketch itself is bounded by depth*width non-zero cells — that is
    the point of a sketch — so it BROADCASTS into the probe join no
    matter how large the stream it summarizes was; a probe hitting a
    missing (all-zero) cell coalesces to 0, so never-seen items estimate
    exactly 0 rather than disappearing.
    """
    item = F.col(item_col)
    probes = items.select(
        item.alias("_item"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"), _bucket(item, j, width).alias("bucket")
                )
                for j in range(depth)
            ])
        ).alias("cell"),
    ).select("_item", F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy("_item")
        .agg(
            F.min(F.coalesce("cnt", F.lit(0)))
            .cast("bigint")
            .alias("cms_estimate")
        )
        .select(F.col("_item").alias(item_col), "cms_estimate")
    )

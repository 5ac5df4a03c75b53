"""Deterministic sampling / splitting / mixing for training-data
pipelines — the operations that sit between "deduped corpus" and "training
shards" at 100 TB.

Everything here is HASH-BASED, never RNG-based: a row's split is a pure
function of its id, so (a) re-runs and backfills are stable, (b) adding
data never reshuffles old rows across splits, (c) any engine can recompute
the assignment (the md5-derived bucket is the same engine-portable trick
as functions.dedup.simhash_portable), and (d) no `sample()`/`rand()`
nondeterminism ever reaches a data path. All expressions are JVM-side
column arithmetic: one scan, zero shuffles, zero Python.

At scale: a split/mixture is a FILTER, so it composes with partition
pruning and pushes work to the scan; nothing materializes an intermediate
sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "deterministic_split", "mixture_sample"]

#: Buckets per unit of probability — percentages with 0.01% resolution.
_BUCKETS = 10_000


def hash_bucket(
    id_col: Column | str, buckets: int = _BUCKETS, salt: str = ""
) -> Column:
    """Stable bucket in [0, buckets) from the row id: first 8 hex chars of
    md5(id || salt) as an integer (engine-portable; uniform for any id type
    that casts to a stable string).

    ``salt`` decorrelates independent uses of the bucket on the same id
    column.  Without it, two hash-based decisions (e.g. a mixture filter
    followed by a train/val/test split) would share one bucket value, so
    the second decision would see only the survivors of the first — e.g.
    mixture rate 0.3 then train_frac 0.8 would yield 100% 'train'.  Each
    public operation in this module passes its own fixed salt.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    keyed = F.concat(c.cast("string"), F.lit(salt)) if salt else c.cast("string")
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10)
        .cast("bigint") % buckets
    )


#: Per-purpose salts: split and mixture decisions on the same id column
#: must be statistically independent (see :func:`hash_bucket`).
SPLIT_SALT = ":split"
MIXTURE_SALT = ":mix"


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Train/val/test assignment as a derived column (no shuffle, no RNG):
    bucket < train_frac -> 'train'; < train_frac+val_frac -> 'val';
    else 'test'. Fractions are exact to 1/10000.

    A row's split NEVER changes when the corpus grows — the property that
    keeps eval sets honest across dataset versions.  The bucket is salted
    (``SPLIT_SALT``) so the split is independent of any prior
    :func:`mixture_sample` filter on the same ids.
    """
    b = hash_bucket(id_col, salt=SPLIT_SALT)
    t = int(round(train_frac * _BUCKETS))
    v = int(round((train_frac + val_frac) * _BUCKETS))
    return df.withColumn(
        "split",
        F.when(b < t, F.lit("train")).when(b < v, F.lit("val")).otherwise(F.lit("test")),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Dataset mixing: keep each row with its source's sampling rate
    (e.g. {'web': 0.3, 'books': 1.0}) — the up/down-weighting step every
    LLM data recipe applies before sharding. Deterministic per row
    (hash-bucketed, same guarantees as :func:`deterministic_split`);
    unknown sources fall back to ``default_rate``.

    The rate table is a literal CASE expression, not a join — mixing
    composes into the scan filter.  The bucket is salted (``MIXTURE_SALT``)
    so a downstream :func:`deterministic_split` on the survivors stays
    uniform across train/val/test.
    """
    b = hash_bucket(id_col, salt=MIXTURE_SALT)
    src = F.col(source_col)
    rate_expr: Column = F.lit(float(default_rate))
    for name, rate in sorted(rates.items()):
        rate_expr = F.when(src == name, F.lit(float(rate))).otherwise(rate_expr)
    return df.filter(b < (rate_expr * _BUCKETS).cast("bigint"))


def stratified_take(
    df: DataFrame,
    by: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: str = "take",
) -> DataFrame:
    """Exactly-k-per-stratum sampling: keep the k rows of each ``by``
    group with the smallest salted hash — the quota companion to
    :func:`mixture_sample`'s rate-based thinning (a mixture recipe that
    says "25k docs from each source" needs a COUNT guarantee, not a
    probability).

    Deterministic (same seed → same sample, stable under re-runs and
    retries — no RNG), uniform WITHIN each stratum (the salted md5 order
    is independent of any data ordering), and one window pass: rank
    over (stratum, hash) and filter — the shuffle is on the stratum
    key, state per group is the running rank, never a per-group sort
    spill beyond Spark's own window machinery. Groups smaller than k
    keep all their rows.
    """
    h = F.md5(
        F.concat_ws("|", F.lit(seed), *[F.col(c).cast("string") for c in by],
                    F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )

"""Join operators (SURVEY.md section 2.3, J1-J5).

The reference hand-codes both patterns as driver-heap HashMaps/Sets
(ETLMain.java:329-337 build / :383-385 probe; :235-241,:291-297,:348-355
key sets). Here they are declarative joins so Spark picks broadcast-hash
when one side is small and falls back to shuffled hash/sort-merge when it
is not — the HashMap approach would simply OOM at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """J1: surrogate-key lookup join with an explicit broadcast hint on the
    dimension. Inner by default: lookup misses drop, exactly like the
    reference's ``continue`` on a HashMap miss (ETLMain.java:383-385).

    At scale: dims here are <=10^4 rows; broadcasting removes the shuffle on
    the (huge) fact side entirely. If a dim ever outgrows broadcast range,
    drop the hint and AQE will choose the join strategy at runtime.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return fact.join(F.broadcast(dim), on=keys, how=how)


def anti_join_new_rows(
    incoming: DataFrame,
    existing: DataFrame,
    on: str | Sequence[str],
    distinct: bool = True,
) -> DataFrame:
    """J2/J3/J4: keep only incoming rows whose key is absent from
    ``existing`` (idempotent re-load dedupe). ``distinct`` additionally
    collapses intra-batch duplicates, reproducing the reference's
    two-set check for dim_number (ETLMain.java:291-327, J3) and the
    composite-key fact dedupe (:348-355,387-388, J4).

    Spark plans this as a broadcast/shuffled left-anti join; the existing
    side only needs its key columns, so project before passing when the
    existing table is wide.
    """
    keys = [on] if isinstance(on, str) else list(on)
    out = incoming.join(existing.select(*keys), on=keys, how="left_anti")
    if distinct:
        out = out.dropDuplicates(keys)
    return out

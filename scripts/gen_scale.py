"""Scale-up generator for performance validation above the driver's
largest testdata tier.

Produces sfN as K copies of sf0.1 with per-copy key offsets:

- Fact/dim tables (customer, supplier, part, orders, lineitem): every
  primary and foreign key in copy i is offset by i * OFFSET, so each copy
  is a self-consistent subgraph. Join fan-outs, selectivities, and value
  distributions are EXACTLY those of sf0.1, replicated K times — which is
  the property a scaling measurement needs (runtime should scale with
  data volume, not with accidentally different data shape).
- region/nation stay fixed (bounded dims; nationkey FKs remain valid).
- events: event_id/user_id offset per copy, timestamps unchanged — the
  same window count with K x rows per window (a genuine scale-up of the
  streaming aggregate's per-window load, not of its state size).
- documents: doc_id offset AND every token prefixed with a copy tag, so
  cross-copy documents share no shingles: near-dup/LSH pair counts scale
  LINEARLY in K (10 identical text copies would make every pair a K^2
  cross product — a different workload, not a bigger one).
- embeddings: vec_id offset, vectors unchanged (ANN cost depends on row
  count and dimensionality, not on vector novelty).

Each table lands as ONE parquet file named {table}.parquet (the driver's
testdata layout — the streaming query symlinks events.parquet as a file).

Usage: python scripts/gen_scale.py [K] [out_dir]
Defaults: K=10, out_dir=/tmp/scale/sf1.0
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_group10_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000_000

#: key columns to offset per table (PKs and FKs into scaled tables).
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def _gen_events(k: int, out: str) -> None:
    """events via pyarrow, not Spark or DuckDB, so the scaled file keeps
    the SOURCE file's physical ts type bit-for-bit (pyarrow round-trips
    both timestamp[ns] and timestamp[us]; parquet format 2.6). Spark or
    DuckDB writers would silently rewrite the layout, and the loaders'
    layout probe (sources.events_ts_layout) must see the same physical
    type at sf1.0 as the driver ships at sf0.1."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SRC}/events.parquet")
    copies = []
    for i in range(k):
        c = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pc.add(t.column("event_id"), i * OFFSET),
        )
        c = c.set_column(
            c.schema.get_field_index("user_id"),
            "user_id",
            pc.add(c.column("user_id"), i * OFFSET),
        )
        copies.append(c)
    pq.write_table(
        pa.concat_tables(copies), f"{out}/events.parquet", version="2.6"
    )


def _write_single_file(df, out: str, t: str) -> None:
    """Write df as exactly {out}/{t}.parquet (a FILE, like the driver's
    testdata layout)."""
    stage = f"{out}/_stage_{t}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    dst = f"{out}/{t}.parquet"
    if os.path.exists(dst):
        os.remove(dst)
    shutil.move(part, dst)
    shutil.rmtree(stage)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale/sf1.0"
    os.makedirs(out, exist_ok=True)
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    _gen_events(k, out)
    print(f"events: {k}x written (pyarrow, TIMESTAMP_NS preserved)")

    for t in FIXED:
        _write_single_file(spark.read.parquet(f"{SRC}/{t}.parquet"), out, t)
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(k):
            c = df
            for key in keys:
                c = c.withColumn(key, (F.col(key) + F.lit(i * OFFSET)).cast("bigint"))
            if t == "documents" and i > 0:
                # copy-disjoint vocabulary: prefix every token
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda x: F.concat(F.lit(f"c{i}"), x),
                        ),
                        " ",
                    ),
                )
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        _write_single_file(big, out, t)
        print(f"{t}: {k}x written")
    spark.stop()


if __name__ == "__main__":
    main()

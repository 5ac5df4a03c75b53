"""Bit-identity check (r18): every _vlit/_mlit-flattened expression in
similarity.py must produce EXACTLY the values of the old per-element
F.lit form. Rebuilds the old forms inline and compares collected
results — any mismatch prints FAIL."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from datawarehouse_group10_spark.session import get_spark
from datawarehouse_group10_spark.functions import similarity as S

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
    "vec_id", "embedding"
)

books = S.pq_codebooks(emb, 4, 16)
cents = S.deterministic_centroids(emb, k=16)
query = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
planes = [vec for _cid, vec in cents[2:8]]

ok = True


def check(name, new_col, old_col):
    global ok
    a = emb.select(new_col.alias("x")).orderBy(F.col("x")).collect()
    b = emb.select(old_col.alias("x")).orderBy(F.col("x")).collect()
    same = a == b
    ok = ok and same
    print(("OK  " if same else "FAIL") + " " + name)


# --- old-form builders (pre-r18 shapes, verbatim arithmetic) ---
def old_pq_encode_col(codebooks, vec_col="embedding"):
    sub = len(codebooks[0][0])
    codes = []
    for s, cb in enumerate(codebooks):
        v = F.slice(F.col(vec_col), s * sub + 1, sub)
        dists = []
        for c in cb:
            ca = F.array(*[F.lit(float(x)) for x in c])
            dists.append(F.lit(S._pydot(c, c)) - 2 * S._dot(v, ca))
        darr = F.array(*dists)
        codes.append(
            (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
        )
    return F.array(*codes)


def old_ivf_assign_col(centroids, vec_col="embedding"):
    v = F.col(vec_col)
    dists = []
    for cid, vec in centroids:
        c = F.array(*[F.lit(float(x)) for x in vec])
        dists.append(F.lit(S._pydot(vec, vec)) - 2 * S._dot(v, c))
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def old_cosine(query, vec_col="embedding"):
    v = F.col(vec_col)
    q = F.array(*[F.lit(float(x)) for x in query])
    return S._dot(v, q) / (S._norm(v) * S._norm(q))


def old_plane_codes(planes, vec_col="embedding"):
    v = F.col(vec_col)
    code = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        proj = S._dot(v, F.array(*[F.lit(float(x)) for x in plane]))
        code = code.bitwiseOR(
            F.when(
                proj > 0, F.shiftleft(F.lit(1).cast("bigint"), p)
            ).otherwise(F.lit(0).cast("bigint"))
        )
    return code


def old_residual_col(vec_col, centroids):
    cent_arr = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in vec])
            for _cid, vec in centroids
        ]
    )
    return F.zip_with(
        F.col(vec_col),
        F.element_at(cent_arr, F.col("_cell") + 1),
        lambda a, b: a.cast("double") - b,
    )


# pq_encode compares whole column
a = S.pq_encode(emb, books).orderBy("vec_id").select("_pq").collect()
b = (
    emb.withColumn("_pq", old_pq_encode_col(books))
    .orderBy("vec_id")
    .select("_pq")
    .collect()
)
print(("OK  " if a == b else "FAIL") + " pq_encode(real)")
ok = ok and a == b

a = S.ivf_assign(emb, cents).orderBy("vec_id").select("_cell").collect()
b = (
    emb.withColumn("_cell", old_ivf_assign_col(cents))
    .orderBy("vec_id").select("_cell").collect()
)
print(("OK  " if a == b else "FAIL") + " ivf_assign")
ok = ok and a == b

check("cosine", S.cosine_similarity_col("embedding", query), old_cosine(query))
check(
    "plane_codes",
    S.data_plane_codes("embedding", planes),
    old_plane_codes(planes),
)

assigned = S.ivf_assign(emb, cents)
a = (
    assigned.withColumn("_r", S._residual_col("embedding", cents))
    .orderBy("vec_id").select("_r").collect()
)
b = (
    assigned.withColumn("_r", old_residual_col("embedding", cents))
    .orderBy("vec_id").select("_r").collect()
)
print(("OK  " if a == b else "FAIL") + " residual_col")
ok = ok and a == b

# _adc_col over encoded table
enc = S.pq_encode(emb, books)
a = enc.select(S._adc_col(query, books).alias("x")).orderBy("x").collect()


def old_adc_col(query, codebooks, code_col="_pq"):
    sub = len(codebooks[0][0])
    approx = None
    for s, cb in enumerate(codebooks):
        qs = query[s * sub:(s + 1) * sub]
        table = F.array(
            *[F.lit(S._pydot(c, c) - 2 * S._pydot(qs, c)) for c in cb]
        )
        term = F.element_at(table, F.col(code_col).getItem(s) + 1)
        approx = term if approx is None else approx + term
    return approx


b = enc.select(old_adc_col(query, books).alias("x")).orderBy("x").collect()
print(("OK  " if a == b else "FAIL") + " adc_col")
ok = ok and a == b

# _res_adc_col over residual-encoded probed rows
rbooks = S.ivfpq_train_residual_codebooks(emb, cents, m=4, k=16, n_iter=1)
probe = [c for c, _ in cents[:4]]
res = assigned.filter(F.col("_cell").isin(probe)).withColumn(
    "_res", S._residual_col("embedding", cents)
)
renc = S.pq_encode(res, rbooks, vec_col="_res")
a = renc.select(
    S._res_adc_col(query, probe, cents, rbooks).alias("x")
).orderBy("x").collect()


def old_res_adc_col(query, probe, centroids, codebooks, code_col="_pq"):
    sub = len(codebooks[0][0])
    probe_pos = F.array_position(
        F.array(*[F.lit(int(c)) for c in probe]), F.col("_cell")
    ).cast("int")
    cent = {cid: vec for cid, vec in centroids}
    approx = None
    for s, cb in enumerate(codebooks):
        tables = []
        for cid in probe:
            qres = [
                q - c
                for q, c in zip(
                    query[s * sub:(s + 1) * sub],
                    cent[cid][s * sub:(s + 1) * sub],
                )
            ]
            tables.append(
                F.array(
                    *[
                        F.lit(S._pydot(c, c) - 2 * S._pydot(qres, c))
                        for c in cb
                    ]
                )
            )
        table = F.element_at(F.array(*tables), probe_pos)
        term = F.element_at(table, F.col(code_col).getItem(s) + 1)
        approx = term if approx is None else approx + term
    return approx


b = renc.select(
    old_res_adc_col(query, probe, cents, rbooks).alias("x")
).orderBy("x").collect()
print(("OK  " if a == b else "FAIL") + " res_adc_col")
ok = ok and a == b

print("ALL OK" if ok else "SOME FAILED")
spark.stop()
sys.exit(0 if ok else 1)

"""Similarity search over the ``embeddings`` table (array<float>).

All scoring runs on *scalar-quantized* vectors (floor(x*1000) as int):
integer dot products are exact and associative, so results are
bit-identical across engines and partitionings — which makes every
operator oracle-checkable, and mirrors the int8-quantization scale
path real ANN systems use.

* brute_force_topk — exact top-k per query via broadcast cross join
  (the baseline; O(n*q), fine when q is small)
* lsh_ann_topk     — random-hyperplane LSH: 2^P sign-buckets from P
  deterministic integer hyperplanes; per-query search touches only its
  bucket. The scale path: bucket assignment is one projection, the
  join is bucket-equality instead of cross.
* embedding_near_duplicates — cosine near-dup pairs within buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonld_spark.plans.session import read_table

QUANT = 1000
N_QUERIES = 10
TOP_K = 5
# LSH planes scale with the corpus (VERDICT.md round-1 item #5): the
# effective plane count is ceil(log2(n / TARGET_BUCKET)) clamped to
# [MIN_PLANES, MAX_PLANES], computed from COUNT(*) inside the plan (no
# driver collect) — bucket population stays ~TARGET_BUCKET instead of
# the within-bucket self-join growing n^2/2^planes under a fixed 8.
# All MAX_PLANES sign bits are computed once; the bucket is the low
# `planes` bits (full % 2^planes), so the same expression serves every
# corpus size and the DuckDB oracle reproduces it bit-for-bit.
MIN_PLANES = 4
MAX_PLANES = 24
TARGET_BUCKET = 16
DIM = 64
NEAR_DUP_COSINE = 0.95


def _quantized(col="embedding"):
    # float -> double is exact; double*1000 and floor are IEEE-identical
    # across engines, so quantization is reproducible bit-for-bit
    return F.transform(F.col(col), lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def _quantized_sql(col="embedding"):
    return f"list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"


def hyperplane(p: int, dim: int = DIM) -> list[int]:
    """Deterministic integer hyperplane p: coefficient j is derived
    from md5, centered to [-8, 7] — shared with the SQL oracle."""
    coeffs = []
    for j in range(dim):
        h = hashlib.md5(f"hp-{p}-{j}".encode()).hexdigest()
        coeffs.append(int(h[:2], 16) % 16 - 8)
    return coeffs


def _dot_int(vec_col, coeffs: list[int]):
    """Integer dot product of a quantized vector with constant coeffs."""
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(c) for c in coeffs]),
            lambda x, c: x * c,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _bucket_full_expr(qcol):
    """All MAX_PLANES sign bits as one integer.

    Deliberately UNROLLED (24 independent dot expressions): a
    data-driven rewrite — one 2-D hyperplane array literal with the
    dots in nested zip_with/aggregate lambdas — was measured 4-5x
    SLOWER end-to-end (plan build 6.5 s -> 27.8 s, warm count 5.3 s ->
    28.9 s at sf0.1/8c): nested higher-order functions over a
    1536-literal matrix defeat whole-stage codegen, while the unrolled
    dots stay inside it. Kept as the measured-faster shape."""
    bucket = None
    for p in range(MAX_PLANES):
        bit = F.when(_dot_int(qcol, hyperplane(p)) > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def _planes_expr(n_col):
    """Effective plane count from the corpus size (a column, so the
    whole derivation stays inside the plan)."""
    return F.least(
        F.lit(MAX_PLANES),
        F.greatest(
            F.lit(MIN_PLANES),
            F.ceil(F.log2(n_col / F.lit(float(TARGET_BUCKET)))).cast("int"),
        ),
    )


def _pow2_long(exp_col):
    # exact for exponents <= MAX_PLANES (double mantissa)
    return F.pow(F.lit(2.0), exp_col.cast("double")).cast("long")


def _probe_expr(bucket_col, planes_col):
    """Multiprobe keys: the bucket itself plus every 1-bit flip within
    the effective planes — recall recovery for the sign-LSH buckets."""
    return F.transform(
        F.sequence(F.lit(0), planes_col),
        lambda i: F.when(i == 0, bucket_col).otherwise(
            bucket_col.bitwiseXOR(_pow2_long(i - 1))
        ),
    )


def _probe2_expr(bucket_col, planes_col):
    """Query-side multiprobe at hamming <= 2: all 0-, 1- and 2-bit
    flips of the bucket. ~planes^2/2 probes per QUERY only (queries are
    few and broadcast), roughly doubling top-k recall vs 1-bit probing
    on near-uniform vectors. Probe values are distinct, so a corpus
    vector matches at most one probe per query."""
    zero = F.lit(0).cast("long")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), planes_col),
            lambda i: F.transform(
                F.sequence(i, planes_col),
                lambda j: F.when((i > 0) & (j == i), F.lit(None).cast("long"))
                .otherwise(
                    bucket_col.bitwiseXOR(
                        F.when(i > 0, _pow2_long(i - 1)).otherwise(zero)
                    ).bitwiseXOR(
                        F.when(j > i, _pow2_long(j - 1)).otherwise(zero)
                    )
                ),
            ),
        )
    )
    return F.array_compact(pairs)


def _pair_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _norm2(a):
    return F.aggregate(a, F.lit(0).cast("long"), lambda acc, v: acc + v * v)


def with_buckets(embeddings: DataFrame) -> DataFrame:
    """vec_id, label, quantized vector, effective plane count, and the
    corpus-scaled LSH bucket (low `planes` bits of the full sign word).
    The count is a 1-row broadcast crossJoin — no driver action."""
    q = _quantized()
    n = embeddings.select(F.count("*").alias("n_vecs"))
    planes = _planes_expr(F.col("n_vecs"))
    return embeddings.crossJoin(F.broadcast(n)).select(
        "vec_id",
        "label",
        q.alias("q"),
        planes.alias("planes"),
        F.pmod(_bucket_full_expr(q), _pow2_long(planes)).alias("bucket"),
    )


def brute_force_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Exact top-k cosine neighbours for the first ``n_queries``
    vectors (quantized integer scoring; rank ties break on vec_id)."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", _quantized().alias("q"))
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    scored = emb.crossJoin(F.broadcast(queries)).where(F.col("vec_id") != F.col("query_id"))
    cos = _pair_dot(F.col("q"), F.col("qq")) / F.sqrt(
        _norm2(F.col("q")) * _norm2(F.col("qq"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"))
    )


def brute_force_topk_sql(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH emb AS (SELECT vec_id, {_quantized_sql()} AS q FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.q, q.q) /
           sqrt(list_dot_product(e.q, e.q) * list_dot_product(q.q, q.q)) AS cosine
  FROM emb e, emb q
  WHERE q.vec_id < {n_queries} AND e.vec_id <> q.vec_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM ranked WHERE rank <= {k}"""


def _bucket_full_sql() -> str:
    parts = []
    for p in range(MAX_PLANES):
        coeffs = ", ".join(str(c) for c in hyperplane(p))
        parts.append(
            f"(CASE WHEN list_dot_product(q, [{coeffs}]) > 0 THEN CAST({2 ** p} AS BIGINT) ELSE 0 END)"
        )
    return " + ".join(parts)


def _planes_sql(source: str = "embeddings") -> str:
    return (
        f"(SELECT LEAST({MAX_PLANES}, GREATEST({MIN_PLANES}, "
        f"CAST(CEIL(LOG2(COUNT(*) / {float(TARGET_BUCKET)})) AS INT))) FROM {source})"
    )


_PLANES_SQL = _planes_sql()


def _buckets_cte(source: str = "embeddings") -> str:
    """CTE fragment: emb (quantized) + b (planes + scaled bucket) —
    mirrors with_buckets bit-for-bit."""
    return f"""emb AS (SELECT vec_id, {_quantized_sql()} AS q FROM {source}),
np AS (SELECT {_planes_sql(source)} AS planes),
b AS (SELECT vec_id, q, planes,
             ({_bucket_full_sql()}) % CAST(pow(2, planes) AS BIGINT) AS bucket
      FROM emb, np)"""


_PROBE_SQL = (
    "unnest(list_transform(range(0, planes + 1), "
    "i -> CASE WHEN i = 0 THEN bucket "
    "ELSE xor(bucket, CAST(pow(2, i - 1) AS BIGINT)) END))"
)

# hamming<=2 query-side probes (mirrors _probe2_expr)
_PROBE2_SQL = (
    "unnest(list_filter(flatten(list_transform(range(0, planes + 1), i -> "
    "list_transform(range(i, planes + 1), j -> "
    "CASE WHEN i > 0 AND j = i THEN NULL ELSE "
    "xor(xor(bucket, CASE WHEN i > 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END), "
    "CASE WHEN j > i THEN CAST(pow(2, j - 1) AS BIGINT) ELSE 0 END) END))), "
    "x -> x IS NOT NULL))"
)


# multi-table LSH (VERDICT r4 #4): L independent hash tables, each a
# DISJOINT bit-slice of the MAX_PLANES-bit sign word — every sign bit
# is its own hyperplane, so slice t = bits [t*planes, (t+1)*planes) is
# a genuinely independent plane set costing ZERO extra dot products
# (the word is computed once either way; a second 24-plane set would
# triple the plan-build/codegen cost of the unrolled dots — the
# measured r3 landmine). L scales with the corpus inversely to the
# plane count: L = min(LSH_MAX_TABLES, MAX_PLANES div planes), so a
# small corpus (planes=4) gets more tables and a large one (planes
# near 24) degrades gracefully toward one. Candidates are the OR of
# the per-table bucket collisions (the public multi-table standard);
# recall@5 measured 0.58 (single table) -> see BENCH/BASELINE.md.
LSH_MAX_TABLES = 4


def _ntab_expr(planes_col):
    return F.least(
        F.lit(LSH_MAX_TABLES),
        F.floor(F.lit(MAX_PLANES) / planes_col).cast("int"),
    )


def with_bucket_tables(embeddings: DataFrame) -> DataFrame:
    """vec_id, label, quantized vector, effective plane count, table
    count, and the FULL MAX_PLANES-bit sign word (table t's bucket is
    bits [t*planes, (t+1)*planes) of it)."""
    q = _quantized()
    n = embeddings.select(F.count("*").alias("n_vecs"))
    planes = _planes_expr(F.col("n_vecs"))
    return embeddings.crossJoin(F.broadcast(n)).select(
        "vec_id",
        "label",
        q.alias("q"),
        planes.alias("planes"),
        _ntab_expr(planes).alias("ntab"),
        _bucket_full_expr(q).alias("word"),
    )


def _table_bucket(full_col, t_col, planes_col):
    """Bucket of table ``t``: bits [t*planes, (t+1)*planes) of the sign
    word. full >= 0, so plain % == pmod; pow(2, e) is exact for
    e <= MAX_PLANES in double."""
    return (full_col / _pow2_long(t_col * planes_col)).cast("long") % _pow2_long(
        planes_col
    )


def lsh_ann_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES,
    max_tables: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact ranking restricted to the OR-combined
    candidates of L bit-slice LSH tables, each probed at its bucket
    plus all 1- and 2-bit flips (multiprobe). ``max_tables=1``
    reproduces the single-table construction exactly (table 0's slice
    IS the original low-bits bucket). Deterministic (integer
    hyperplanes + count-derived planes/tables), so the oracle
    reproduces the same approximation exactly."""
    emb = with_bucket_tables(read_table(spark, sf_dir, "embeddings"))
    ntab = F.col("ntab") if max_tables is None else F.least(
        F.col("ntab"), F.lit(max_tables)
    )
    corpus = emb.select(
        "vec_id",
        "planes",
        "word",
        F.explode(F.sequence(F.lit(0), ntab - 1)).alias("t"),
    ).select(
        "vec_id",
        "t",
        _table_bucket(F.col("word"), F.col("t"), F.col("planes")).alias("bucket"),
    )
    probes = (
        emb.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            "planes",
            "word",
            F.explode(F.sequence(F.lit(0), ntab - 1)).alias("t"),
        )
        .select(
            "query_id",
            "t",
            F.explode(
                _probe2_expr(
                    _table_bucket(F.col("word"), F.col("t"), F.col("planes")),
                    F.col("planes"),
                )
            ).alias("probe"),
        )
    )
    # a vector can collide with a query in several tables — distinct
    # the (query, vector) pair set BEFORE scoring, then join the
    # quantized vectors back (a distinct over the wide array columns
    # would shuffle the vectors themselves)
    cand = (
        corpus.join(
            F.broadcast(probes),
            (corpus["t"] == probes["t"]) & (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    qvecs = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized().alias("q")
    )
    scored = (
        qvecs.join(F.broadcast(cand), "vec_id")
        .join(
            F.broadcast(
                qvecs.where(F.col("vec_id") < n_queries).select(
                    F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
                )
            ),
            "query_id",
        )
    )
    cos = _pair_dot(F.col("q"), F.col("qq")) / F.sqrt(
        _norm2(F.col("q")) * _norm2(F.col("qq"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"))
    )


# "word", not "full": FULL is a reserved word (FULL JOIN) in DuckDB
_TBUCKET_SQL = (
    "(word // CAST(pow(2, t * planes) AS BIGINT)) % CAST(pow(2, planes) AS BIGINT)"
)


def lsh_ann_topk_sql(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    """Oracle for the multi-table variant: same sign word, same
    bit-slice buckets, same hamming<=2 probes per table, OR-combined
    candidates — bit-for-bit the Spark construction."""
    return f"""
WITH emb AS (SELECT vec_id, {_quantized_sql()} AS q FROM embeddings),
np AS (SELECT planes, LEAST({LSH_MAX_TABLES}, {MAX_PLANES} // planes) AS ntab
       FROM (SELECT {_planes_sql()} AS planes)),
fullw AS (SELECT vec_id, q, ({_bucket_full_sql()}) AS word FROM emb),
corpus AS (
  SELECT vec_id, t, {_TBUCKET_SQL} AS bucket
  FROM fullw, np, UNNEST(range(0, ntab)) r(t)),
qb AS (
  SELECT vec_id AS query_id, t, {_TBUCKET_SQL} AS bucket, planes
  FROM fullw, np, UNNEST(range(0, ntab)) r(t)
  WHERE vec_id < {n_queries}),
probes AS (SELECT query_id, t, {_PROBE2_SQL} AS probe FROM qb),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id
  FROM probes p JOIN corpus c ON c.t = p.t AND c.bucket = p.probe
  WHERE c.vec_id <> p.query_id),
scored AS (
  SELECT cand.query_id, cand.vec_id AS neighbor_id,
         list_dot_product(e.q, qv.q) /
           sqrt(list_dot_product(e.q, e.q) * list_dot_product(qv.q, qv.q)) AS cosine
  FROM cand
  JOIN emb e ON e.vec_id = cand.vec_id
  JOIN emb qv ON qv.vec_id = cand.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM ranked WHERE rank <= {k}"""


IVF_CELLS = 8
IVF_ITERATIONS = 2
IVF_NPROBE = 2  # query-side cells searched (corpus stays 1 cell/vector)


def _assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmin squared-L2 cell per vector (ties -> lowest cell id);
    all-integer arithmetic so the SQL oracle reproduces it exactly."""
    dist2 = (
        _norm2(F.col("q")) + _norm2(F.col("cq")) - 2 * _pair_dot(F.col("q"), F.col("cq"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cid"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "q", F.col("cid").alias("cell"))
    )


def _train_ivf(emb: DataFrame, cells: int, iterations: int) -> DataFrame:
    """Deterministic integer Lloyd iterations: centroids seeded from
    the first ``cells`` vectors; means floored back to integers each
    round; empty cells keep their previous centroid. Centroids are
    tiny and come back to the driver between rounds (the classic
    coarse-quantizer training shape)."""
    spark = emb.sparkSession
    centroids = emb.where(F.col("vec_id") < cells).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("q").alias("cq")
    )
    for _ in range(iterations):
        assigned = _assign_cells(emb, centroids)
        means = (
            assigned.select("cell", F.posexplode("q").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.floor(F.avg("val")).cast("long").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda x: x["m"]).alias("cq"))
        )
        new_rows = {r["cell"]: r["cq"] for r in means.collect()}
        old_rows = {r["cid"]: r["cq"] for r in centroids.collect()}
        merged = [
            (cid, new_rows.get(cid, old_rows[cid])) for cid in sorted(old_rows)
        ]
        centroids = spark.createDataFrame(merged, "cid int, cq array<bigint>")
    return centroids


def ivf_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES,
    cells: int = IVF_CELLS, iterations: int = IVF_ITERATIONS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF approximate top-k: a k-means coarse quantizer partitions the
    corpus into cells (1 cell per corpus vector); each query searches
    its ``nprobe`` nearest cells, ranked by exact quantized cosine.
    The scale path next to LSH: candidate generation is a
    cell-equality join instead of cross, and only the tiny broadcast
    query side multiplies by nprobe."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", _quantized().alias("q"))
    centroids = _train_ivf(emb, cells, iterations)
    assigned = _assign_cells(emb, centroids)
    dist2 = (
        _norm2(F.col("q")) + _norm2(F.col("cq")) - 2 * _pair_dot(F.col("q"), F.col("cq"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cid"))
    probes = (
        emb.where(F.col("vec_id") < n_queries)
        .crossJoin(F.broadcast(centroids))
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("q").alias("qq"),
                F.col("cid").alias("qc"))
    )
    scored = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("qc")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _pair_dot(F.col("q"), F.col("qq")) / F.sqrt(
        _norm2(F.col("q")) * _norm2(F.col("qq"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"))
    )


def _ivf_assign_sql(vectors_cte: str, centroids_cte: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT vec_id, q, cid AS cell FROM (
    SELECT e.vec_id, e.q, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.q, e.q) + list_dot_product(c.q, c.q)
                      - 2*list_dot_product(e.q, c.q), c.cid) AS rn
    FROM {vectors_cte} e, {centroids_cte} c)
  WHERE rn = 1)"""


def _ivf_update_sql(assign_cte: str, prev_cte: str, out: str) -> str:
    return f"""
{out}_m AS (
  SELECT cell, pos, CAST(FLOOR(AVG(q[pos])) AS BIGINT) AS m
  FROM {assign_cte}, range(1, {DIM + 1}) r(pos)
  GROUP BY cell, pos),
{out} AS (
  SELECT p.cid, COALESCE(n.cq, p.q) AS q
  FROM (SELECT cid, q FROM {prev_cte}) p
  LEFT JOIN (SELECT cell AS cid, list(m ORDER BY pos) AS cq
             FROM {out}_m GROUP BY cell) n USING (cid))"""


def ivf_topk_sql(k: int = TOP_K, n_queries: int = N_QUERIES,
                 cells: int = IVF_CELLS, nprobe: int = IVF_NPROBE) -> str:
    return f"""
WITH emb AS (SELECT vec_id, {_quantized_sql()} AS q FROM embeddings),
c0 AS (SELECT CAST(vec_id AS INT) AS cid, q FROM emb WHERE vec_id < {cells}),
{_ivf_assign_sql("emb", "c0", "a1")},
{_ivf_update_sql("a1", "c0", "c1")},
{_ivf_assign_sql("emb", "c1", "a2")},
{_ivf_update_sql("a2", "c1", "c2")},
{_ivf_assign_sql("emb", "c2", "af")},
qprobe AS (
  SELECT vec_id AS query_id, q AS qq, cid AS qc FROM (
    SELECT e.vec_id, e.q, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.q, e.q) + list_dot_product(c.q, c.q)
                      - 2*list_dot_product(e.q, c.q), c.cid) AS rn
    FROM emb e, c2 c WHERE e.vec_id < {n_queries})
  WHERE rn <= {nprobe}),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.q, p.qq) /
           sqrt(list_dot_product(e.q, e.q) * list_dot_product(p.qq, p.qq)) AS cosine
  FROM af e JOIN qprobe p ON e.cell = p.qc AND e.vec_id <> p.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id FROM ranked WHERE rank <= {k}"""


# planted-pair knob (VERDICT r2 #3): the synthetic embeddings are
# near-uniform random (measured global max cosine 0.48 at every sf),
# so NO threshold in the near-duplicate regime yields rows — a 0-row
# oracle match is vacuous. Both the Spark operator and the DuckDB
# oracle deterministically augment the corpus with one near-copy per
# PLANT_EVERY vectors (first coordinate +0.1 in double space — the vectors are
# unit-normalized, measured twin cosine ~0.995), making the driver check assert the operator actually
# FINDS the planted pairs among the noise.
PLANT_EVERY = 25
PLANT_OFFSET = 1_000_000


def plant_near_duplicates(emb: DataFrame, every: int = PLANT_EVERY) -> DataFrame:
    """Deterministically augment an embeddings frame with near-copies:
    every ``every``-th vec_id gains a twin at vec_id + PLANT_OFFSET
    whose first coordinate is shifted by +0.1 (all arithmetic in
    double, bit-identical to the SQL mirror ``_plant_cte``)."""
    # planted ids must not collide with real ones — a collision would
    # corrupt the pair set IDENTICALLY on both engines, so the oracle
    # match could not catch it (one tiny driver-side job, plant mode only)
    mx = emb.agg(F.max("vec_id")).first()[0]
    if mx is not None and mx >= PLANT_OFFSET:
        raise ValueError(
            f"vec_id {mx} >= PLANT_OFFSET {PLANT_OFFSET}: planted twins would collide")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", "label", dbl.alias("embedding"))
    planted = base.where(F.col("vec_id") % every == 0).select(
        (F.col("vec_id") + F.lit(PLANT_OFFSET)).alias("vec_id"),
        "label",
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.1)),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("embedding"),
    )
    return base.unionByName(planted)


def _plant_cte(every: int = PLANT_EVERY) -> str:
    return f"""embaug AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + {PLANT_OFFSET}, label,
         [CAST(embedding[1] AS DOUBLE) + 0.1] ||
         list_transform(embedding[2:], x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id % {every} = 0)"""


def embedding_near_duplicates(
    spark: SparkSession, sf_dir: str, threshold: float = NEAR_DUP_COSINE,
    plant_every: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates collide when
    their corpus-scaled LSH buckets are within hamming 1 (each vector
    emits its bucket plus all 1-bit flips; a pair meets when either
    side's flip hits the other's key — covers hamming <= 2), then
    exact quantized-cosine verification. Candidate volume stays
    ~(planes+1)^2 * n / 2^planes with planes ~ log2(n/16).

    ``plant_every`` (optional) runs over the planted-twin augmentation
    of the corpus — the non-vacuous driver-check mode."""
    src = read_table(spark, sf_dir, "embeddings")
    if plant_every:
        src = plant_near_duplicates(src, plant_every)
    emb = with_buckets(src)
    keys = emb.select(
        "vec_id",
        F.explode(_probe_expr(F.col("bucket"), F.col("planes"))).alias("probe"),
    )
    cand = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.probe") == F.col("b.probe")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    vecs = emb.select("vec_id", "q")
    return (
        cand.join(vecs.withColumnRenamed("vec_id", "vec_a")
                  .withColumnRenamed("q", "qa"), "vec_a")
        .join(vecs.withColumnRenamed("vec_id", "vec_b")
              .withColumnRenamed("q", "qb"), "vec_b")
        .where(
            _pair_dot(F.col("qa"), F.col("qb"))
            / F.sqrt(_norm2(F.col("qa")) * _norm2(F.col("qb"))) >= threshold
        )
        .select("vec_a", "vec_b")
    )


def embedding_near_duplicates_sql(threshold: float = NEAR_DUP_COSINE,
                                  plant_every: int | None = None) -> str:
    lead = f"{_plant_cte(plant_every)},\n{_buckets_cte('embaug')}" if plant_every \
        else _buckets_cte()
    return f"""
WITH {lead},
keys AS (SELECT vec_id, {_PROBE_SQL} AS probe FROM b),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM keys x JOIN keys y ON x.probe = y.probe AND x.vec_id < y.vec_id)
SELECT vec_a, vec_b
FROM cand
JOIN b ba ON ba.vec_id = vec_a
JOIN b bb ON bb.vec_id = vec_b
WHERE list_dot_product(ba.q, bb.q) /
      sqrt(list_dot_product(ba.q, ba.q) * list_dot_product(bb.q, bb.q)) >= {threshold}"""


# --- train-vs-eval semantic contamination ------------------------------------

from jsonld_spark.operators.dedup import DECONTAM_MOD, DECONTAM_OFFSET

CONTAM_COSINE = 0.30   # flag-for-review threshold (cross-set cosines on
                       # this corpus are ~N(0, 1/sqrt(64)); 0.30 = 2.4 sigma)
# eval ids reuse the lexical decontamination schedule — imported, not
# copied, so the two contamination modes can never silently diverge
CONTAM_MOD = DECONTAM_MOD
CONTAM_OFFSET = DECONTAM_OFFSET


def embedding_contamination(spark: SparkSession, sf_dir: str,
                            threshold: float = CONTAM_COSINE) -> DataFrame:
    """Semantic train-vs-eval contamination: every (train doc, eval
    item) pair with embedding cosine >= threshold — the companion to
    dedup.decontaminate's lexical 13-gram rule (paraphrased benchmark
    leakage has no shared n-grams but stays close in embedding space).

    Unlike the ANN family this is an EXACT broadcast sweep of the eval
    set against the corpus: decontamination wants recall 1 (an LSH
    miss here silently leaks an eval item into training), and eval
    sets are small by nature, so broadcasting the eval side and
    scoring every train vector is the shape you actually run at
    100 TB — O(N x E) vectorized integer dot products. The only
    exchange is the one repartition of the quantized train side below
    the scoring stage (see below); nothing shuffles after scoring —
    the threshold filter runs map-side. The bucketed candidate
    construction (embedding_near_duplicates) remains the opt-in when E
    grows beyond broadcast size.

    Output: (vec_id, eval_id, cosine). Only SELF-pairs are excluded
    (vec_id != eval_id): an eval member still appears on the vec_id
    side when it is near a DIFFERENT eval item — the corpus sweep
    scores every stored vector, eval members included (ADVICE r5
    wording fix; the behavior is intentional and oracle-pinned).

    The quantized train-side array is materialized BELOW a repartition
    exchange: the cosine references it in three HOF aggregates (dot +
    both norms) and in both the filter and the projection, and
    CollapseProject re-inlines the quantization transform into every
    reference (no CSE across HOF lambdas — the repo-wide landmine);
    the exchange also spreads the scoring across the cluster instead
    of the scan's file-partition count (measured: the unfixed single
    scan task ran >15 min at 64k x 50 pairs; fixed, seconds)."""
    n_parts = 2 * spark.sparkContext.defaultParallelism
    emb = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", _quantized().alias("q"))
        .repartition(n_parts)
    )
    ev = emb.where(F.col("vec_id") % CONTAM_MOD == CONTAM_OFFSET).select(
        F.col("vec_id").alias("eval_id"), F.col("q").alias("qe"))
    cos = _pair_dot(F.col("q"), F.col("qe")) / F.sqrt(
        _norm2(F.col("q")) * _norm2(F.col("qe")))
    return (
        emb.crossJoin(F.broadcast(ev))
        .where(F.col("vec_id") != F.col("eval_id"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("vec_id", "eval_id", "cosine")
    )


def embedding_contamination_sql(threshold: float = CONTAM_COSINE) -> str:
    return f"""
WITH emb AS (SELECT vec_id, {_quantized_sql()} AS q FROM embeddings),
ev AS (SELECT vec_id AS eval_id, q AS qe FROM emb
       WHERE vec_id % {CONTAM_MOD} = {CONTAM_OFFSET})
SELECT e.vec_id, ev.eval_id,
       list_dot_product(e.q, ev.qe) /
         sqrt(list_dot_product(e.q, e.q) * list_dot_product(ev.qe, ev.qe))
         AS cosine
FROM emb e CROSS JOIN ev
WHERE e.vec_id <> ev.eval_id
  AND list_dot_product(e.q, ev.qe) /
        sqrt(list_dot_product(e.q, e.q) * list_dot_product(ev.qe, ev.qe))
        >= {threshold}"""

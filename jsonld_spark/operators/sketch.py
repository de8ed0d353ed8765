"""Deterministic cardinality sketches: KMV (k minimum values).

``approx_count_distinct`` (HLL++) is the built-in, but its sketch is
engine-internal — not oracle-checkable and not portable across
systems. KMV (Bar-Yossef et al., RANDOM'02) is the classic mergeable
alternative whose entire state is data: hash every value to (0, 1),
keep the ``k`` smallest hashes, estimate ``n_distinct ≈ (k-1)/h_(k)``.
With md5 as the hash the sketch is DETERMINISTIC and engine-portable
(string md5 is bit-identical everywhere), so the DuckDB oracle can
reproduce the estimate EXACTLY — the property every other operator in
this repo is held to.

Hash value: the first 15 hex digits of md5 as a 60-bit integer
(exact in BIGINT on both engines; ``h = hv / 16^15``). Estimate:
``(k-1) * 16^15 / hv_k`` computed in double with the same operand
order on both engines (IEEE-identical), or the exact distinct count
when a group holds fewer than ``k`` distinct hashes.

Scale shape: one distinct over (group, hv) — a map-side-combinable
shuffle — then a row_number window cuts the k-prefix BEFORE any
aggregation (window sorts spill; the same hub-safety policy as
neighbor_sample). Sketches merge by unioning hash sets and re-cutting
to k — the property that makes KMV a partial aggregate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonld_spark.plans.session import read_table

KMV_K = 64
_POW16_15 = float(16 ** 15)  # 2^60 — exactly representable in double


def _hv_expr(col):
    """First 15 hex digits of md5 as a BIGINT (60 bits, exact)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hv_sql(expr: str) -> str:
    """The same 60-bit value in portable SQL — digit-by-digit
    arithmetic (DuckDB has no hex-string-to-int cast; the per-digit
    strpos trick is the simhash oracle's, exact in BIGINT)."""
    terms = [
        f"(strpos('0123456789abcdef', substring(md5({expr}), {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (14 - i)} AS BIGINT)"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def kmv_distinct(
    values: DataFrame, group: str, col: str, k: int = KMV_K
) -> DataFrame:
    """Per-``group`` distinct-count estimate of ``col`` via a KMV
    sketch, alongside the exact distinct count (both defined over the
    60-bit hash space, so the comparison is apples-to-apples).

    Output: (group, exact_distinct, kmv_estimate, sketch_size).
    """
    from jsonld_spark.operators import scratch

    # consumed by BOTH the k-prefix window and the exact count —
    # uncached, the upstream explode + (grp, hv) distinct shuffle
    # would run once per consumer (scratch-tracked; caller releases)
    hashed = scratch.track(
        values.select(
            F.col(group).alias("grp"), _hv_expr(F.col(col)).alias("hv")
        ).distinct()
    )
    w = Window.partitionBy("grp").orderBy("hv")
    kth = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("grp")
        .agg(F.max("hv").alias("hvk"), F.count("*").alias("m"))
    )
    exact = hashed.groupBy("grp").agg(F.count("*").alias("exact_distinct"))
    est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_POW16_15) / F.col("hvk").cast("double")
    )
    return exact.join(kth, "grp").select(
        F.col("grp").alias(group),
        "exact_distinct",
        est.alias("kmv_estimate"),
        F.col("m").cast("int").alias("sketch_size"),
    )


def source_shingle_cardinality(spark: SparkSession, sf_dir: str,
                               k: int = KMV_K) -> DataFrame:
    """Driver query: per-source distinct word-3-gram cardinality of
    the documents corpus — exact vs KMV estimate side by side. The
    synthetic corpus has a tiny token vocabulary (~30 per source,
    which would leave the estimator branch untested); 3-gram shingles
    run 1,000-1,500 distinct per source, so the sketch genuinely
    estimates (k=64 << n)."""
    from jsonld_spark.operators.dedup import explode_shingles, with_shingles

    docs = with_shingles(read_table(spark, sf_dir, "documents"))
    sh = docs.select("source", explode_shingles().alias("s"))
    return kmv_distinct(sh, group="source", col="s", k=k)


def source_shingle_cardinality_sql(k: int = KMV_K) -> str:
    from jsonld_spark.operators.dedup import _shingles_sql

    return f"""
WITH docs AS (
  SELECT source, string_split(lower(text), ' ') AS toks FROM documents),
sh AS (SELECT source, unnest({_shingles_sql()}) AS s FROM docs),
h AS (
  SELECT DISTINCT source AS grp, {_hv_sql('s')} AS hv
  FROM sh),
ranked AS (
  SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
  FROM h),
kth AS (
  SELECT grp, MAX(hv) AS hvk, COUNT(*) AS m
  FROM ranked WHERE rn <= {k} GROUP BY grp),
ex AS (SELECT grp, COUNT(*) AS exact_distinct FROM h GROUP BY grp)
SELECT ex.grp AS source, ex.exact_distinct,
       CASE WHEN kth.m < {k} THEN CAST(kth.m AS DOUBLE)
            ELSE CAST({float(k - 1)} AS DOUBLE) * {_POW16_15!r} /
                 CAST(kth.hvk AS DOUBLE) END AS kmv_estimate,
       CAST(kth.m AS INT) AS sketch_size
FROM ex JOIN kth USING (grp)"""


# --- count-min sketch (heavy-hitter / frequency estimation) ------------------

CM_DEPTH = 4
CM_WIDTH = 16   # vocab ~31 tokens -> ~2 per bucket: the min-over-rows
                # escape is genuinely exercised (width >> vocab would
                # make every estimate trivially exact at sandbox scale)
CM_PROBES = ["join", "hash", "customer", "vector", "stream", "the",
             "notaword"]


def _cm_bucket_expr(col, row: int, width: int):
    """Deterministic bucket for sketch row ``row``: the 60-bit md5
    value of 'row:token', mod width — portable to any engine."""
    salted = F.concat(F.lit(f"{row}:"), col)
    return (_hv_expr(salted) % width).cast("int")


def _cm_bucket_sql(expr: str, row: int, width: int) -> str:
    salted = "'" + str(row) + ":' || " + expr
    return f"({_hv_sql(salted)} % {width})"


def count_min_frequencies(
    values: DataFrame, col: str, probes: list[str] | None = None,
    depth: int = CM_DEPTH, width: int = CM_WIDTH,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) over ``col``,
    probed for a fixed term list: estimate = min over ``depth`` rows of
    the bucket counters, never below the true count (the one-sided CM
    guarantee, asserted in pytest). The sketch is a (depth x width)
    integer table built by ONE explode + hash aggregate — mergeable by
    cell-wise addition, i.e. a partial aggregate at 100 TB; the probe
    side is a literal broadcast.

    Output: (term, true_count, cm_estimate)."""
    probes = CM_PROBES if probes is None else probes
    spark = values.sparkSession
    cells = values.select(
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     _cm_bucket_expr(F.col(col), r, width).alias("b"))
            for r in range(depth)
        ])).alias("cell")
    ).select("cell.r", "cell.b")
    sketch = cells.groupBy("r", "b").agg(F.count("*").alias("n"))

    probe_df = spark.createDataFrame([(t,) for t in probes], "term string")
    probe_cells = probe_df.select(
        "term",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     _cm_bucket_expr(F.col("term"), r, width).alias("b"))
            for r in range(depth)
        ])).alias("cell"),
    ).select("term", "cell.r", "cell.b")
    est = (
        # LEFT join from the probe cells: a probe bucket missing from
        # the sketch is a ZERO counter and must participate in the min
        # (an inner join would drop it and overshoot the estimate when
        # only SOME of a probe's rows hit empty buckets)
        probe_cells.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cm_estimate"))
    )
    true = (
        values.join(F.broadcast(probe_df), F.col(col) == F.col("term"))
        .groupBy("term").agg(F.count("*").alias("true_count"))
    )
    return (
        probe_df.join(F.broadcast(true), "term", "left")
        .join(F.broadcast(est), "term", "left")
        .select(
            "term",
            F.coalesce("true_count", F.lit(0)).alias("true_count"),
            F.coalesce("cm_estimate", F.lit(0)).alias("cm_estimate"),
        )
    )


def corpus_token_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: count-min frequency estimates for the probe terms
    over the documents token stream, alongside exact counts."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
    return count_min_frequencies(tok, "token")


def corpus_token_count_min_sql(depth: int = CM_DEPTH,
                               width: int = CM_WIDTH) -> str:
    probe_vals = ", ".join(f"('{t}')" for t in CM_PROBES)
    cell_selects = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cm_bucket_sql('token', r, width)} AS b FROM tok"
        for r in range(depth)
    )
    probe_cell_selects = " UNION ALL ".join(
        f"SELECT term, {r} AS r, {_cm_bucket_sql('term', r, width)} AS b FROM probes"
        for r in range(depth)
    )
    return f"""
WITH probes(term) AS (VALUES {probe_vals}),
tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
cells AS ({cell_selects}),
sketch AS (SELECT r, b, COUNT(*) AS n FROM cells GROUP BY 1, 2),
pcells AS ({probe_cell_selects}),
est AS (
  SELECT term, MIN(COALESCE(n, 0)) AS cm_estimate
  FROM pcells LEFT JOIN sketch USING (r, b) GROUP BY 1),
tru AS (
  SELECT term, COUNT(*) AS true_count
  FROM tok JOIN probes ON token = term GROUP BY 1)
SELECT p.term,
       CAST(COALESCE(t.true_count, 0) AS BIGINT) AS true_count,
       CAST(COALESCE(e.cm_estimate, 0) AS BIGINT) AS cm_estimate
FROM probes p
LEFT JOIN tru t USING (term)
LEFT JOIN est e USING (term)"""

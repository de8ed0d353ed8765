"""Keyword search: BM25-style relevance ranking over the documents
corpus — the retrieval primitive of a training-data pipeline (dataset
curation by query, contamination triage, eval-set mining).

Scoring is the BM25 term-frequency shape (Robertson-Sparck Jones;
k1/b length normalization) with one documented deviation: the idf
factor is the RAW Robertson ratio (N - df + 0.5)/(df + 0.5) without
the log. The log is a monotone per-term transform that an engine pair
cannot reproduce bit-identically (libm differs); the raw ratio keeps
every arithmetic step an IEEE-exact operation in BOTH engines. Scores
are then quantized per term to integer micro-units BEFORE the per-doc
sum (floor(s * 1e6)) so the aggregation is associative — the same
quantized-int-scoring contract as similarity.brute_force_topk.

Scale shape: the token explode + (query, term, doc) partial aggregate
is the inverted-index build; query terms and per-term document
frequencies are BROADCAST (a query set is tiny by nature); document
length joins on the natural doc key; the final top-k is a per-query
row_number window. Nothing is all-pairs; the only large shuffles are
keyed by doc or (query, doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonld_spark.plans.session import read_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# fixed query workload: mixed high/low document-frequency terms
BM25_QUERIES: dict[int, list[str]] = {
    9001: ["hash", "join", "merge"],
    9002: ["customer", "order", "window", "slow"],
    9003: ["vector", "stream", "scan"],
}


def _query_rows() -> list[tuple[int, str]]:
    return [(qid, t) for qid, terms in sorted(BM25_QUERIES.items())
            for t in terms]


def bm25_topk(spark: SparkSession, sf_dir: str,
              k: int = BM25_TOPK) -> DataFrame:
    """Top-``k`` documents per query under quantized BM25.

    Output: (query_id, rank, doc_id, score_micro)."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    qterms = spark.createDataFrame(_query_rows(), "query_id long, token string")
    # document length straight off the docs scan (== count of the
    # explode, without a second pass over the token stream)
    dl = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias("dl"),
    )
    from jsonld_spark.operators import scratch

    # consumed by BOTH the dfreq build and the scored probe side —
    # uncached, the corpus-wide explode + broadcast filter + partial
    # aggregate would run once per consumer (exchange reuse does not
    # survive the narrower dfreq projection; scratch-tracked, caller
    # releases). Small by construction: only query-term hits survive.
    tf = scratch.track(
        tok.join(F.broadcast(qterms), "token")
        .groupBy("query_id", "token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    # df per term over the distinct (term, doc) pairs of the tf frame
    dfreq = (
        tf.select("token", "doc_id").distinct()
        .groupBy("token").agg(F.count("*").alias("df"))
    )
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.lower(F.col("text")), " "))).alias("total_tokens"),
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
    )
    # every step below is IEEE-exact and mirrored operand-for-operand
    # in the oracle SQL; see module docstring
    avgdl = F.col("total_tokens") / F.col("n_docs")
    idf = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5))
    norm = F.lit(BM25_K1) * (F.lit(1.0 - BM25_B)
                             + F.lit(BM25_B) * (F.col("dl") / avgdl))
    term_score = idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)
                        / (F.col("tf") + norm))
    micro = F.floor(term_score * F.lit(1000000.0)).cast("long")
    per_doc = (
        scored.select("query_id", "doc_id", micro.alias("micro"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("micro").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), "doc_id")
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_micro")
    )


def bm25_topk_sql(k: int = BM25_TOPK) -> str:
    qvals = ", ".join(f"({qid}, '{t}')" for qid, t in _query_rows())
    k1, b = BM25_K1, BM25_B
    return f"""
WITH q(query_id, token) AS (VALUES {qvals}),
tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents),
dl AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS dl
       FROM documents),
tf AS (
  SELECT query_id, token, doc_id, COUNT(*) AS tf
  FROM tok JOIN q USING (token) GROUP BY 1, 2, 3),
dfreq AS (
  SELECT token, COUNT(*) AS df
  FROM (SELECT DISTINCT token, doc_id FROM tf) td GROUP BY 1),
stats AS (
  SELECT COUNT(*) AS n_docs,
         SUM(len(string_split(lower(text), ' '))) AS total_tokens
  FROM documents),
scored AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(
           ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           * (tf * {k1 + 1.0} / (tf + {k1} * ({1.0 - b} + {b}
              * (dl / (total_tokens / n_docs)))))
           * 1000000.0) AS BIGINT) AS micro
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (token) CROSS JOIN stats),
per_doc AS (
  SELECT query_id, doc_id, SUM(micro) AS score_micro
  FROM scored GROUP BY 1, 2)
SELECT query_id, rank, doc_id, score_micro FROM (
  SELECT query_id, doc_id, score_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id) AS rank
  FROM per_doc) r
WHERE rank <= {k}"""

"""Consolidated driver-evidence queries (VERDICT r4 #1).

The ``queries()`` registry outgrew the driver's correctness-check
window (56 registered vs 50 checked in round 4 — six queries had no
CORRECTNESS row). These suites fold families of same-shaped evidence
queries into single union queries with a ``part`` tag, so every
registered entry fits inside the driver's window while the underlying
operators keep their own full-fidelity outputs (and pytest coverage).

Each suite casts the member results to one common column set; value
columns stay TYPED (doubles stay doubles, counts stay bigint) so the
driver's value-hash comparison retains full strength — only layout is
unified, never formatting. Timestamps are rendered through an explicit
format (Spark ``date_format`` / DuckDB ``strftime``) because engine
default timestamp-to-string casts are not contractually identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S"


def _ns():
    return F.lit(None).cast("string")


def _nd():
    return F.lit(None).cast("double")


def _nl():
    return F.lit(None).cast("long")


# --- relational operator anchors (4 -> 1) ----------------------------------

def rel_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four TPC-style relational anchors + the two deterministic
    samplers as one union: pricing (agg), top_orders (3-way join +
    top-N), no_recent_orders (anti-join), sessions (window
    sessionization), sample (bottom-k hash sampling per stratum),
    token_mix (per-source token-budget mixture sampling).
    Schema: (part, k1, k2, k3, v1, v2, v3, cnt)."""
    from jsonld_spark.operators import relational

    p = relational.pricing_summary(spark, sf_dir).select(
        F.lit("pricing").alias("part"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        _ns().alias("k3"),
        F.col("sum_qty").alias("v1"),
        F.col("sum_base_price").alias("v2"),
        F.col("sum_disc_price").alias("v3"),
        F.col("count_order").alias("cnt"),
    )
    t = relational.top_unshipped_orders(spark, sf_dir).select(
        F.lit("top_orders").alias("part"),
        F.col("l_orderkey").cast("string").alias("k1"),
        F.date_format("o_orderdate", _TS_FMT_SPARK).alias("k2"),
        _ns().alias("k3"),
        F.col("revenue").alias("v1"),
        _nd().alias("v2"),
        _nd().alias("v3"),
        _nl().alias("cnt"),
    )
    c = relational.customers_without_orders(spark, sf_dir).select(
        F.lit("no_recent_orders").alias("part"),
        F.col("c_custkey").cast("string").alias("k1"),
        F.col("c_name").alias("k2"),
        _ns().alias("k3"),
        _nd().alias("v1"),
        _nd().alias("v2"),
        _nd().alias("v3"),
        F.col("c_nationkey").cast("long").alias("cnt"),
    )
    s = relational.event_sessions(spark, sf_dir).select(
        F.lit("sessions").alias("part"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("session_idx").cast("string").alias("k2"),
        F.concat(
            F.date_format("session_start", _TS_FMT_SPARK),
            F.lit("|"),
            F.date_format("session_end", _TS_FMT_SPARK),
        ).alias("k3"),
        _nd().alias("v1"),
        _nd().alias("v2"),
        _nd().alias("v3"),
        F.col("n_events").alias("cnt"),
    )
    sam = relational.stratified_sample(spark, sf_dir).select(
        F.lit("sample").alias("part"),
        F.col("source").alias("k1"),
        F.col("doc_id").cast("string").alias("k2"),
        F.col("sample_tag").alias("k3"),
        _nd().alias("v1"),
        _nd().alias("v2"),
        _nd().alias("v3"),
        F.col("hash_rank").cast("long").alias("cnt"),
    )
    mix = relational.token_budget_mix(spark, sf_dir).select(
        F.lit("token_mix").alias("part"),
        F.col("source").alias("k1"),
        F.col("doc_id").cast("string").alias("k2"),
        _ns().alias("k3"),
        F.col("n_tokens").cast("double").alias("v1"),
        F.col("source_tokens").cast("double").alias("v2"),
        _nd().alias("v3"),
        F.col("cum_tokens").alias("cnt"),
    )
    return (p.unionByName(t).unionByName(c).unionByName(s)
            .unionByName(sam).unionByName(mix))


def rel_suite_sql() -> str:
    from jsonld_spark.operators import relational

    return f"""
SELECT 'pricing' AS part, l_returnflag AS k1, l_linestatus AS k2,
       CAST(NULL AS VARCHAR) AS k3,
       sum_qty AS v1, sum_base_price AS v2, sum_disc_price AS v3,
       count_order AS cnt
FROM ({relational.pricing_summary_sql()}) pr
UNION ALL
SELECT 'top_orders', CAST(l_orderkey AS VARCHAR),
       strftime(o_orderdate, '{_TS_FMT_SQL}'), NULL,
       revenue, NULL, NULL, NULL
FROM ({relational.top_unshipped_orders_sql()}) tp
UNION ALL
SELECT 'no_recent_orders', CAST(c_custkey AS VARCHAR), c_name, NULL,
       NULL, NULL, NULL, CAST(c_nationkey AS BIGINT)
FROM ({relational.customers_without_orders_sql()}) cw
UNION ALL
SELECT 'sessions', CAST(user_id AS VARCHAR), CAST(session_idx AS VARCHAR),
       strftime(session_start, '{_TS_FMT_SQL}') || '|' ||
         strftime(session_end, '{_TS_FMT_SQL}'),
       NULL, NULL, NULL, n_events
FROM ({relational.event_sessions_sql()}) es
UNION ALL
SELECT 'sample', source, CAST(doc_id AS VARCHAR), sample_tag,
       NULL, NULL, NULL, CAST(hash_rank AS BIGINT)
FROM ({relational.stratified_sample_sql()}) sm
UNION ALL
SELECT 'token_mix', source, CAST(doc_id AS VARCHAR), NULL,
       CAST(n_tokens AS DOUBLE), CAST(source_tokens AS DOUBLE), NULL,
       cum_tokens
FROM ({relational.token_budget_mix_sql()}) tm"""


# --- multimodal transform stages (2 -> 1) ----------------------------------

def mm_transform_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize_assets + sample_frames as one union. Schema:
    (part, doc_id, idx, n_bytes, sha)."""
    from jsonld_spark.operators import multimodal

    assets = multimodal.binary_assets(spark, sf_dir)
    ni = F.lit(None).cast("int")
    r = multimodal.resize_assets(
        assets, resizer=multimodal.deterministic_fake_resizer
    ).select(
        F.lit("resized").alias("part"),
        "doc_id",
        ni.alias("idx"),
        F.col("out_bytes").alias("n_bytes"),
        F.col("out_sha256").alias("sha"),
    )
    f = multimodal.sample_frames(assets).select(
        F.lit("frames").alias("part"),
        "doc_id",
        F.col("frame_idx").alias("idx"),
        F.col("frame_bytes").alias("n_bytes"),
        F.col("frame_sha256").alias("sha"),
    )
    return r.unionByName(f)


def mm_transform_suite_sql() -> str:
    from jsonld_spark.operators import multimodal

    return f"""
SELECT 'resized' AS part, doc_id, CAST(NULL AS INT) AS idx,
       out_bytes AS n_bytes, out_sha256 AS sha
FROM ({multimodal.resized_sql()}) r
UNION ALL
SELECT 'frames', doc_id, frame_idx, frame_bytes, frame_sha256
FROM ({multimodal.sampled_frames_sql()}) f"""


# --- simhash values + near-pairs (2 -> 1) ----------------------------------

def dedup_simhash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 60-bit simhash values + Manku-blocked near pairs as one
    union. Schema: (part, a, b, v) — values: a=doc_id, v=simhash;
    pairs: a/b=doc pair, v=hamming distance."""
    from jsonld_spark.operators import dedup

    # the 60-bit signature aggregate is the expensive stage and both
    # union arms consume it. A lazy .cache() here RACED on cold runs
    # (VERDICT r5 "What's wrong" #1): the two arms are independent legs
    # of one job, so both computed the aggregate into the cache
    # concurrently (two InMemoryTableScans, 2x the expensive stage —
    # the shipped 4.1-4.3 s numbers). Instead, materialize through a
    # shuffle: the hash exchange sits ABOVE the expensive projection,
    # the arms' exchange subtrees canonicalize identically, and
    # ReuseExchange/AQE stage reuse runs the map side ONCE — the
    # aggregate is computed exactly once per job with no cache and
    # nothing precomputed outside the timed action (guide §2.4:
    # "two operations keyed the same way can share one exchange").
    # Keyed WITHOUT an explicit count on purpose: the exchange carries
    # only (doc_id, simhash) and every downstream stage is cheap, so
    # AQE's coalescing helps (interleaved A/B best-of-4 at sf0.1/32c:
    # no sharing 3.26 s, explicit 2x-cores count 3.95 s, THIS 2.88 s —
    # and the r5 racy cache shipped at 4.1-4.3 s).
    sims = dedup.simhash_values(spark, sf_dir).repartition("doc_id")
    vals = sims.select(
        F.lit("values").alias("part"),
        F.col("doc_id").alias("a"),
        _nl().alias("b"),
        F.col("simhash").alias("v"),
    )
    pairs = dedup.simhash_near_pairs(spark, sf_dir, sims=sims).select(
        F.lit("pairs").alias("part"),
        F.col("doc_a").alias("a"),
        F.col("doc_b").alias("b"),
        F.col("hamming").cast("long").alias("v"),
    )
    return vals.unionByName(pairs)


def dedup_simhash_suite_sql() -> str:
    from jsonld_spark.operators import dedup

    return f"""
SELECT 'values' AS part, doc_id AS a, CAST(NULL AS BIGINT) AS b,
       simhash AS v
FROM ({dedup.simhash_values_sql()}) sv
UNION ALL
SELECT 'pairs', doc_a, doc_b, CAST(hamming AS BIGINT)
FROM ({dedup.simhash_near_pairs_sql()}) sp"""


# --- exact dedup + near-dup clustering (round 5 late) -----------------------

def dedup_cluster_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-hash duplicate groups + LSH near-dup CLUSTER canonical
    assignment + benchmark decontamination as one union — together the
    full "which docs survive the corpus" decision. Schema: (part,
    doc_id, ref, n1, is_duplicate) — exact: ref=text_hash,
    n1=group_size; cluster: ref=canonical doc id (as string),
    n1=cluster_size; contam: ref=first benchmark id ':' bench-hit
    count, n1=n_hit_grams, is_duplicate=true (drop decision)."""
    from jsonld_spark.operators import dedup

    exact = dedup.exact_duplicates(spark, sf_dir).select(
        F.lit("exact").alias("part"),
        "doc_id",
        F.col("text_hash").alias("ref"),
        F.col("group_size").cast("long").alias("n1"),
        "is_duplicate",
    )
    clus = dedup.lsh_dup_clusters(spark, sf_dir).select(
        F.lit("cluster").alias("part"),
        "doc_id",
        F.col("canonical_doc").cast("string").alias("ref"),
        F.col("cluster_size").cast("long").alias("n1"),
        "is_duplicate",
    )
    contam = dedup.decontaminate(spark, sf_dir).select(
        F.lit("contam").alias("part"),
        "doc_id",
        F.concat(F.col("first_bench").cast("string"), F.lit(":"),
                 F.col("n_bench_hits").cast("string")).alias("ref"),
        F.col("n_hit_grams").alias("n1"),
        F.lit(True).alias("is_duplicate"),
    )
    return exact.unionByName(clus).unionByName(contam)


def dedup_cluster_suite_sql() -> str:
    from jsonld_spark.operators import dedup

    return f"""
SELECT 'exact' AS part, doc_id, text_hash AS ref,
       CAST(group_size AS BIGINT) AS n1, is_duplicate
FROM ({dedup.exact_duplicates_sql()}) e
UNION ALL
SELECT 'cluster', doc_id, CAST(canonical_doc AS VARCHAR),
       CAST(cluster_size AS BIGINT), is_duplicate
FROM ({dedup.lsh_dup_clusters_sql()}) c
UNION ALL
SELECT 'contam', doc_id,
       CAST(first_bench AS VARCHAR) || ':' || CAST(n_bench_hits AS VARCHAR),
       n_hit_grams, TRUE
FROM ({dedup.decontaminate_sql()}) d"""


# --- adjacency counts + lists (2 -> 1) -------------------------------------

def kg_adjacency_suite(
    spark: SparkSession, sf_dir: str, triples: DataFrame
) -> DataFrame:
    """Forward adjacency summary + materialized adjacency lists +
    REVERSE adjacency + characteristic sets + k-core (round 5) as one
    union. Schema: (part, subject, edges, n1, n2) — counts:
    n1=n_predicates, n2=n_values; lists: edges=sorted edge list,
    n1=n_edges; reverse: subject=pointed-at node, n1=n_in_subjects,
    n2=n_in_edges; charsets: edges=sorted predicate set,
    n1=n_subjects, n2=n_triples; kcore: subject=core member,
    n1=in-core degree, n2=k."""
    from jsonld_spark.operators import kg_queries, scratch

    # r6: the three subject-keyed parts (counts, lists, charsets) are
    # ONE aggregation pass over the cached triple table instead of
    # three — exchange reuse never fires above an InMemoryRelation
    # (the round's measured Spark 4.1 fact), so every separate
    # aggregate paid its own ~25-30 core-s full-table pass. One
    # ObjectHashAggregate collects the predicate set and the edge list
    # together (n_predicates = size of the set, no countDistinct — a
    # distinct-aggregate would add an Expand doubling the agg input),
    # and the three arms project from the scratch-cached per-subject
    # table; charsets re-aggregates its ~300k rows, not the corpus.
    # Sweep timing at sf0.1/32c: suite 18.6 s -> see
    # OPTIMIZATION_r06.md. Parts' values are unchanged (n_edges ==
    # count(*) == n_values; countDistinct(predicate) ==
    # size(collect_set) — predicate is never null).
    edge = F.concat_ws(
        "|", "predicate", "obj_kind", "obj_value",
        F.coalesce("obj_type", F.lit("")), F.coalesce("obj_lang", F.lit("")),
    )
    per_subj = scratch.track(
        triples.withColumn("edge", edge)
        .groupBy("subject")
        .agg(
            F.collect_set("predicate").alias("pset"),
            F.count("*").alias("n_values"),
            F.array_join(F.array_sort(F.collect_list("edge")), "\n").alias(
                "edges_joined"
            ),
        )
    )
    counts = per_subj.select(
        F.lit("counts").alias("part"),
        "subject",
        _ns().alias("edges"),
        F.size("pset").cast("long").alias("n1"),
        F.col("n_values").alias("n2"),
    )
    lists = per_subj.select(
        F.lit("lists").alias("part"),
        "subject",
        F.col("edges_joined").alias("edges"),
        F.col("n_values").alias("n1"),
        _nl().alias("n2"),
    )
    rev = kg_queries.reverse_adjacency(spark, sf_dir, triples=triples).select(
        F.lit("reverse").alias("part"),
        F.col("node").alias("subject"),
        _ns().alias("edges"),
        F.col("n_in_subjects").alias("n1"),
        F.col("n_in_edges").alias("n2"),
    )
    charsets = (
        per_subj.select(
            F.array_join(F.array_sort("pset"), "|").alias("charset"), "n_values"
        )
        .groupBy("charset")
        .agg(F.count("*").alias("n_subjects"), F.sum("n_values").alias("n_triples"))
        .select(
            F.lit("charsets").alias("part"),
            _ns().alias("subject"),
            F.col("charset").alias("edges"),
            F.col("n_subjects").alias("n1"),
            F.col("n_triples").alias("n2"),
        )
    )
    from jsonld_spark.operators import graph

    kcore = graph.kcore_nodes(graph.iri_edges(triples)).select(
        F.lit("kcore").alias("part"),
        F.col("node").alias("subject"),
        _ns().alias("edges"),
        F.col("core_deg").alias("n1"),
        F.lit(graph.KCORE_K).cast("long").alias("n2"),
    )
    return (
        counts.unionByName(lists)
        .unionByName(rev)
        .unionByName(charsets)
        .unionByName(kcore)
    )


def kg_adjacency_suite_sql() -> str:
    from jsonld_spark.operators import graph
    from jsonld_spark.sources import oracle as O

    return f"""
SELECT 'counts' AS part, subject, CAST(NULL AS VARCHAR) AS edges,
       n_predicates AS n1, n_values AS n2
FROM ({O.kg_adjacency_sql()}) ac
UNION ALL
SELECT 'lists', subject, edges, n_edges, CAST(NULL AS BIGINT)
FROM ({O.kg_adjacency_lists_sql()}) al
UNION ALL
SELECT 'reverse', node, NULL, n_in_subjects, n_in_edges
FROM ({O.kg_reverse_adjacency_sql()}) ar
UNION ALL
SELECT 'charsets', NULL, charset, n_subjects, n_triples
FROM ({O.kg_characteristic_sets_sql()}) cs
UNION ALL
SELECT 'kcore', node, NULL, core_deg, CAST({graph.KCORE_K} AS BIGINT)
FROM ({O.kg_kcore_sql(k=graph.KCORE_K, rounds=graph.KCORE_ROUNDS)}) kc"""


# --- bounded + unbounded chain closures (2 -> 1) ---------------------------

def path_closures_suite(bounded: DataFrame, unbounded: DataFrame) -> DataFrame:
    """rdf:rest{1,N} (bounded closure) + rdf:rest+ (closure_all
    fixpoint) over the same chain fixture as one union. Schema:
    (part, src, dst)."""
    b = bounded.select(F.lit("bounded").alias("part"), "src", "dst")
    u = unbounded.select(F.lit("all").alias("part"), "src", "dst")
    return b.unionByName(u)


def path_closures_suite_sql(bounded_sql: str, unbounded_sql: str) -> str:
    return f"""
SELECT 'bounded' AS part, src, dst FROM ({bounded_sql}) cb
UNION ALL
SELECT 'all', src, dst FROM ({unbounded_sql}) ca"""


# --- language-tag framing, merged + graph-scoped (2 -> 1) ------------------

def frame_lang_suite(all_graphs: DataFrame, scoped: DataFrame) -> DataFrame:
    """The multi-value language frame over the label fixture, framed
    over the merged dataset AND scoped to one named graph, as one
    union. Schema: (part, subject)."""
    a = all_graphs.select(F.lit("merged").alias("part"), "subject")
    s = scoped.select(F.lit("scoped").alias("part"), "subject")
    return a.unionByName(s)


def frame_lang_suite_sql(all_sql: str, scoped_sql: str) -> str:
    return f"""
SELECT 'merged' AS part, subject FROM ({all_sql}) fa
UNION ALL
SELECT 'scoped', subject FROM ({scoped_sql}) fs"""


# --- brute + IVF top-k (2 -> 1) --------------------------------------------

def sim_topk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k + IVF approximate top-k (embedding
    space) + BM25 keyword top-k (lexical space) as one union — the
    retrieval family. Schema: (part, query_id, rank, neighbor_id) —
    all parts share it natively, so no value column is weakened."""
    from jsonld_spark.operators import search, similarity

    b = similarity.brute_force_topk(spark, sf_dir).select(
        F.lit("brute").alias("part"), "query_id", "rank", "neighbor_id"
    )
    i = similarity.ivf_topk(spark, sf_dir).select(
        F.lit("ivf").alias("part"), "query_id", "rank", "neighbor_id"
    )
    k = search.bm25_topk(spark, sf_dir).select(
        F.lit("bm25").alias("part"), "query_id", "rank",
        F.col("doc_id").alias("neighbor_id"),
    )
    return b.unionByName(i).unionByName(k)


def sim_topk_suite_sql() -> str:
    from jsonld_spark.operators import search, similarity

    return f"""
SELECT 'brute' AS part, query_id, rank, neighbor_id
FROM ({similarity.brute_force_topk_sql()}) sb
UNION ALL
SELECT 'ivf', query_id, rank, neighbor_id
FROM ({similarity.ivf_topk_sql()}) si
UNION ALL
SELECT 'bm25', query_id, rank, doc_id
FROM ({search.bm25_topk_sql()}) sk"""


# --- cardinality + frequency sketches (2 -> 1) ------------------------------

def sketch_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-cardinality estimates (per-source shingles) +
    count-min frequency estimates (probe tokens) as one union — the
    mergeable-sketch family. Schema: (part, key, exact_n, est, m) —
    kmv: key=source, est=kmv_estimate, m=sketch_size; countmin:
    key=probe term, est=cm_estimate, m=NULL."""
    from jsonld_spark.operators import sketch

    kmv = sketch.source_shingle_cardinality(spark, sf_dir).select(
        F.lit("kmv").alias("part"),
        F.col("source").alias("key"),
        F.col("exact_distinct").alias("exact_n"),
        F.col("kmv_estimate").alias("est"),
        F.col("sketch_size").cast("long").alias("m"),
    )
    cm = sketch.corpus_token_count_min(spark, sf_dir).select(
        F.lit("countmin").alias("part"),
        F.col("term").alias("key"),
        F.col("true_count").alias("exact_n"),
        F.col("cm_estimate").cast("double").alias("est"),
        _nl().alias("m"),
    )
    return kmv.unionByName(cm)


def sketch_suite_sql() -> str:
    from jsonld_spark.operators import sketch

    return f"""
SELECT 'kmv' AS part, source AS key, exact_distinct AS exact_n,
       kmv_estimate AS est, CAST(sketch_size AS BIGINT) AS m
FROM ({sketch.source_shingle_cardinality_sql()}) sv
UNION ALL
SELECT 'countmin', term, true_count, CAST(cm_estimate AS DOUBLE), NULL
FROM ({sketch.corpus_token_count_min_sql()}) sc"""


# --- marker + trigram language ID (2 -> 1) ---------------------------------

def text_langid_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-marker language ID (corpus docs) + Cavnar-Trenkle
    trigram language ID (planted multilingual fixture) as one union.
    Schema: (part, doc_id, ref_lang, lang_guess, detail) — detail
    packs each variant's full evidence columns ('|'-joined), so the
    value check keeps its strength."""
    from jsonld_spark.operators import text

    score_cols = [f"score_{lang}" for lang in sorted(text.LANG_MARKERS)]
    marker = text.language_id(spark, sf_dir).select(
        F.lit("marker").alias("part"),
        "doc_id",
        F.col("declared_lang").alias("ref_lang"),
        "lang_guess",
        F.concat_ws("|", *[F.col(c).cast("string") for c in score_cols]
                    ).alias("detail"),
    )
    tri = text.language_id_trigram_planted(spark, sf_dir).select(
        F.lit("trigram").alias("part"),
        "doc_id",
        F.col("true_lang").alias("ref_lang"),
        "lang_guess",
        F.concat_ws(
            "|", F.col("dist").cast("string"), F.col("correct").cast("string")
        ).alias("detail"),
    )
    return marker.unionByName(tri)


def text_langid_suite_sql() -> str:
    from jsonld_spark.operators import text

    score_concat = " || '|' || ".join(
        f"CAST(score_{lang} AS VARCHAR)" for lang in sorted(text.LANG_MARKERS)
    )
    return f"""
SELECT 'marker' AS part, doc_id, declared_lang AS ref_lang, lang_guess,
       {score_concat} AS detail
FROM ({text.language_id_sql()}) lm
UNION ALL
SELECT 'trigram', doc_id, true_lang, lang_guess,
       CAST(dist AS VARCHAR) || '|' || CAST(correct AS VARCHAR)
FROM ({text.language_id_trigram_sql()}) lt"""


# --- per-doc scalar text metrics (2 -> 1, frees a slot for boilerplate) ----

def text_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token_stats + quality_scores + Gopher-style repetition_stats
    joined on doc_id into one wide per-document row (all single-pass
    per-doc metrics over the same table; the two scan projections
    collapse into one stage, the repetition aggregate joins on the
    doc_id key). Round-5 close adds the URL/PII density detector (over
    the planted-payload view) and the self-trained unigram-surprisal
    quality score. Schema: (doc_id, n_tokens, n_distinct_tokens,
    n_subtokens, n_chars, stopword_ratio, chars_per_token,
    alpha_ratio, top2gram_frac, dup3gram_frac, url_count, email_count,
    longnum_count, pii_per_100toks, oov_tokens, surprisal_bits)."""
    from jsonld_spark.operators import text
    from jsonld_spark.plans.session import read_table

    # All PURE-EXPRESSION metrics (token counts, quality ratios, PII
    # density over the planted text) come off ONE scan as one
    # projection — at 100 TB a per-metric join would shuffle the
    # full-corpus per-doc frames once per metric family. Only the two
    # aggregate-shaped metrics (repetition: gram explode + two-level
    # agg; surprisal: token explode + model join + agg) join on doc_id.
    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        *text.token_stat_cols(),
        *text.quality_score_cols(),
        *text.pii_stat_cols(text.planted_pii_text_expr()),
    )
    rep = text.repetition_stats(spark, sf_dir)
    # n_scored == n_tokens by construction (same tokenization) — drop
    surp = text.unigram_surprisal(spark, sf_dir).drop("n_scored")
    return base.join(rep, "doc_id").join(surp, "doc_id")


def text_stats_suite_sql() -> str:
    from jsonld_spark.operators import text

    return f"""
SELECT t.doc_id, t.n_tokens, t.n_distinct_tokens, t.n_subtokens, t.n_chars,
       q.stopword_ratio, q.chars_per_token, q.alpha_ratio,
       r.top2gram_frac, r.dup3gram_frac,
       p.url_count, p.email_count, p.longnum_count, p.pii_per_100toks,
       u.oov_tokens, u.surprisal_bits
FROM ({text.token_stats_sql()}) t
JOIN ({text.quality_scores_sql()}) q USING (doc_id)
JOIN ({text.repetition_stats_sql()}) r USING (doc_id)
JOIN ({text.pii_url_stats_sql()}) p USING (doc_id)
JOIN ({text.unigram_surprisal_sql()}) u USING (doc_id)"""


# --- as-of + binned-range interval joins (new family, round 5) -------------

def rel_interval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """as_of_join (event -> latest profile version) + binned_range_join
    (event -> containing maintenance window) as one union. Schema:
    (part, event_id, user_id, ts, v1, v2) — asof: ts formatted,
    v1=version, v2=profile_value; range: v1=win_id."""
    from jsonld_spark.operators import interval

    a = interval.asof_event_profiles(spark, sf_dir).select(
        F.lit("asof").alias("part"),
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        F.col("version").alias("v1"),
        F.col("profile_value").alias("v2"),
    )
    r = interval.events_in_windows(spark, sf_dir).select(
        F.lit("range").alias("part"),
        "event_id",
        "user_id",
        _ns().alias("ts"),
        F.col("win_id").alias("v1"),
        _nd().alias("v2"),
    )
    return a.unionByName(r)


def rel_interval_suite_sql() -> str:
    from jsonld_spark.operators import interval

    return f"""
SELECT 'asof' AS part, event_id, user_id,
       strftime(ts, '{_TS_FMT_SQL}') AS ts, version AS v1,
       profile_value AS v2
FROM ({interval.asof_event_profiles_sql()}) ia
UNION ALL
SELECT 'range', event_id, user_id, NULL, win_id, NULL
FROM ({interval.events_in_windows_sql()}) ir"""


# --- embedding near-dup + semantic contamination (2 -> 1) -------------------

def sim_neardup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-corpus embedding near-duplicates (planted-twin mode) +
    train-vs-eval semantic contamination as one union — the embedding-
    space corpus-hygiene family. Schema: (part, id_a, id_b, cosine) —
    neardup reports the pair only (its contract is the bucketed
    candidate construction), contam carries the exact cosine."""
    from jsonld_spark.operators import similarity

    nd = similarity.embedding_near_duplicates(
        spark, sf_dir, plant_every=similarity.PLANT_EVERY
    ).select(
        F.lit("neardup").alias("part"),
        F.col("vec_a").alias("id_a"),
        F.col("vec_b").alias("id_b"),
        _nd().alias("cosine"),
    )
    ct = similarity.embedding_contamination(spark, sf_dir).select(
        F.lit("contam").alias("part"),
        F.col("vec_id").alias("id_a"),
        F.col("eval_id").alias("id_b"),
        "cosine",
    )
    return nd.unionByName(ct)


def sim_neardup_suite_sql() -> str:
    from jsonld_spark.operators import similarity

    return f"""
SELECT 'neardup' AS part, vec_a AS id_a, vec_b AS id_b,
       CAST(NULL AS DOUBLE) AS cosine
FROM ({similarity.embedding_near_duplicates_sql(
        plant_every=similarity.PLANT_EVERY)}) nd
UNION ALL
SELECT 'contam', vec_id, eval_id, cosine
FROM ({similarity.embedding_contamination_sql()}) ct"""

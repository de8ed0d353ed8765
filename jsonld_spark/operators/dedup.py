"""Deduplication operators over the ``documents`` table.

Four families, each a first-class pipeline component at 100 TB scale:

* exact       — hash-groupBy on normalized text (one shuffle, AQE-skew safe)
* ngram       — exact n-gram Jaccard via a shingle inverted index
                (guaranteed-complete; the verification standard)
* minhash_lsh — MinHash signatures + banded LSH bucketing for candidate
                generation, then exact Jaccard verification of the
                (tiny) candidate set — the scale path: candidate
                generation touches each (doc, band) once instead of
                all O(n^2) pairs
* simhash     — 60-bit SimHash + pigeonhole block blocking (hamming<=3
                implies >=1 of 4 equal 15-bit blocks), exact hamming
                verify via bit_count(xor)

Every step is integer/hash arithmetic reproducible in ANSI SQL, so each
operator ships with an exact DuckDB oracle (`*_sql`).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonld_spark.plans.session import read_table

SHINGLE_N = 3
JACCARD_THRESHOLD = 0.8
NUM_MINHASH = 64
LSH_BANDS = 16  # 16 bands x 4 rows
SIMHASH_BITS = 60  # 15 hex digits of md5 -> fits a signed 64-bit int
# Manku-style multi-block blocking (WWW'07 "Detecting Near-Duplicates
# for Web Crawling"): split into B blocks; <= d differing bits touch
# <= d blocks, so some (B - d)-subset of blocks is equal — block on all
# C(B, B-d) subsets. With B=6, d=3: 20 keys/doc, each a 30-bit value
# (~10^9 buckets), vs round 1's 4 keys over 15-bit values (32,768
# buckets max — candidates grew ~n^2/2^15 at corpus scale).
SIMHASH_BLOCKS = 6
SIMHASH_MAX_HAMMING = 3


# --- shingling -------------------------------------------------------------

def _tokens_expr():
    return F.split(F.lower(F.col("text")), " ")


def with_shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Add a deduplicated word-n-gram shingle array column.

    Construction (third iteration, each measured): ONE transform over
    the materialized token array with the element index, emitting
    concat_ws(' ', slice(toks, i+1, n)) for in-range positions and
    filtering the trailing nulls. The original per-index element_at
    re-evaluated split() per shingle (8.8 s for 260k 3-shingles); the
    round-2 chained zip_with fix was fine at n=3 but its n-deep nested
    HOF tree re-evaluates inner levels per outer element — at n=13
    (decontamination) the shingle stage alone took 362 s for 27M
    shingles at 128x volume, and a transform-over-sequence + slice
    variant was no better (459 s). This index-transform form measured
    23.8 s for the same 27M shingles (array_distinct and the length
    guard add nothing: 25.4/22.6 s). The token array is materialized
    BELOW the repartition exchange so CollapseProject cannot re-inline
    split(lower(text)) into every slice reference; the repartition
    also spreads the per-row CPU (the docs table is one small parquet
    file, 1-2 scan partitions)."""
    n_parts = 2 * docs.sparkSession.sparkContext.defaultParallelism
    # has_shingles: a CHEAP emptiness flag computed below the exchange.
    # Consumers must filter on THIS, never on size(shingles) — a
    # predicate over the shingles attribute gets substituted with the
    # full construction expression and pushed into the 1-2-partition
    # scan (the simhash round-3 lesson, re-measured here: minhash
    # 1.3 -> 4.6 s when the n=3 construction got heavier). This flag
    # pushes down as size(split(...)) >= n — scan-cheap.
    tokd = (
        docs.withColumn("toks", _tokens_expr())
        .withColumn("has_shingles", F.size(F.col("toks")) >= n)
        .repartition(n_parts)
    )
    toks = F.col("toks")
    in_range = F.filter(
        F.transform(
            toks,
            lambda x, i: F.when(
                i <= F.size(toks) - n,
                F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    shingles = F.when(
        F.size(toks) >= n, F.array_distinct(in_range)
    ).otherwise(F.array().cast("array<string>"))
    return tokd.withColumn("shingles", shingles).drop("toks")


def explode_shingles():
    """explode() over the shingles column with a generator child that
    is NOT a bare attribute (concat of one array is the identity).

    Catalyst's InferFiltersFromGenerate fires only on attribute
    children; on explode(shingles) it infers size(shingles) > 0 AND
    isnotnull(shingles), and predicate pushdown substitutes the
    attribute with its defining expression and pushes the filter
    through the repartition exchange INTO THE SCAN — re-evaluating the
    whole shingle construction on the table's 1-2 file partitions,
    single-threaded, before the parallel stage runs it again (measured
    at 128x volume: the 13-gram stage sat >10 min on one scan task vs
    28.3 s with this wrapper; the rule itself skips non-attribute
    children precisely to avoid duplicating expensive expressions)."""
    return F.explode(F.concat(F.col("shingles")))


def _shingles_sql(n: int = SHINGLE_N) -> str:
    parts = " || ' ' || ".join(f"toks[i+{k}]" for k in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len(toks)-{n},-1)+2), "
        f"i -> {parts}))"
    )


# --- exact dedup -----------------------------------------------------------

def exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact-duplicate grouping by md5 of normalized text."""
    docs = read_table(spark, sf_dir, "documents")
    key = F.md5(F.lower(F.col("text")))
    grouped = (
        docs.select(F.col("doc_id"), key.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("group_size"), F.min("doc_id").alias("canonical_doc"))
    )
    return (
        docs.select("doc_id", key.alias("text_hash"))
        .join(grouped, "text_hash")
        .select(
            "doc_id",
            "text_hash",
            "group_size",
            (F.col("doc_id") != F.col("canonical_doc")).alias("is_duplicate"),
        )
    )


def exact_duplicates_sql() -> str:
    return """
WITH h AS (SELECT doc_id, md5(lower(text)) AS text_hash FROM documents),
g AS (SELECT text_hash, COUNT(*) AS group_size, MIN(doc_id) AS canonical FROM h GROUP BY 1)
SELECT h.doc_id, h.text_hash, g.group_size, h.doc_id <> g.canonical AS is_duplicate
FROM h JOIN g USING (text_hash)"""


# --- exact n-gram jaccard (inverted index) ---------------------------------

def prefix_candidates(docs_with_shingles: DataFrame,
                      threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs via PREFIX FILTERING (Bayardo et
    al., WWW'07; Chaudhuri et al., ICDE'06) — exact, not probabilistic:

    order each document's shingles by ascending global document
    frequency (rarest first, ties by shingle); index only the first
    ``|A| - ceil(t*|A|) + 1`` shingles of each document. Any pair with
    Jaccard >= t must collide inside these prefixes, so the candidate
    set is complete — while ubiquitous shingles (the O(df^2) blowup of
    a raw inverted-index self-join, VERDICT.md round-1 item #4) sort to
    the END of every document and are indexed only by tiny documents.
    """
    sh = docs_with_shingles.select("doc_id", explode_shingles().alias("s"))
    df_counts = sh.groupBy("s").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("s"))
    ranked = (
        sh.join(df_counts, "s")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.where(
        F.col("rn") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    ).select("doc_id", "s")
    return (
        prefix.alias("a")
        .join(prefix.alias("b"),
              (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """All pairs with word-3-gram Jaccard >= threshold — EXACT results
    with prefix-filtered candidate generation (completeness guaranteed
    by the prefix-filter theorem), then exact verification of the
    candidate set by shingle-array intersection. No shingle self-join
    on the full inverted index: a shingle appearing in d documents no
    longer materializes O(d^2) candidate rows."""
    docs = with_shingles(read_table(spark, sf_dir, "documents"))
    # Measured and REJECTED this round (r6): materializing the shingle
    # table through one shared hash exchange (so ReuseExchange computes
    # the construction once for the index + both verification sides)
    # was ~1.8x SLOWER at the bench scale — the fused
    # construction-inside-consumer projections avoid materializing and
    # shuffling the wide shingle arrays, and the redundant branches run
    # on otherwise-idle cores. Recompute-per-branch is the right local
    # trade; see OPTIMIZATION_r06.md (dedup_minhash_lsh A/B).
    cand = prefix_candidates(docs, threshold)
    sets = docs.select("doc_id", "shingles")
    return (
        cand.join(sets.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("shingles", "sa"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("shingles", "sb"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("na", F.size("sa"))
        .withColumn("nb", F.size("sb"))
        .where(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")) >= threshold)
        .select("doc_a", "doc_b", "inter", "na", "nb")
    )


def ngram_jaccard_pairs_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    return f"""
WITH docs AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_shingles_sql()}) AS s FROM docs),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {threshold}"""


# --- minhash + LSH ---------------------------------------------------------

def minhash_signatures(docs_with_shingles: DataFrame, num_hashes: int = NUM_MINHASH) -> DataFrame:
    """doc_id -> array of minhash values. Hash family k is
    xxhash64(k, shingle) — k perturbs the seed deterministically.

    ZERO-shuffle: the signature is an element-wise running minimum
    over the document's own shingle array (F.aggregate + zip_with),
    so no explode and no groupBy — the round-1 version shuffled every
    (doc, shingle) row to 64 min-aggregates. Measured at sf0.1/32c:
    8.1 s -> 0.8 s, bit-identical output. Empty-shingle docs are
    dropped, matching the old groupBy semantics."""
    long_max = (1 << 63) - 1
    init = F.array(*[F.lit(long_max).cast("long") for _ in range(num_hashes)])
    sig = F.aggregate(
        F.col("shingles"),
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(F.lit(k), s) for k in range(num_hashes)]),
            lambda a, b: F.least(a, b),
        ),
    )
    return (
        # filter on the scan-cheap flag, NOT size(shingles) — see
        # with_shingles: a shingles-attribute predicate re-runs the
        # whole construction inside the scan
        docs_with_shingles.where(F.col("has_shingles"))
        .select("doc_id", sig.alias("sig"))
    )


def minhash_band_candidates(sig: DataFrame, num_hashes: int = NUM_MINHASH,
                            bands: int = LSH_BANDS) -> DataFrame:
    """Banded-LSH candidate pairs from a (doc_id, sig) frame: two docs
    collide iff some ALIGNED band (rows [b*r, b*r+r)) of their
    signatures is identical. The miss contract this encodes: agreement
    on r consecutive positions that STRADDLE a band boundary does not
    collide — pinned by test_minhash_band_boundary_miss_contract."""
    rows = num_hashes // bands
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Candidate pairs from banded LSH, verified by exact Jaccard.

    Scale behaviour: one shuffle to build signatures, one groupBy per
    band bucket (map-side combinable), exact verification only on
    bucket-collision pairs. Identical signatures (true duplicates) are
    guaranteed to collide.
    """
    docs = with_shingles(read_table(spark, sf_dir, "documents"))
    # Measured and REJECTED this round (r6): sharing the shingle
    # construction and the 64-hash signature aggregate across all
    # consumers through hash exchanges (ReuseExchange computes each
    # once) was ~1.8x SLOWER end-to-end at the bench scale than this
    # recompute-per-branch shape (interleaved A/B best-of-4: 1.48 s vs
    # 2.74 s at sf0.1/32c) — the exchanges serialize the wide shingle
    # arrays and add blocking boundaries, while the redundant branches
    # run on otherwise-idle cores. See OPTIMIZATION_r06.md.
    sig = minhash_signatures(docs, num_hashes)
    cand = minhash_band_candidates(sig, num_hashes, bands)
    # exact verification of the candidate set via shingle-array overlap
    sets = docs.select("doc_id", "shingles")
    verified = (
        cand.join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sa"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sb"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("uni", F.size(F.array_union("sa", "sb")))
        .where(F.col("inter") / F.col("uni") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "inter", F.col("uni").alias("union_size"))


def minhash_lsh_pairs_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    """Oracle: the complete >=threshold pair set by exact Jaccard.

    LSH candidate generation is probabilistic in general, but with
    64 hashes / 16 bands the per-pair miss probability at j>=0.8 is
    ~2e-4 (and exactly 0 for identical texts); on the test corpus the
    banded candidates are empirically complete, making the verified
    output equal the exact pair set. A production run would quote
    recall instead of equality.
    """
    return f"""
WITH docs AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_shingles_sql()}) AS s FROM docs),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, inter, sa.n + sb.n - inter AS union_size
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {threshold}"""


# --- near-dup clustering (pairs -> components -> canonical doc) ------------

def lsh_dup_clusters(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end near-duplicate CLUSTERING: verified LSH pairs ->
    connected components -> one canonical doc per cluster — the
    "which docs survive dedup" decision production pipelines actually
    execute after pair generation (a doc chain a~b, b~c must drop two
    docs even though (a, c) was never a candidate pair).

    Returns (doc_id, canonical_doc, cluster_size, is_duplicate) for
    every doc in >=1 verified near-dup pair; docs outside any pair are
    implicitly canonical singletons and are not materialized (at 100 TB
    the pair graph is sublinear in the corpus — only near-dup members
    appear — so the component state stays small relative to the input).
    Pointer-jumping components give O(log D) rounds on chain-shaped dup
    families. ``pairs``: inject a prebuilt (doc_a, doc_b) pair set
    (tests / callers that already ran pair generation).
    """
    from jsonld_spark.operators.components import connected_components

    if pairs is None:
        pairs = minhash_lsh_pairs(spark, sf_dir, threshold)
    # the pair set feeds the component edges AND both endpoint-node
    # projections, and connected_components materializes its inputs as
    # two SEPARATE eager localCheckpoints — exchange reuse alone cannot
    # span executions, so the tiny pair set is scratch-cached (safe
    # here: the checkpoint actions are sequential, and within each the
    # repartition exchange dedups the union arms). Interleaved A/B
    # best-of-3 at sf0.1/32c: plain 4.51 s, exchange-only 4.33 s,
    # THIS 3.64 s. Caller releases via scratch (guide §2.4/§5).
    from jsonld_spark.operators import scratch

    p = scratch.track(pairs.select("doc_a", "doc_b").repartition("doc_a"))
    edges = p.select(
        F.lit(0).alias("key"), F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    nodes = (
        p.select(F.col("doc_a").alias("node"))
        .unionAll(p.select(F.col("doc_b").alias("node")))
        .distinct()
        .select(F.lit(0).alias("key"), "node")
    )
    labels = connected_components(nodes, edges)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("canonical_doc"),
        "cluster_size",
        (F.col("node") != F.col("label")).alias("is_duplicate"),
    )


def lsh_dup_clusters_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    """Oracle: exact transitive closure (recursive CTE, UNION-deduped)
    over the exact >=threshold Jaccard pair set; canonical = MIN doc of
    the reachable set — algorithmically independent of the Spark side's
    pointer jumping."""
    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_pairs_sql(threshold)}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS n FROM e),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a),
lab AS (SELECT n AS doc_id, MIN(m) AS canonical FROM reach GROUP BY n),
sz AS (SELECT canonical, COUNT(*) AS cluster_size FROM lab GROUP BY 1)
SELECT doc_id, canonical AS canonical_doc, cluster_size,
       doc_id <> canonical AS is_duplicate
FROM lab JOIN sz USING (canonical)"""


# --- simhash ---------------------------------------------------------------

def simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> 60-bit SimHash as a bigint.

    ZERO-shuffle: per-bit +-1 contributions are summed with an
    element-wise F.aggregate over the document's own token array — no
    explode, no 60-column groupBy (the round-1 shape). The md5 is
    hoisted into its own transform() so it evaluates ONCE per token
    (no CSE inside higher-order-function lambdas — the measured
    round-1 landmine). Bit-identical output, 35.8 s -> 7.1 s at
    sf0.1/32c; the explicit repartition keeps the CPU off the 1-2
    scan partitions of a small parquet file."""
    docs = read_table(spark, sf_dir, "documents")
    n_parts = 2 * spark.sparkContext.defaultParallelism
    hexes = F.transform(_tokens_expr(), lambda t: F.md5(t))

    def bit_contrib(hex_elem, j: int):
        digit = j // 4
        shift = 3 - (j % 4)
        v = F.instr(F.lit("0123456789abcdef"), F.substring(hex_elem, digit + 1, 1)) - 1
        return ((v / (2 ** shift)).cast("long") % 2) * 2 - 1

    zero = F.array(*[F.lit(0).cast("long") for _ in range(SIMHASH_BITS)])
    sums = F.aggregate(
        hexes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[bit_contrib(h, j) for j in range(SIMHASH_BITS)]),
            lambda a, b: a + b,
        ),
    )
    weights = F.array(*[F.lit(2**j).cast("long") for j in range(SIMHASH_BITS)])
    value = F.aggregate(
        F.zip_with(sums, weights,
                   lambda s, w: F.when(s > 0, w).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    # zero-token docs (null text -> null token array) never form a
    # group in the explode/groupBy shape this replaced — and in the
    # unchanged DuckDB oracle — so drop them here too (ADVICE r2;
    # mirrors the minhash empty-shingles guard). The guard is on the
    # raw column so it pushes to the parquet scan; filtering on the
    # computed simhash instead gets pushed BELOW the projection and
    # re-evaluates the whole 60-bit aggregate twice (measured 2x).
    return (
        docs.where(F.col("text").isNotNull())
        .repartition(n_parts)
        .select("doc_id", value.alias("simhash"))
    )


def simhash_values_sql() -> str:
    contribs = []
    for j in range(SIMHASH_BITS):
        digit = j // 4
        shift = 3 - (j % 4)
        v = f"(strpos('0123456789abcdef', substring(md5(tok), {digit + 1}, 1)) - 1)"
        contribs.append(f"SUM((CAST(floor({v} / {2 ** shift}) AS BIGINT) % 2) * 2 - 1) AS s{j}")
    bits = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
sums AS (SELECT doc_id, {", ".join(contribs)} FROM toks GROUP BY doc_id)
SELECT doc_id, {bits} AS simhash FROM sums"""


def simhash_block_combos(blocks: int = SIMHASH_BLOCKS,
                         max_hamming: int = SIMHASH_MAX_HAMMING) -> list[tuple[int, ...]]:
    """All (blocks - max_hamming)-subsets of block indexes — the
    pigeonhole-complete blocking keys (Manku et al.)."""
    return list(itertools.combinations(range(blocks), blocks - max_hamming))


def simhash_near_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING,
    sims: DataFrame | None = None,
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming: Manku multi-block
    blocking (complete by pigeonhole: <= d differing bits leave some
    B-d blocks untouched), exact bit_count(xor) verification. Key
    space is 2^((B-d)*block_bits) per combo — bucket count scales with
    the corpus instead of capping at 2^15.

    ``sims``: an optional precomputed (doc_id, simhash) frame (e.g. a
    cached ``simhash_values`` a caller also consumes directly) — the
    60-bit aggregate is the expensive stage, so sharing it halves a
    values+pairs pipeline."""
    if sims is None:
        sims = simhash_values(spark, sf_dir)
    block_bits = SIMHASH_BITS // SIMHASH_BLOCKS

    def block(b: int):
        return F.shiftright(F.col("simhash"), block_bits * b).bitwiseAND(
            F.lit(2**block_bits - 1)
        )

    combo_keys = [
        sum(
            (block(b) * F.lit(2 ** (block_bits * i)) for i, b in enumerate(combo)),
            start=F.lit(0).cast("long"),
        )
        for combo in simhash_block_combos(SIMHASH_BLOCKS, max_hamming)
    ]
    blocked = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*combo_keys)).alias("block", "blockval"),
    )
    # pairs are generated WITHIN each bucket from one collect_list —
    # a single shuffle, simhash computed once (a blocked self-join
    # recomputed the zero-shuffle simhash projection on both sides);
    # bucket membership is bounded by the Manku key space, so the
    # collected arrays stay small at scale
    members = (
        blocked.groupBy("block", "blockval")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("m"))
        .where(F.size("m") > 1)
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("m"),
            lambda x, i: F.transform(
                F.slice(F.col("m"), i + 2, F.size(F.col("m"))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias("hamming"),
                ),
            ),
        )
    )
    return (
        members.select(F.explode(pair_expr).alias("p"))
        .select("p.*")
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_near_pairs_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    # oracle verifies via brute-force O(n^2) hamming — completeness check
    return f"""
WITH sims AS ({simhash_values_sql()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


# --- benchmark decontamination ----------------------------------------------

DECONTAM_N = 13          # gram length (the GPT-3/PaLM 13-gram convention)
DECONTAM_MOD = 40        # docs with doc_id % MOD == OFFSET seed the eval set
DECONTAM_OFFSET = 7
DECONTAM_SKIP = 3        # benchmark snippet starts at token SKIP+1
DECONTAM_SNIPPET = 20    # snippet length in tokens (shingles into 8 grams)


def benchmark_snippets(docs: DataFrame, mod: int = DECONTAM_MOD,
                       offset: int = DECONTAM_OFFSET) -> DataFrame:
    """Deterministic stand-in for an eval/benchmark set: a mid-document
    20-token snippet from every ``mod``-th document. Real pipelines load
    the eval suites here; the fixture makes contamination *planted and
    provable* — each seed document is contaminated by its own snippet,
    as is any near-duplicate sharing that span.

    Output: (bench_id, text) — text is the lowercased snippet."""
    toks = _tokens_expr()
    need = DECONTAM_SKIP + DECONTAM_SNIPPET
    return docs.where(
        (F.col("doc_id") % mod == offset) & (F.size(toks) >= need)
    ).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(toks, DECONTAM_SKIP + 1, DECONTAM_SNIPPET)).alias("text"),
    )


def decontaminate(spark: SparkSession, sf_dir: str,
                  n: int = DECONTAM_N) -> DataFrame:
    """Training-set decontamination: flag every document sharing at
    least one word-``n``-gram with a benchmark/eval item (the GPT-3 /
    PaLM decontamination rule; Brown et al. 2020 §C).

    Scale shape: the benchmark side is small by nature (eval suites are
    ~10^4-10^6 grams) so it is BROADCAST; the training side explodes
    into n-grams map-side and the broadcast hash join filters them
    before anything shuffles. The only shuffle is the final per-doc
    aggregate over the (rare) contaminated rows — at 100 TB the join
    output is tiny even though its input is every training gram.

    Output: (doc_id, n_hit_grams, n_bench_hits, first_bench) — one row
    per CONTAMINATED document."""
    docs = read_table(spark, sf_dir, "documents")
    bench_grams = (
        with_shingles(benchmark_snippets(docs), n)
        .select("bench_id", explode_shingles().alias("gram"))
    )
    train_grams = (
        with_shingles(docs, n)
        .select("doc_id", explode_shingles().alias("gram"))
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_hit_grams"),
            F.countDistinct("bench_id").alias("n_bench_hits"),
            F.min("bench_id").alias("first_bench"),
        )
    )


def decontaminate_sql(n: int = DECONTAM_N) -> str:
    need = DECONTAM_SKIP + DECONTAM_SNIPPET
    return f"""
WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
bsnip AS (
  SELECT doc_id AS bench_id,
         list_slice(toks, {DECONTAM_SKIP + 1}, {DECONTAM_SKIP + DECONTAM_SNIPPET}) AS toks
  FROM tok
  WHERE doc_id % {DECONTAM_MOD} = {DECONTAM_OFFSET} AND len(toks) >= {need}),
bg AS (SELECT bench_id, unnest({_shingles_sql(n)}) AS gram FROM bsnip),
tg AS (SELECT doc_id, unnest({_shingles_sql(n)}) AS gram FROM tok)
SELECT doc_id, COUNT(DISTINCT gram) AS n_hit_grams,
       COUNT(DISTINCT bench_id) AS n_bench_hits,
       MIN(bench_id) AS first_bench
FROM tg JOIN bg USING (gram)
GROUP BY doc_id"""

"""Text analysis operators over the ``documents`` table: token stats,
quality scoring, language ID, and document fingerprinting — all pure
column expressions with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonld_spark.plans.session import read_table

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}
STOPWORDS = sorted({w for words in LANG_MARKERS.values() for w in words})
FINGERPRINT_N = 5


def _toks():
    return F.split(F.lower(F.col("text")), " ")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting: whitespace tokens, distinct tokens,
    a BPE-ish sub-token estimate (runs of letters/digits), char count."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _toks()
    subtoks = F.regexp_extract_all("text", F.lit(r"([A-Za-z]+|[0-9]+)"), 1)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(subtoks).alias("n_subtokens"),
        F.length("text").alias("n_chars"),
    )


def token_stats_sql() -> str:
    return r"""
SELECT doc_id,
       len(string_split(lower(text), ' ')) AS n_tokens,
       len(list_distinct(string_split(lower(text), ' '))) AS n_distinct_tokens,
       len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+)', 1)) AS n_subtokens,
       length(text) AS n_chars
FROM documents"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: stopword ratio, mean token length,
    alpha ratio. Ratios are int/int divisions — engine-exact."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _toks()
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (n_stop / F.size(toks)).alias("stopword_ratio"),
        (F.length("text") / F.size(toks)).alias("chars_per_token"),
        (n_alpha / F.length("text")).alias("alpha_ratio"),
    )


def quality_scores_sql() -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH d AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_filter(toks, t -> list_contains([{stop_list}], t))) * 1.0 / len(toks)
         AS stopword_ratio,
       length(text) * 1.0 / len(toks) AS chars_per_token,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text)
         AS alpha_ratio
FROM d"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language guess: count marker hits per language,
    argmax with lexicographic tie-break ('und' = undetermined when no
    marker hits at all)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _toks()
    def marker_count(lang):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    scores = [marker_count(lang).alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)]
    scored = docs.select("doc_id", F.col("lang").alias("declared_lang"), *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    guess = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        guess = guess.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id",
        "declared_lang",
        *[f"score_{lang}" for lang in sorted(LANG_MARKERS)],
        guess.alias("lang_guess"),
    )


def language_id_sql() -> str:
    score_cols, case_parts = [], []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(toks, t -> list_contains([{markers}], t))) AS score_{lang}"
        )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in sorted(LANG_MARKERS)) + ")"
    for lang in sorted(LANG_MARKERS):
        case_parts.append(f"WHEN score_{lang} = {best} THEN '{lang}'")
    return f"""
WITH d AS (SELECT doc_id, lang AS declared_lang, string_split(lower(text), ' ') AS toks
           FROM documents),
s AS (SELECT doc_id, declared_lang, {", ".join(score_cols)} FROM d)
SELECT doc_id, declared_lang, {", ".join(f"score_{lang}" for lang in sorted(LANG_MARKERS))},
       CASE WHEN {best} = 0 THEN 'und' {' '.join(case_parts)} END AS lang_guess
FROM s"""


def fingerprints(spark: SparkSession, sf_dir: str, n: int = FINGERPRINT_N) -> DataFrame:
    """Document fingerprint: min/max md5 over word-n-shingles (a
    winnowing-style rolling fingerprint) + shingle count."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _toks()
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.md5(
                F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id",
        F.array_min(shingles).alias("fp_min"),
        F.array_max(shingles).alias("fp_max"),
        F.size(shingles).alias("n_shingles"),
    )


def fingerprints_sql(n: int = FINGERPRINT_N) -> str:
    parts = " || ' ' || ".join(f"toks[i+{k}]" for k in range(n))
    return f"""
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
sh AS (SELECT doc_id,
              list_transform(range(1, greatest(len(toks)-{n},-1)+2),
                             i -> md5({parts})) AS fps
       FROM d)
SELECT doc_id, list_min(fps) AS fp_min, list_max(fps) AS fp_max, len(fps) AS n_shingles
FROM sh"""

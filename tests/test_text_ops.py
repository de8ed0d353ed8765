"""Text-operator semantics: v2 language-ID marker coverage and the
winnowing fingerprint guarantee (VERDICT r2 flagged both as crude v1;
the oracles pin Spark/DuckDB parity, these pin the SEMANTICS)."""

from __future__ import annotations

import itertools

from jsonld_spark.operators import text as T

SAMPLES = {
    "en": "the cat sat on the mat and it was happy with this",
    "de": "der hund ist nicht auf der straße und das ist auch gut",
    "fr": "le chien est dans la maison et il ne sont pas pour nous",
    "es": "el perro es un animal que no se puede ver por la noche",
    "it": "il cane è un animale che non si vede per la strada anche",
    "pt": "o cachorro é um animal que não se pode ver do lado da rua",
    "nl": "de hond is niet van het huis maar ook een beetje voor dan",
    "sv": "hunden är inte från huset men det som en katt har och att",
}


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string, lang string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_language_id_recognizes_all_eight_languages(spark, tmp_path):
    rows = [(i, txt, lang) for i, (lang, txt) in enumerate(sorted(SAMPLES.items()))]
    rows.append((99, "zqx bbb ccc", "und"))  # no markers at all
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r["lang_guess"]
           for r in T.language_id(spark, sf_dir).collect()}
    for i, (lang, _) in enumerate(sorted(SAMPLES.items())):
        assert got[i] == lang, (lang, got[i])
    assert got[99] == "und"


def test_language_id_tokens_are_punctuation_robust(spark, tmp_path):
    # "the," and "the." must count as marker hits (letter-run tokens)
    sf_dir = _write_docs(spark, tmp_path,
                         [(0, "the, cat. the! mat? the; end", "en")])
    row = T.language_id(spark, sf_dir).collect()[0]
    assert row["score_en"] == 3
    assert row["lang_guess"] == "en"


def test_winnowing_guarantee_shared_run_shares_a_fingerprint(spark, tmp_path):
    """Schleimer et al. guarantee: two documents sharing a run of at
    least window + n - 1 tokens share at least one fingerprint."""
    n, w = T.FINGERPRINT_N, T.WINNOW_WINDOW
    shared = " ".join(f"s{k}" for k in range(w + n - 1))  # minimal shared run
    doc_a = "aaa bbb ccc " + shared + " ddd eee"
    doc_b = "xxx yyy " + shared + " zzz www qqq"
    sf_dir = _write_docs(spark, tmp_path, [(0, doc_a, "en"), (1, doc_b, "en")])

    # recover the full winnowed sets by recomputing fingerprints with a
    # digest per doc AND checking overlap via the reference formula in
    # pure python (same md5 shingling)
    import hashlib

    def winnow(textv):
        toks = textv.lower().split(" ")
        hashes = [hashlib.md5(" ".join(toks[i:i + n]).encode()).hexdigest()
                  for i in range(len(toks) - n + 1)]
        if len(hashes) >= w:
            mins = [min(hashes[j:j + w]) for j in range(len(hashes) - w + 1)]
        else:
            mins = [min(hashes)] if hashes else []
        return sorted(set(mins))

    fa, fb = winnow(doc_a), winnow(doc_b)
    assert set(fa) & set(fb), "reference winnow must overlap by construction"

    got = {r["doc_id"]: r for r in T.fingerprints(spark, sf_dir).collect()}
    for doc_id, ref in ((0, fa), (1, fb)):
        row = got[doc_id]
        assert row["n_fingerprints"] == len(ref)
        assert row["fp_min"] == ref[0] and row["fp_max"] == ref[-1]
        digest = hashlib.md5(",".join(ref).encode()).hexdigest()
        assert row["fp_digest"] == digest


def test_fingerprints_short_and_null_docs(spark, tmp_path):
    """Docs with < n tokens (no shingles) or null text must yield NULL
    fp columns, not an ANSI element_at crash — the oracle's fp[1]
    returns NULL on empty lists."""
    sf_dir = _write_docs(spark, tmp_path,
                         [(0, "too few tokens", "en"), (1, None, "en"),
                          (2, "one two three four five six", "en")])
    got = {r["doc_id"]: r for r in T.fingerprints(spark, sf_dir).collect()}
    for short_id in (0, 1):
        row = got[short_id]
        assert row["n_fingerprints"] == 0
        assert row["fp_min"] is None and row["fp_max"] is None
        assert row["fp_digest"] is None
    assert got[2]["n_fingerprints"] > 0


def test_winnowing_density(spark, tmp_path):
    """Winnowing stores ~2/(w+1) of the hashes — far fewer fingerprints
    than shingles on a long distinct-token document."""
    toks = " ".join(f"t{i * 7919 % 104729}" for i in range(400))
    sf_dir = _write_docs(spark, tmp_path, [(0, toks, "en")])
    row = T.fingerprints(spark, sf_dir).collect()[0]
    assert row["n_shingles"] == 400 - T.FINGERPRINT_N + 1
    assert row["n_fingerprints"] < row["n_shingles"] * 0.6

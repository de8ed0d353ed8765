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


# --- v3 trigram language ID (Cavnar-Trenkle shape, 20 languages) ------

# natural sentences NOT drawn verbatim from the profile word lists —
# the honest accuracy check (the planted driver fixture builds its
# sentences from the same lists the profiles derive from, so its
# accuracy is near-1.0 by construction; these are out-of-sample)
NATURAL = {
    # ~25-35 words each: C-T profiles operate on ~300-char samples
    # (SDAIR'94 uses article-length inputs); ten-word snippets are
    # below the method's design regime and are not claimed
    "en": "yesterday the children walked to the old school near the river and "
          "they saw that the water was very high because it had rained for "
          "three days and nobody could cross the small wooden bridge",
    "de": "gestern gingen die kinder durch den alten wald zur kleinen schule "
          "und sie sahen dass das wasser sehr hoch war weil es drei tage lang "
          "geregnet hatte und niemand die kleine brücke überqueren konnte",
    "fr": "hier les enfants marchaient vers la vieille école près de la "
          "rivière et ils ont vu que l'eau était très haute parce qu'il avait "
          "plu pendant trois jours et personne ne pouvait traverser le pont",
    "es": "ayer los niños caminaron hacia la vieja escuela cerca del río y "
          "vieron que el agua estaba muy alta porque había llovido durante "
          "tres días y nadie podía cruzar el pequeño puente de madera",
    "it": "ieri i bambini camminavano verso la vecchia scuola vicino al fiume "
          "e hanno visto che l'acqua era molto alta perché aveva piovuto per "
          "tre giorni e nessuno poteva attraversare il piccolo ponte",
    "pt": "ontem as crianças caminharam para a velha escola perto do rio e "
          "viram que a água estava muito alta porque tinha chovido durante "
          "três dias e ninguém podia atravessar a pequena ponte de madeira",
    "nl": "gisteren liepen de kinderen naar de oude school bij de rivier en "
          "ze zagen dat het water erg hoog stond omdat het drie dagen had "
          "geregend en niemand de kleine houten brug kon oversteken",
    "sv": "igår gick barnen till den gamla skolan vid den lilla floden och de "
          "såg att vattnet stod mycket högt eftersom det hade regnat i tre "
          "dagar och ingen kunde gå över den lilla träbron",
    "fi": "eilen lapset kävelivät vanhaan kouluun joen varrella ja he näkivät "
          "että vesi oli hyvin korkealla koska oli satanut kolme päivää eikä "
          "kukaan voinut ylittää pientä puista siltaa aamulla",
    "pl": "wczoraj dzieci szły do starej szkoły nad małą rzeką przez las i "
          "zobaczyły że woda jest bardzo wysoka ponieważ padało przez trzy "
          "dni i nikt nie mógł przejść przez mały drewniany most",
    "cs": "včera děti šly do staré školy u malé řeky přes tmavý les a viděly "
          "že voda je velmi vysoko protože tři dny pršelo a nikdo nemohl "
          "přejít přes malý dřevěný most u mlýna",
    "tr": "dün çocuklar nehrin yanındaki okula doğru yürüdüler ve suyun çok "
          "yüksek olduğunu gördüler çünkü üç gün boyunca yağmur yağmıştı ve "
          "kimse küçük ahşap köprüden geçemiyordu bu yüzden eve döndüler",
    "id": "kemarin anak anak berjalan ke sekolah tua di dekat sungai dan "
          "mereka melihat bahwa airnya sangat tinggi karena hujan turun "
          "selama tiga hari dan tidak ada yang bisa menyeberangi jembatan",
    "hu": "tegnap a gyerekek a régi iskolába mentek a kis folyó mellett és "
          "látták hogy a víz nagyon magas mert három napig esett az eső és "
          "senki sem tudott átmenni a kis fahídon",
    "ro": "ieri copiii au mers la școala veche de lângă râul cel mic și au "
          "văzut că apa era foarte mare pentru că plouase trei zile și "
          "nimeni nu putea trece peste podul mic de lemn",
}


def _trigram_guesses(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r["lang_guess"]
            for r in T.language_id_trigram(df).collect()}


def test_trigram_langid_on_natural_sentences(spark):
    """Out-of-sample accuracy on hand-written natural sentences: the
    C-T profiles must identify clearly most of the 15 languages (some
    closely-related pairs — es/pt, cs/sk, da/no — legitimately
    confuse at 10 words; require >= 80% and en/de/fr exact)."""
    items = sorted(NATURAL.items())
    rows = [(i, txt) for i, (_, txt) in enumerate(items)]
    got = _trigram_guesses(spark, rows)
    hits = sum(1 for i, (lang, _) in enumerate(items) if got[i] == lang)
    acc = hits / len(items)
    assert acc >= 0.8, (acc, {items[i][0]: got[i] for i in range(len(items))})
    for i, (lang, _) in enumerate(items):
        if lang in ("en", "de", "fr"):
            assert got[i] == lang, (lang, got[i])


def test_trigram_langid_und_and_null(spark):
    got = _trigram_guesses(
        spark, [(1, "zzzz qqqq xxxx"), (2, ""), (3, None)]
    )
    # no trigram of these ever appears in any profile -> 'und'
    # (doc 1 exercises the matched-empty left-join path on real text)
    assert got[1] == "und" and got[2] == "und" and got[3] == "und"


def test_trigram_extraction_matches_python_reference(spark):
    """The padded-token trigram multiset (the operator's step 1-2)
    equals the Python reference used to build profiles."""
    import re
    from collections import Counter

    text = "héllo wörld çava the on a"
    toks = re.findall(r"[^\W\d_]+", text.lower(), re.UNICODE)
    want = Counter(
        tg for t in toks for tg in T._word_trigrams(t)
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from pyspark.sql import functions as F

    # the OPERATOR's own expression (shared helper), not a copy — so
    # expression drift in text.py cannot escape this parity check
    got = Counter(
        df.select(F.explode(T.doc_trigrams_expr()).alias("tg")).toPandas()["tg"]
    )
    assert got == want


def test_trigram_profiles_deterministic_and_sized():
    p1, p2 = T.trigram_profiles(), T.trigram_profiles()
    assert p1 == p2
    assert set(p1) == set(T.TRIGRAM_LANGS) and len(p1) == 20
    for lang, prof in p1.items():
        assert 1 <= len(prof) <= T.PROFILE_SIZE
        assert sorted(prof.values()) == list(range(1, len(prof) + 1)), lang


def test_planted_fixture_accuracy_is_perfect(spark):
    """The planted driver fixture (in-sample by design) must classify
    perfectly — it exists to give the oracle a ground-truth column,
    and any slip means the operator or fixture drifted."""
    got = T.language_id_trigram_planted(spark, "/root/testdata/sf0.001")
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["correct"] == 1 for r in rows)


# --- corpus-frequency boilerplate removal ----------------------------------

def _turns_df(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, role string, text string")


def test_boilerplate_planted_banner_detected(spark):
    # banner in 9 of 10 convs; every other text unique to one conv
    rows = []
    for c in range(10):
        if c != 7:
            rows.append((f"conv-{c}", "tool", "BANNER: tool ready"))
        rows.append((f"conv-{c}", "user", f"unique question {c}"))
    turns = _turns_df(spark, rows)
    boiler = T.boilerplate_frequency(turns, frac=0.75)
    got = boiler.collect()
    assert len(got) == 1
    assert got[0]["text"] == "BANNER: tool ready"
    assert got[0]["n_convs"] == 9 and got[0]["n_turns"] == 9
    assert got[0]["total_convs"] == 10

    kept = T.remove_boilerplate(turns, boiler)
    kept_texts = [r["text"] for r in kept.collect()]
    assert len(kept_texts) == 10
    assert all(t.startswith("unique question") for t in kept_texts)


def test_boilerplate_threshold_is_inclusive_fraction(spark):
    # text in exactly 3 of 4 convs == 0.75 -> boilerplate at frac=0.75,
    # not at frac=0.76 (the >= comparison is on frac * total)
    rows = [(f"conv-{c}", "system", "canned") for c in range(3)]
    rows += [(f"conv-{c}", "user", f"u{c}") for c in range(4)]
    turns = _turns_df(spark, rows)
    assert T.boilerplate_frequency(turns, frac=0.75).count() == 1
    assert T.boilerplate_frequency(turns, frac=0.76).count() == 0


def test_boilerplate_suite_on_sf0001(spark):
    suite = T.boilerplate_suite(spark, "/root/testdata/sf0.001").collect()
    parts = {}
    for r in suite:
        parts.setdefault(r["part"], []).append(r)
    # 15 convs at sf0.001 -> threshold 11.25 -> texts in >= 12 convs
    assert len(parts["boiler"]) == 17
    assert all(r["n_convs"] >= 12 for r in parts["boiler"])
    kept = sum(r["n_turns"] for r in parts["kept_role"])
    dropped = sum(r["n_turns"] for r in parts["drop_role"])
    assert kept + dropped == 1000
    assert dropped == sum(r["n_turns"] for r in parts["boiler"])
    from jsonld_spark.operators import scratch
    scratch.release()


# --- Gopher-style repetition metrics ---------------------------------------

def test_repetition_stats_planted_values(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, [
        # bigrams: "a b" x3, "b a" x2 -> top2 = 3/5
        # trigrams: "a b a" x2, "b a b" x2 -> dup3 = (4-2)/4
        (0, "a b a b a b", "en"),
        (1, "all words unique here today", "en"),  # top2 1/4, dup3 0
        (2, "xy", "en"),          # 1 token: no bigrams -> NULLs
        (3, "xy zz", "en"),       # 2 tokens: bigram but no trigram
    ])
    got = {r["doc_id"]: r for r in T.repetition_stats(spark, sf_dir).collect()}
    assert abs(got[0]["top2gram_frac"] - 0.6) < 1e-12
    assert abs(got[0]["dup3gram_frac"] - 0.5) < 1e-12
    assert abs(got[1]["top2gram_frac"] - 0.25) < 1e-12
    assert got[1]["dup3gram_frac"] == 0.0
    assert got[2]["top2gram_frac"] is None and got[2]["dup3gram_frac"] is None
    assert got[3]["top2gram_frac"] == 1.0 and got[3]["dup3gram_frac"] is None


def test_pii_url_planted_counts(spark, tmp_path):
    """The planted payload contributes exactly one URL, one email and
    one long digit run to every PII_MOD-th doc; unplanted docs stay at
    zero (the raw corpus has none by construction)."""
    rows = [(i, f"plain text number {i}", "en") for i in range(10)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in T.pii_url_stats(spark, sf_dir).collect()}
    for i in range(10):
        planted = i % T.PII_MOD == T.PII_OFFSET
        r = got[i]
        assert (r["url_count"], r["email_count"], r["longnum_count"]) == (
            (1, 1, 1) if planted else (0, 0, 0)
        ), (i, r)
        if planted:
            assert r["pii_per_100toks"] > 0
        else:
            assert r["pii_per_100toks"] == 0.0


def test_pii_regexes_count_multiple_hits(spark, tmp_path):
    rows = [(0, "see https://a.example.org/x and https://b.io or "
                "mail a.b@c.de and x_y@z.co ref 1234567 id 987654321", "en")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    r = T.pii_url_stats(spark, sf_dir).collect()[0]
    assert (r["url_count"], r["email_count"], r["longnum_count"]) == (2, 2, 2)


def test_unigram_surprisal_python_reference(spark, tmp_path):
    """Whole-bit unigram surprisal matches an exact Python recompute:
    bucket(token) = floor(log2(total // count)); rare tokens score
    high, the uniform-frequency doc scores the corpus entropy floor."""
    rows = [
        (0, "the the the the", "en"),
        (1, "the the rare words", "en"),
        (2, "zz yy xx ww", "en"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    toks = [t for _, txt, _ in rows for t in txt.split(" ")]
    total = len(toks)
    from collections import Counter
    cnt = Counter(toks)
    bucket = {t: (total // c).bit_length() - 1 for t, c in cnt.items()}
    want = {}
    for did, txt, _ in rows:
        ts = txt.split(" ")
        want[did] = sum(bucket[t] for t in ts) / len(ts)
    got = {r["doc_id"]: r for r in T.unigram_surprisal(spark, sf_dir).collect()}
    assert {d: r["surprisal_bits"] for d, r in got.items()} == want
    assert all(r["oov_tokens"] == 0 for r in got.values())
    # "the" (6 of 12 tokens) is the most predictable: bucket 1
    assert got[0]["surprisal_bits"] < got[2]["surprisal_bits"]


def test_unigram_surprisal_oov_gets_pessimal_bucket(spark, tmp_path):
    """With the vocab capped at 1 (ties broken by count desc, token
    asc), every out-of-vocabulary token scores floor(log2(total))+1 —
    strictly worse than any in-vocabulary bucket."""
    rows = [(0, "a a a b", "en"), (1, "b c d e", "en")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in
           T.unigram_surprisal(spark, sf_dir, vocab=1).collect()}
    total = 8
    oov = total.bit_length()  # 4
    in_bucket = (total // 3).bit_length() - 1  # 'a' count 3 -> bucket 1
    assert got[0]["oov_tokens"] == 1
    assert got[0]["surprisal_bits"] == (3 * in_bucket + oov) / 4
    assert got[1]["oov_tokens"] == 4
    assert got[1]["surprisal_bits"] == float(oov)

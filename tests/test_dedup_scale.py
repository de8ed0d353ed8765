"""Scale-safety tests for the dedup operators (VERDICT.md round-1
item #4): prefix-filtered n-gram Jaccard stays exact while bounding
candidates under shingle skew; Manku multi-block simhash blocking is
pigeonhole-complete and exact."""

from __future__ import annotations

import itertools

import pytest

from jsonld_spark.operators import dedup


def _write_documents(spark, tmp_path, texts):
    sf_dir = str(tmp_path)
    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _brute_jaccard_pairs(texts, n=3, threshold=0.8):
    def shingles(t):
        toks = t.lower().split(" ")
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)} \
            if len(toks) >= n else set()

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= threshold:
            out.add((a, b))
    return out


@pytest.fixture()
def skewed_corpus():
    """One shingle ('hot hot hot') in 50% of documents — the adversarial
    case where a raw inverted-index self-join materializes O(d^2)
    candidates — plus genuine near-duplicate pairs that must survive."""
    texts = []
    for i in range(120):
        head = "hot hot hot " if i % 2 == 0 else ""
        texts.append(f"{head}u{i} v{i} w{i} x{i}")
    # exact duplicate pair
    texts.append("same same same same same same")
    texts.append("same same same same same same")
    # near-duplicate pair (10 of 11 shingles shared -> J = 10/11)
    base = " ".join(f"t{k}" for k in range(12))
    texts.append(base)
    texts.append(base + " t12")
    return texts


def test_prefix_filter_bounds_candidates_under_skew(spark, tmp_path, skewed_corpus):
    sf_dir = _write_documents(spark, tmp_path, skewed_corpus)
    docs = dedup.with_shingles(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    cand = dedup.prefix_candidates(docs).collect()
    # the hot shingle alone would produce C(60,2) = 1770 raw candidates;
    # rarest-first prefixes exclude it from every prefix
    assert len(cand) <= 10, cand


def test_ngram_jaccard_exact_under_skew(spark, tmp_path, skewed_corpus):
    sf_dir = _write_documents(spark, tmp_path, skewed_corpus)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    expected = _brute_jaccard_pairs(skewed_corpus)
    assert got == expected
    assert (120, 121) in got and (122, 123) in got  # the planted dups


def test_simhash_block_combos_are_pigeonhole_complete():
    combos = dedup.simhash_block_combos()
    assert len(combos) == 20  # C(6, 3)
    block_bits = dedup.SIMHASH_BITS // dedup.SIMHASH_BLOCKS

    def blocks(v):
        return [(v >> (block_bits * b)) & ((1 << block_bits) - 1)
                for b in range(dedup.SIMHASH_BLOCKS)]

    # deterministic sample of <=3-bit perturbations: some combo of
    # blocks must be equal for every such pair
    base = 0x0F1E2D3C4B5A697
    flips = [(i * 7919) % 60 for i in range(40)]
    for k in range(1, 4):
        for subset in itertools.combinations(flips[:10], k):
            other = base
            for bit in subset:
                other ^= 1 << bit
            ba, bb = blocks(base), blocks(other)
            assert any(all(ba[b] == bb[b] for b in combo) for combo in combos)


def test_simhash_near_pairs_matches_brute_force(spark, tmp_path):
    texts = []
    for i in range(40):
        texts.append(f"alpha beta gamma delta epsilon zeta token{i} eta theta")
    texts.append(texts[0])  # identical pair -> hamming 0
    sf_dir = _write_documents(spark, tmp_path, texts)
    sims = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash_values(spark, sf_dir).collect()}
    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(sims), 2)
        if bin(sims[a] ^ sims[b]).count("1") <= dedup.SIMHASH_MAX_HAMMING
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_pairs(spark, sf_dir).collect()
    }
    assert got == expected
    assert (0, 40) in got


def test_minhash_lsh_just_below_threshold_pair_is_filtered(spark, tmp_path):
    """VERDICT r2 #4: pin the verify-stage semantics with a planted
    pair at Jaccard just below the threshold — it IS an LSH candidate
    (long shared prefix -> near-identical signatures) but must be
    dropped by the exact verification, not survive by luck."""
    texts = [f"u{i} v{i} w{i} x{i} y{i}" for i in range(20)]
    base = " ".join(f"t{k}" for k in range(10))  # 8 shingles
    texts.append(base)                      # doc 20
    texts.append(base + " x1 x2 x3")        # doc 21: inter 8, union 11 -> J = 0.727
    texts.append(base + " z1")              # doc 22: inter 8, union 9  -> J = 0.889
    sf_dir = _write_documents(spark, tmp_path, texts)
    docs = dedup.with_shingles(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_band_candidates(
            dedup.minhash_signatures(docs)).collect()
    }
    assert (20, 21) in cand  # candidate stage sees it...
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert (20, 21) not in got  # ...exact verify rejects it
    assert (20, 22) in got      # the above-threshold plant survives


def test_minhash_band_boundary_miss_contract(spark):
    """VERDICT r2 #4: banded LSH collides only on ALIGNED bands.
    Signatures agreeing on `rows` consecutive positions straddling a
    band boundary are a designed MISS; agreement on one aligned band
    is a guaranteed hit. This pins the miss-probability semantics the
    oracle docstring (minhash_lsh_pairs_sql) relies on."""
    rows = dedup.NUM_MINHASH // dedup.LSH_BANDS
    assert rows == 4
    sig_a = [100 + i for i in range(dedup.NUM_MINHASH)]
    # agrees with a on positions 2..5 (straddles bands 0 and 1)
    sig_b = [(100 + i) if 2 <= i <= 5 else (9000 + i)
             for i in range(dedup.NUM_MINHASH)]
    # agrees with a exactly on band 1 (positions 4..7)
    sig_c = [(100 + i) if 4 <= i <= 7 else (5000 + i)
             for i in range(dedup.NUM_MINHASH)]
    sdf = spark.createDataFrame(
        [(0, sig_a), (1, sig_b), (2, sig_c)], "doc_id long, sig array<bigint>"
    )
    cand = {(r["doc_a"], r["doc_b"])
            for r in dedup.minhash_band_candidates(sdf).collect()}
    assert (0, 2) in cand        # aligned band -> hit
    assert (0, 1) not in cand    # straddling agreement -> designed miss


def test_simhash_drops_zero_token_documents(spark, tmp_path):
    """ADVICE r2: the zero-shuffle simhash must not emit a simhash=0
    row for zero-token documents — the explode/groupBy shape it
    replaced (and the unchanged DuckDB oracle) never form a group for
    them, and a phantom 0 would join spuriously with real hamming<=3
    neighbours."""
    sf_dir = _write_documents(spark, tmp_path, ["alpha beta gamma", None])
    got = {r["doc_id"] for r in dedup.simhash_values(spark, sf_dir).collect()}
    assert got == {0}


def test_lsh_dup_clusters_transitive_closure(spark):
    """Clustering must close over CHAINS: a~b and b~c put (a, b, c) in
    ONE cluster with canonical=min even though (a, c) was never a pair,
    and disconnected pairs stay separate clusters."""
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 21)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_id"], r["canonical_doc"], r["cluster_size"], r["is_duplicate"])
        for r in dedup.lsh_dup_clusters(spark, "unused", pairs=pairs).collect()
    }
    assert got == {
        (1, 1, 3, False), (5, 1, 3, True), (9, 1, 3, True),
        (20, 20, 2, False), (21, 20, 2, True),
    }


def test_decontaminate_13_gram_boundary(spark, tmp_path):
    """Planted contamination: doc 7 seeds the benchmark set (its
    tokens 4..23 become the snippet); a doc sharing 13 consecutive
    snippet tokens is flagged, a doc sharing only 12 is clean, and the
    seed document contaminates ITSELF with all 8 snippet 13-grams."""
    words = [f"w{k}" for k in range(30)]
    snippet = words[dedup.DECONTAM_SKIP:dedup.DECONTAM_SKIP + dedup.DECONTAM_SNIPPET]
    texts = [f"junk{i}a junk{i}b junk{i}c" for i in range(9)]
    texts[7] = " ".join(words)                                   # bench seed
    texts[3] = "a b " + " ".join(snippet[:13]) + " z1 z2"        # 13 shared
    texts[4] = "c d " + " ".join(snippet[:12]) + " z3 z4 z5"     # only 12
    sf_dir = _write_documents(spark, tmp_path, texts)

    got = {r["doc_id"]: r for r in dedup.decontaminate(spark, sf_dir).collect()}
    assert set(got) == {3, 7}
    assert got[3]["n_hit_grams"] == 1
    assert got[3]["n_bench_hits"] == 1 and got[3]["first_bench"] == 7
    # the seed contains every 13-gram of its own 20-token snippet
    assert got[7]["n_hit_grams"] == dedup.DECONTAM_SNIPPET - dedup.DECONTAM_N + 1


def test_decontaminate_short_docs_never_seed(spark, tmp_path):
    """A doc at the benchmark offset with fewer than SKIP+SNIPPET
    tokens contributes nothing (and the corpus stays clean)."""
    texts = [f"junk{i}a junk{i}b junk{i}c" for i in range(8)]
    texts[7] = "short doc only five tokens here"
    sf_dir = _write_documents(spark, tmp_path, texts)
    assert dedup.decontaminate(spark, sf_dir).count() == 0

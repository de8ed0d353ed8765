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

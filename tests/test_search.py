"""BM25 keyword-search semantics: exact quantized-score parity with a
Python reference, deterministic ranking, and the length-normalization
behavior that motivates BM25 over raw tf."""

from __future__ import annotations

import math

from jsonld_spark.operators import search


def _write_documents(spark, tmp_path, texts):
    sf_dir = str(tmp_path)
    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _python_bm25(texts, queries, k1=search.BM25_K1, b=search.BM25_B,
                 topk=search.BM25_TOPK):
    docs = {i: t.lower().split(" ") for i, t in enumerate(texts)}
    n = len(docs)
    avgdl = sum(len(ts) for ts in docs.values()) / n
    out = {}
    for qid, terms in queries.items():
        scores = {}
        for term in terms:
            df = sum(1 for ts in docs.values() if term in ts)
            if df == 0:
                continue
            idf = (n - df + 0.5) / (df + 0.5)
            for did, ts in docs.items():
                tf = ts.count(term)
                if not tf:
                    continue
                norm = k1 * ((1.0 - b) + b * (len(ts) / avgdl))
                s = idf * (tf * (k1 + 1.0) / (tf + norm))
                scores[did] = scores.get(did, 0) + math.floor(s * 1e6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
        out[qid] = [(r + 1, did, s) for r, (did, s) in enumerate(ranked)]
    return out


def test_bm25_matches_python_reference(spark, tmp_path):
    texts = [
        "spark join hash join merge",
        "join",
        "hash hash hash hash hash hash hash hash",
        "customer order window",
        "slow slow window order customer order",
        "vector stream scan stream",
        "nothing relevant here at all",
    ]
    sf_dir = _write_documents(spark, tmp_path, texts)
    got = {}
    for r in search.bm25_topk(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_micro"]))
    for qid in got:
        got[qid].sort()
    want = _python_bm25(texts, search.BM25_QUERIES)
    assert got == {q: v for q, v in want.items() if v}


def test_bm25_length_normalization_prefers_short_doc(spark, tmp_path):
    """Same tf for 'join' in a 3-token and a 30-token doc: BM25's b/dl
    normalization must rank the short (denser) document first."""
    texts = [
        "join join x",
        "join join " + " ".join(f"f{i}" for i in range(28)),
    ]
    sf_dir = _write_documents(spark, tmp_path, texts)
    rows = [r for r in search.bm25_topk(spark, sf_dir).collect()
            if r["query_id"] == 9001]
    ranked = sorted((r["rank"], r["doc_id"]) for r in rows)
    assert ranked[0] == (1, 0)
    assert ranked[1] == (2, 1)

"""URDNA2015 / RDFC-1.0 canonicalization tests (kernel/canon.py +
the per-document distributed operator)."""

from __future__ import annotations

import random

import pytest

from jsonld_spark.kernel.canon import canonical_nquads, urdna2015, urdna2015_mapping
from jsonld_spark.kernel.rdf import Quad

EX = "http://example.com/"


def _q(s, p, o, kind="iri", typ=None, lang=None, g=None):
    return Quad(g, s, p, kind, o, typ, lang)


def _relabel_quads(quads, mapping):
    def m(v):
        return mapping.get(v, v)

    return [
        Quad(None if q.graph is None else m(q.graph), m(q.subject), q.predicate,
             q.obj_kind, m(q.obj_value) if q.obj_kind == "iri" else q.obj_value,
             q.obj_type, q.obj_lang)
        for q in quads
    ]


BASE_QUADS = [
    _q("_:x", EX + "p", "_:y"),
    _q("_:y", EX + "p", "_:x"),          # symmetric 2-cycle (N-degree path)
    _q("_:x", EX + "name", "alpha", kind="literal"),
    _q("_:z", EX + "q", EX + "iri"),
    _q(EX + "s", EX + "r", "_:z"),
    _q("_:w", EX + "t", "lit", kind="literal",
       typ="http://www.w3.org/2001/XMLSchema#integer"),
    _q("_:g1", EX + "in", "_:x", g="_:gname"),  # bnode graph name
]


def test_isomorphism_invariance():
    """Relabeled + shuffled input yields byte-identical canonical
    N-Quads — the defining property of URDNA2015."""
    golden = canonical_nquads(BASE_QUADS)
    rng = random.Random(7)
    for trial in range(5):
        names = ["_:x", "_:y", "_:z", "_:w", "_:g1", "_:gname"]
        shuffled_names = names[:]
        rng.shuffle(shuffled_names)
        mapping = {old: f"_:r{trial}n{i}" for i, (old, _) in
                   enumerate(zip(names, shuffled_names))}
        mapping = {old: f"_:trial{trial}b{i}"
                   for i, old in enumerate(shuffled_names)}
        variant = _relabel_quads(BASE_QUADS, mapping)
        rng.shuffle(variant)
        assert canonical_nquads(variant) == golden


def test_symmetric_nodes_get_distinct_stable_labels():
    """Two bnodes with identical first-degree hashes (a pure 2-cycle)
    must disambiguate via N-degree hashing, deterministically."""
    quads = [
        _q("_:a", EX + "p", "_:b"),
        _q("_:b", EX + "p", "_:a"),
        _q("_:a", EX + "v", "1", kind="literal"),
        _q("_:b", EX + "v", "2", kind="literal"),
    ]
    mapping = urdna2015_mapping(quads)
    assert sorted(mapping.values()) == ["_:c14n0", "_:c14n1"]
    flipped = urdna2015_mapping([
        _q("_:b2", EX + "p", "_:a2"),
        _q("_:a2", EX + "p", "_:b2"),
        _q("_:b2", EX + "v", "1", kind="literal"),
        _q("_:a2", EX + "v", "2", kind="literal"),
    ])
    # the node carrying "1" gets the same canonical label either way
    assert mapping["_:a"] == flipped["_:b2"]
    assert mapping["_:b"] == flipped["_:a2"]


def test_truly_automorphic_nodes_still_deterministic():
    """A fully symmetric cycle (no distinguishing literals) is the
    worst case: labels come from the permutation search and must be
    stable across input orders."""
    quads = [
        _q("_:a", EX + "p", "_:b"),
        _q("_:b", EX + "p", "_:a"),
    ]
    out1 = canonical_nquads(quads)
    out2 = canonical_nquads(list(reversed(_relabel_quads(
        quads, {"_:a": "_:zz", "_:b": "_:aa"}))))
    assert out1 == out2
    assert "_:c14n0" in out1 and "_:c14n1" in out1


def test_canonical_output_is_sorted_and_deduped():
    quads = BASE_QUADS + [BASE_QUADS[0]]  # duplicate quad
    out = urdna2015(quads)
    assert len(out) == len(BASE_QUADS)
    lines = canonical_nquads(quads).splitlines()
    assert lines == sorted(lines)


def test_api_normalize_matches_isomorphic_docs():
    from jsonld_spark.kernel.api import normalize

    doc1 = {"@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": "_:n1", "p": {"@id": "_:n2"}}
    doc2 = {"@context": {"p": {"@id": EX + "p", "@type": "@id"}},
            "@id": "_:other", "p": {"@id": "_:labels"}}
    assert normalize(doc1) == normalize(doc2)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def _random_dataset(draw):
        n_bnodes = draw(st.integers(min_value=1, max_value=5))
        bnodes = [f"_:n{i}" for i in range(n_bnodes)]
        n_quads = draw(st.integers(min_value=1, max_value=10))
        preds = [EX + "p", EX + "q"]
        quads = []
        for _ in range(n_quads):
            s = draw(st.sampled_from(bnodes + [EX + "s"]))
            p = draw(st.sampled_from(preds))
            if draw(st.booleans()):
                quads.append(_q(s, p, draw(st.sampled_from(bnodes))))
            else:
                quads.append(_q(s, p, draw(st.sampled_from(["a", "b"])),
                                kind="literal"))
        return quads

    @settings(max_examples=60, deadline=None)
    @given(_random_dataset(), st.randoms(use_true_random=False))
    def test_property_isomorphism_invariance(quads, rng):
        """For ANY small dataset: relabeling + reordering never changes
        the canonical N-Quads (the URDNA2015 contract)."""
        golden = canonical_nquads(quads)
        names = sorted({v for q in quads for _, v in
                        ((("s", q.subject)), ("o", q.obj_value if q.obj_kind == "iri" else ""))
                        if isinstance(v, str) and v.startswith("_:")})
        perm = list(names)
        rng.shuffle(perm)
        mapping = {old: f"_:x{i}" for i, old in enumerate(perm)}
        variant = _relabel_quads(quads, mapping)
        rng.shuffle(variant)
        assert canonical_nquads(variant) == golden
except ImportError:  # pragma: no cover
    pass


QUAD_DDL = ("graph string, subject string, predicate string, obj_kind string, "
            "obj_value string, obj_type string, obj_lang string")


def test_urdna_dataset_labels_merge_order_invariant(spark):
    """VERDICT r2 #6 'done' criterion: merging two isomorphic docs
    (bnode-remapped on union, Graph.merge-style) yields identical
    dataset-level canonical labels regardless of merge order — and the
    isomorphic components stay distinct (no label collapse)."""
    from jsonld_spark.operators.canonicalize import urdna_dataset_labels

    doc = [
        _q("_:a", EX + "p", "_:b"),
        _q("_:b", EX + "name", "n", kind="literal"),
        _q(EX + "s", EX + "r", "_:a"),
        _q(EX + "s", EX + "k", EX + "o"),  # ground quad
    ]

    def remap(quads, suffix):
        return _relabel_quads(quads, {"_:a": f"_:m{suffix}a", "_:b": f"_:m{suffix}b"})

    ab = remap(doc, "0") + remap(doc, "1")
    ba = remap(doc, "1") + remap(doc, "0")

    def run(quads):
        sdf = spark.createDataFrame([tuple(q) for q in quads], QUAD_DDL)
        return sorted(tuple(r) for r in urdna_dataset_labels(sdf).collect())

    r1, r2 = run(ab), run(ba)
    assert r1 == r2
    assert len(r1) == len(ab)
    # two isomorphic components -> same fingerprint, distinct ranks:
    # 4 distinct bnode labels total (2 per component), none collapsed
    bnode_labels = {t[1] for t in r1 if t[1].startswith("_:")} | {
        t[4] for t in r1 if t[3] == "iri" and t[4].startswith("_:")
    }
    assert len(bnode_labels) == 4
    fps = {lb.split("r")[0] for lb in bnode_labels}
    assert len(fps) == 1  # isomorphic -> identical fingerprints


def test_urdna_dataset_labels_shared_bnode_component(spark):
    """Quads sharing a bnode across source documents form ONE
    component with one consistent labeling."""
    from jsonld_spark.operators.canonicalize import urdna_dataset_labels

    quads = [
        _q("_:x", EX + "p", "_:y"),      # "doc 1"
        _q("_:y", EX + "p", "_:z"),      # "doc 2" shares _:y
        _q("_:z", EX + "name", "v", kind="literal"),
    ]
    sdf = spark.createDataFrame([tuple(q) for q in quads], QUAD_DDL)
    out = [tuple(r) for r in urdna_dataset_labels(sdf).collect()]
    labels = {t[1] for t in out} | {t[4] for t in out if t[3] == "iri"}
    labels = {lb for lb in labels if lb.startswith("_:")}
    assert len(labels) == 3
    assert len({lb.split("c")[0] for lb in labels}) == 1  # one component prefix
    # kernel parity: same component structure canonicalizes to the
    # kernel's within-component indexes
    kernel = urdna2015_mapping(quads)
    got_n = sorted(int(lb.rsplit("c", 1)[1]) for lb in labels)
    want_n = sorted(int(v[len("_:c14n"):]) for v in kernel.values())
    assert got_n == want_n


def test_urdna_bnode_labels_distributed(spark):
    """Per-document distributed URDNA relabeling: labels are globally
    unique (doc-key prefixed), per-document canonical, and two
    structurally identical documents share canonical indexes."""
    from jsonld_spark.operators.canonicalize import urdna_bnode_labels
    from jsonld_spark.operators.kg_pipeline import docs_to_quads
    from jsonld_spark.operators.extract import with_payload
    from jsonld_spark.sources.transcripts import transcripts_from_events

    t = transcripts_from_events(spark, "/root/testdata/sf0.001").limit(40)
    quads = docs_to_quads(with_payload(t))
    out = urdna_bnode_labels(quads)
    rows = out.collect()
    assert len(rows) == quads.count()
    bnodes = {r["subject"] for r in rows if r["subject"].startswith("_:")}
    assert bnodes and all(b.startswith("_:h") and "c" in b[3:] for b in bnodes)
    # per-document keys differ, canonical indexes repeat across docs
    keys = {b[3:35] for b in bnodes}
    assert len(keys) > 1

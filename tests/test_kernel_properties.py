"""Tier-1: property-based kernel tests (hypothesis).

Algebraic invariants the JSON-LD 1.0 algorithms must satisfy on any
document, checked over generated inputs:
  * expansion is idempotent: expand(expand(doc)) == expand(doc)
  * compaction round-trips: expand(compact(doc, ctx)) == expand(doc)
  * N-Quads: parse(serialize(quads)) == quads (for serializable values)
  * toRdf is invariant under flattening (same triple set, bnode-bijection)
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from jsonld_spark.kernel import (
    compact,
    expand,
    flatten,
    nquads_parse,
    nquads_serialize,
    to_rdf_quads,
)
from jsonld_spark.kernel.rdf import Quad

SETTINGS = settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much],
)

CONTEXT = {
    "@vocab": "http://v/",
    "name": "http://t/name",
    "ref": {"@id": "http://t/ref", "@type": "@id"},
    "num": {"@id": "http://t/num", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
    "tagged": {"@id": "http://t/tagged", "@language": "en"},
    "seq": {"@id": "http://t/seq", "@container": "@list"},
    "labels": {"@id": "http://t/labels", "@container": "@language"},
    "items": {"@id": "http://t/items", "@container": "@index"},
}

iris = st.sampled_from(
    ["http://ex.org/a", "http://ex.org/b", "http://ex.org/c#frag",
     "_:b0", "_:anon", "http://other.net/x?q=1"]
)
scalars = st.one_of(
    st.text(alphabet="abc XYZ\n\"\\", max_size=12),
    st.integers(min_value=-10**15, max_value=10**15),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
)
terms = st.sampled_from(["name", "ref", "num", "tagged", "other", "http://t/p"])


def node_objects(depth: int):
    if depth <= 0:
        children = scalars
    else:
        children = st.deferred(lambda: st.one_of(
            scalars,
            node_objects(depth - 1),
            st.lists(st.one_of(scalars, node_objects(depth - 1)), max_size=3),
        ))
    return st.fixed_dictionaries(
        {},
        optional={
            "@id": iris,
            "@type": st.one_of(iris, st.lists(iris, min_size=1, max_size=2)),
            "name": children,
            "ref": iris,
            "num": st.integers(min_value=-100, max_value=100),
            "tagged": st.text(alphabet="xyz", max_size=6),
            "seq": st.lists(scalars, max_size=3),
            "labels": st.dictionaries(
                st.sampled_from(["en", "de", "FR"]), st.text(alphabet="ab", max_size=4),
                max_size=2,
            ),
            "items": st.dictionaries(
                st.sampled_from(["i1", "i2"]), st.one_of(scalars, st.lists(scalars, max_size=2)),
                max_size=2,
            ),
        },
    )


documents = st.builds(
    lambda node, use_graph: (
        {"@context": CONTEXT, "@graph": [node]} if use_graph
        else {"@context": CONTEXT, **node}
    ),
    node_objects(2),
    st.booleans(),
)


@given(documents)
@SETTINGS
def test_expand_is_idempotent(doc):
    expanded = expand(doc, base="http://base.org/doc")
    assert expand(expanded, base="http://base.org/doc") == expanded


def _setwise(value):
    """Canonicalize expanded form treating property-value arrays as
    sets: compaction into container maps (e.g. @language maps) and
    re-expansion can reorder values — JSON-LD array order is only
    significant inside @list, which this preserves as-is."""
    import json

    if isinstance(value, list):
        return sorted((_setwise(v) for v in value), key=json.dumps)
    if isinstance(value, dict):
        return {
            k: (_setwise(v) if k != "@list" else [_setwise(x) for x in v])
            for k, v in value.items()
        }
    return value


@given(documents)
@SETTINGS
def test_compact_expand_roundtrip(doc):
    expanded = expand(doc, base="http://base.org/doc")
    compacted = compact(doc, {"@context": CONTEXT}, base="http://base.org/doc")
    assert _setwise(expand(compacted, base="http://base.org/doc")) == _setwise(expanded)


@given(documents)
@SETTINGS
def test_flatten_preserves_triples(doc):
    """toRdf(flatten(x)) must equal toRdf(x) as a set, after
    normalizing blank-node labels (labels may be assigned in different
    traversal orders; the quad structure must be bijective)."""
    direct = to_rdf_quads(doc, base="http://base.org/doc")
    flat = to_rdf_quads(flatten(doc, base="http://base.org/doc"), base="http://base.org/doc")

    def canonical(quads):
        # Weisfeiler-Lehman-style signature refinement: blank nodes get
        # labels from their neighborhood structure, so isomorphic quad
        # sets (even with duplicated isomorphic branches) compare equal
        # as multisets. Exact for the tree-shaped graphs expansion
        # produces; 4 rounds covers the generator's nesting depth.
        def is_bn(t):
            return isinstance(t, str) and t.startswith("_:")

        bnodes = {t for q in quads for t in (q.subject, q.graph,
                  q.obj_value if q.obj_kind == "iri" else None) if is_bn(t)}
        sig = {b: "" for b in bnodes}
        for _ in range(4):
            nxt = {}
            for b in bnodes:
                edges = []
                for q in quads:
                    obj = sig.get(q.obj_value, q.obj_value) if q.obj_kind == "iri" else q.obj_value
                    if q.subject == b:
                        edges.append(("out", q.predicate, q.obj_kind, str(obj),
                                      str(q.obj_type), str(q.obj_lang)))
                    if q.obj_kind == "iri" and q.obj_value == b:
                        edges.append(("in", q.predicate, sig.get(q.subject, q.subject)))
                    if q.graph == b:
                        edges.append(("g", q.predicate))
                nxt[b] = "sig:" + str(hash(tuple(sorted(map(str, edges)))))
            sig = nxt

        def relabel(t):
            return sig.get(t, t)

        return sorted(
            str((relabel(q.graph), relabel(q.subject), q.predicate, q.obj_kind,
                 relabel(q.obj_value) if q.obj_kind == "iri" else q.obj_value,
                 q.obj_type, q.obj_lang))
            for q in quads
        )

    assert canonical(direct) == canonical(flat)


quad_objects = st.one_of(
    st.tuples(st.just("iri"), iris, st.none(), st.none()),
    st.tuples(st.just("literal"), st.text(alphabet='ab"\n\\', max_size=8),
              st.sampled_from(["http://www.w3.org/2001/XMLSchema#string",
                               "http://t/custom"]), st.none()),
    st.tuples(st.just("literal"), st.text(alphabet="ab", max_size=8),
              st.none(), st.sampled_from(["en", "de-at"])),
)
quads_strategy = st.lists(
    st.builds(
        lambda s, p, g, o: Quad(g, s, p, *o),
        iris, st.sampled_from(["http://t/p", "http://t/q"]),
        st.one_of(st.none(), iris), quad_objects,
    ),
    max_size=8,
)


@given(quads_strategy)
@SETTINGS
def test_nquads_roundtrip_property(quads):
    # the serializer does not escape backslashes (reference bug-compat,
    # NQuads.php:44-47), so skip values where that lossiness applies
    quads = [
        q for q in quads
        if q.obj_kind == "iri" or "\\" not in q.obj_value
    ]
    assert nquads_parse(nquads_serialize(quads)) == quads

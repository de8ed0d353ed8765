"""Tier-1: toRdf quad emission, literal canonicalization, node map,
flatten, N-Quads — validated with hand-derived goldens that trace the
reference's algorithms (Processor.php:1896-2261, Value.php:69-112,
NQuads.php:25-175) plus a replay of the reference's dataset fixture.
"""

from __future__ import annotations

import pytest

from jsonld_spark.kernel import flatten, nquads_parse, nquads_serialize, to_rdf, to_rdf_quads
from jsonld_spark.kernel.rdf import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    Quad,
    canonical_double,
)
from tests.conftest import load_reference_fixture

V = "http://example.com/vocab#"


def quadset(quads):
    return set(quads)


def test_canonical_double_forms():
    # golden forms from the reference's %1.15E + zero compression
    # (Value.php:84-89); these exact strings appear in W3C toRdf goldens
    assert canonical_double(5.3) == "5.3E0"
    assert canonical_double(1e24) == "1.0E24"
    assert canonical_double(1.0) == "1.0E0"
    assert canonical_double(-5.5) == "-5.5E0"
    assert canonical_double(0.000053) == "5.3E-5"
    # %1.15E carries 16 significant digits, so the 17-digit max double rounds
    assert canonical_double(1.7976931348623157e308) == "1.797693134862316E308"


def test_canonical_double_signed_zero_memo():
    """ADVICE r2: the memo must not conflate 0.0 and -0.0 (equal /
    same-hash as dict keys) — whichever sign is serialized first, the
    other must still come out signed correctly (toRdf-0019 golden)."""
    assert canonical_double(0.0) == "0.0E0"
    assert canonical_double(-0.0) == "-0.0E0"
    assert canonical_double(-0.0) == "-0.0E0"
    assert canonical_double(0.0) == "0.0E0"


def test_literal_canonicalization():
    doc = {
        "@id": "http://ex.org/s",
        "http://ex.org/int": 4,
        "http://ex.org/double": 5.3,
        "http://ex.org/intfloat": 4.0,
        "http://ex.org/bool": True,
        "http://ex.org/string": "str",
        "http://ex.org/typeddouble": {
            "@value": 7,
            "@type": "http://www.w3.org/2001/XMLSchema#double",
        },
    }
    quads = {q.predicate: q for q in to_rdf_quads(doc)}
    assert quads["http://ex.org/int"][4:] == ("4", XSD_INTEGER, None)
    assert quads["http://ex.org/double"][4:] == ("5.3E0", XSD_DOUBLE, None)
    # 4.0 is integral -> xsd:integer "4" (Value.php:90-94)
    assert quads["http://ex.org/intfloat"][4:] == ("4", XSD_INTEGER, None)
    assert quads["http://ex.org/bool"][4:] == ("true", XSD_BOOLEAN, None)
    # untyped strings serialize with implied xsd:string
    assert quads["http://ex.org/string"].obj_type == "http://www.w3.org/2001/XMLSchema#string"
    # explicit @type xsd:double forces exponent form (Value.php:84)
    assert quads["http://ex.org/typeddouble"][4:] == ("7.0E0", XSD_DOUBLE, None)


def test_type_quads_and_language():
    doc = {
        "@id": "http://ex.org/s",
        "@type": ["http://ex.org/T1", "http://ex.org/T2"],
        "http://ex.org/label": {"@value": "hallo", "@language": "de"},
    }
    quads = to_rdf_quads(doc)
    assert Quad(None, "http://ex.org/s", RDF_TYPE, "iri", "http://ex.org/T1", None, None) in quads
    assert Quad(None, "http://ex.org/s", RDF_TYPE, "iri", "http://ex.org/T2", None, None) in quads
    assert Quad(None, "http://ex.org/s", "http://ex.org/label", "literal", "hallo", None, "de") in quads


def test_list_chain_wiring():
    doc = {"@id": "http://ex.org/s", "http://ex.org/seq": {"@list": ["a", "b"]}}
    quads = to_rdf_quads(doc)
    assert quadset(quads) == quadset(
        [
            Quad(None, "http://ex.org/s", "http://ex.org/seq", "iri", "_:b0", None, None),
            Quad(None, "_:b0", RDF_FIRST, "literal", "a",
                 "http://www.w3.org/2001/XMLSchema#string", None),
            Quad(None, "_:b0", RDF_REST, "iri", "_:b1", None, None),
            Quad(None, "_:b1", RDF_FIRST, "literal", "b",
                 "http://www.w3.org/2001/XMLSchema#string", None),
            Quad(None, "_:b1", RDF_REST, "iri", RDF_NIL, None, None),
        ]
    )


def test_empty_list_is_rdf_nil():
    doc = {"@id": "http://ex.org/s", "http://ex.org/seq": {"@list": []}}
    assert to_rdf_quads(doc) == [
        Quad(None, "http://ex.org/s", "http://ex.org/seq", "iri", RDF_NIL, None, None)
    ]


def test_blank_node_predicates_dropped_unless_generalized():
    doc = {"@id": "http://ex.org/s", "_:p": "v", "http://ex.org/q": "w"}
    default = to_rdf_quads(doc)
    assert {q.predicate for q in default} == {"http://ex.org/q"}
    general = to_rdf_quads(doc, produce_generalized_rdf=True)
    assert {q.predicate for q in general} == {"http://ex.org/q", "_:b0"}


def test_relative_subjects_and_predicates_skipped():
    # without a base, relative ids survive expansion but are skipped
    # during quad emission (Processor.php:2146-2180)
    doc = {
        "@id": "relative-id",
        "http://ex.org/p": {"@id": "also-relative"},
        "http://ex.org/q": "kept",
    }
    quads = to_rdf_quads(doc)
    assert quads == []  # relative subject: whole node skipped


def test_dataset_fixture_quads():
    """Replay of /root/reference/Test/Fixtures/dataset.jsonld: named
    graphs (incl. a blank-node graph name), @type:@id references,
    deterministic _:bN labels in first-visit order of the traversal."""
    doc = load_reference_fixture("dataset.jsonld")
    base = "http://example.com/dataset"
    quads = to_rdf_quads(doc, base=base)
    ng = "http://example.com/named-graph"
    expected = [
        # default graph
        Quad(None, f"{base.rsplit('/',1)[0]}/node1", f"{V}references", "iri", "_:b0", None, None),
        Quad(None, "http://example.com/node1", f"{V}references", "iri", ng, None, None),
        Quad(None, "_:b2", f"{V}name", "literal", "_:bnode",
             "http://www.w3.org/2001/XMLSchema#string", None),
        # blank-node named graph (first-visit: _:graphBn -> _:b0)
        Quad("_:b0", "_:b1", f"{V}name", "literal", "_:graphBn/node1",
             "http://www.w3.org/2001/XMLSchema#string", None),
        Quad("_:b0", "_:b1", f"{V}references", "iri", "_:b2", None, None),
        Quad("_:b0", "_:b1", f"{V}references", "iri", "http://example.com/node1", None, None),
        Quad("_:b0", "_:b1", f"{V}references", "iri", f"{ng}/node1", None, None),
        # IRI named graph
        Quad(ng, f"{ng}/node1", f"{V}name", "literal", "/named-graph/node1",
             "http://www.w3.org/2001/XMLSchema#string", None),
        Quad(ng, f"{ng}/node1", f"{V}references", "iri", "_:b2", None, None),
        Quad(ng, f"{ng}/node1", f"{V}references", "iri", "http://example.com/node1", None, None),
        Quad(ng, f"{ng}/node1", f"{V}references", "iri", "_:b1", None, None),
    ]
    assert quadset(quads) == quadset(expected)
    assert len(quads) == len(expected)


def test_reverse_redistribution_in_node_map():
    doc = {
        "@id": "http://ex.org/mom",
        "@reverse": {"http://v/parent": [{"@id": "http://ex.org/kid"}]},
        "http://v/name": "mom",
    }
    quads = quadset(to_rdf_quads(doc))
    assert Quad(None, "http://ex.org/kid", "http://v/parent", "iri",
                "http://ex.org/mom", None, None) in quads


def test_value_dedup_in_node_map():
    # duplicate values collapse (mergeIntoProperty unique=true)
    doc = [
        {"@id": "http://ex.org/s", "http://v/p": ["x", "x", {"@id": "http://ex.org/o"}]},
        {"@id": "http://ex.org/s", "http://v/p": {"@id": "http://ex.org/o"}},
    ]
    quads = to_rdf_quads(doc)
    assert len(quads) == 2


def test_flatten_shape():
    doc = load_reference_fixture("sample-in.jsonld")
    flat = flatten(doc, base="http://example.com/doc")
    assert len(flat) == 1
    node = flat[0]
    assert node["@id"] == "http://example.com/id1"
    assert node["@type"] == ["http://example.com/t1"]
    assert node["http://example.com/term5"] == [{"@value": 50}, {"@value": 51}]


def test_flatten_named_graphs():
    doc = load_reference_fixture("dataset.jsonld")
    flat = flatten(doc, base="http://example.com/dataset")
    ids = [n["@id"] for n in flat]
    # sorted by subject; graph-name nodes carry @graph
    assert ids == sorted(ids, key=lambda s: s)
    graph_nodes = {n["@id"]: n for n in flat if "@graph" in n}
    assert "_:b0" in graph_nodes
    assert "http://example.com/named-graph" in graph_nodes


def test_nquads_serialize_format():
    quads = [
        Quad(None, "http://ex.org/s", "http://ex.org/p", "literal", 'say "hi"\nnow',
             "http://www.w3.org/2001/XMLSchema#string", None),
        Quad("http://ex.org/g", "_:b0", "http://ex.org/p", "literal", "x", None, "en-us"),
        Quad(None, "http://ex.org/s", "http://ex.org/p", "literal", "5.3E0", XSD_DOUBLE, None),
    ]
    text = nquads_serialize(quads)
    lines = text.splitlines()
    assert lines[0] == '<http://ex.org/s> <http://ex.org/p> "say \\"hi\\"\\nnow" .'
    assert lines[1] == '_:b0 <http://ex.org/p> "x"@en-us <http://ex.org/g> .'
    assert lines[2] == (
        '<http://ex.org/s> <http://ex.org/p> '
        '"5.3E0"^^<http://www.w3.org/2001/XMLSchema#double> .'
    )


def test_nquads_parse_roundtrip():
    text = (
        '<http://ex.org/s> <http://ex.org/p> "v" .\n'
        '_:b0 <http://ex.org/p> <http://ex.org/o> <http://ex.org/g> .\n'
        '# a comment\n'
        '\n'
        '<http://ex.org/s> <http://ex.org/p> "tagged"@en .\n'
        '<http://ex.org/s> <http://ex.org/p> "7"^^<http://www.w3.org/2001/XMLSchema#integer> _:g1 .\n'
    )
    quads = nquads_parse(text)
    assert len(quads) == 4
    assert quads[0] == Quad(None, "http://ex.org/s", "http://ex.org/p", "literal", "v",
                            "http://www.w3.org/2001/XMLSchema#string", None)
    assert quads[1] == Quad("http://ex.org/g", "_:b0", "http://ex.org/p", "iri",
                            "http://ex.org/o", None, None)
    assert quads[2].obj_lang == "en"
    assert quads[3] == Quad("_:g1", "http://ex.org/s", "http://ex.org/p", "literal", "7",
                            "http://www.w3.org/2001/XMLSchema#integer", None)


def test_nquads_bnode_label_grammar():
    # valid labels per https://www.w3.org/TR/n-quads/#BNodes
    for label in ("_:b", "_:b1", "_:b.1", "_:b-1", "_:_b"):
        line = f'{label} <http://ex.org/p> "v" .'
        assert nquads_parse(line)[0].subject == label
    # invalid: leading dash / dot, trailing dot
    for label in ("_:-b", "_:.b", "_:b."):
        with pytest.raises(Exception):
            nquads_parse(f'{label} <http://ex.org/p> "v" .')


def test_to_rdf_string_output():
    doc = {"@id": "http://ex.org/s", "http://ex.org/p": "v"}
    assert to_rdf(doc) == '<http://ex.org/s> <http://ex.org/p> "v" .\n'


def test_native_conversion_mirrors_php_quirks():
    """TypedValue.php:105/112 bug-compat (round 5): the sign class
    [\\+|-] matches '|' (intval -> 0), regex on the trimmed lexical
    but conversion on the raw, no leading-dot doubles, and 64-bit
    intval saturation."""
    from jsonld_spark.kernel.rdf import (
        XSD_DOUBLE,
        XSD_INTEGER,
        literal_to_jsonld,
    )

    conv = lambda v, t: literal_to_jsonld(v, t, None, use_native_types=True)
    assert conv("|5", XSD_INTEGER) == {"@value": 0}
    assert conv(" 5 ", XSD_INTEGER) == {"@value": 5}
    assert conv("-7", XSD_INTEGER) == {"@value": -7}
    assert conv("99999999999999999999", XSD_INTEGER) == {
        "@value": 9223372036854775807}
    assert conv("-99999999999999999999", XSD_INTEGER) == {
        "@value": -9223372036854775808}
    assert conv(".5", XSD_DOUBLE) == {"@value": ".5", "@type": XSD_DOUBLE}
    assert conv("5.", XSD_DOUBLE) == {"@value": 5.0}
    assert conv("|5e2", XSD_DOUBLE) == {"@value": 0.0}
    assert conv("4a", XSD_INTEGER) == {"@value": "4a", "@type": XSD_INTEGER}

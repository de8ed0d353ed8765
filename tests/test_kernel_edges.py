"""Tier-1: remaining spec-shape edges not covered elsewhere."""

from __future__ import annotations

from jsonld_spark.kernel import compact, expand, to_rdf_quads
from jsonld_spark.kernel.compaction import compact_document
from jsonld_spark.kernel.context import MERGED_GRAPH
from jsonld_spark.kernel.nodemap import BlankNodeIssuer, generate_node_map


def test_vocab_type_coercion():
    doc = {
        "@context": {"@vocab": "http://v/", "kind": {"@id": "http://v/kind", "@type": "@vocab"}},
        "@id": "http://e/1",
        "kind": "Widget",
    }
    assert expand(doc)[0]["http://v/kind"] == [{"@id": "http://v/Widget"}]


def test_id_coercion_non_string_falls_to_value():
    doc = {
        "@context": {"ref": {"@id": "http://v/ref", "@type": "@id"}},
        "@id": "http://e/1",
        "ref": 42,
    }
    # spec: @id coercion applies to strings only; non-strings stay values
    assert expand(doc)[0]["http://v/ref"] == [{"@value": 42}]


def test_compact_arrays_false_keeps_arrays():
    doc = {"@id": "http://e/1", "http://v/p": [{"@value": "only"}]}
    out = compact_document([doc], {"p": "http://v/p"}, compact_arrays=False)
    assert out["@graph"][0]["p"] == ["only"] or out.get("p") == ["only"]


def test_negative_zero_double():
    quads = to_rdf_quads({"@id": "http://e/1", "http://v/d": -0.0,
                          "http://v/e": {"@value": -0.0,
                                         "@type": "http://www.w3.org/2001/XMLSchema#double"}})
    values = {q.predicate: q.obj_value for q in quads}
    # -0.0 is integral -> xsd:integer "0" (Value.php:90-94); typed double keeps sign
    assert values["http://v/d"] == "0"
    assert values["http://v/e"] == "-0.0E0"


def test_merged_graph_mode():
    """generateNodeMap with @merged folds named graphs into one
    (Processor.php:2026-2034; used by framing without @graph)."""
    doc = [
        {"@id": "http://e/g1", "@graph": [{"@id": "http://e/a", "http://v/p": [{"@value": "1"}]}]},
        {"@id": "http://e/g2", "@graph": [{"@id": "http://e/a", "http://v/q": [{"@value": "2"}]}]},
    ]
    node_map = {MERGED_GRAPH: {}}
    generate_node_map(node_map, expand(doc), BlankNodeIssuer(), MERGED_GRAPH)
    merged = node_map[MERGED_GRAPH]
    node = merged["http://e/a"]
    assert "http://v/p" in node and "http://v/q" in node
    assert set(node_map) == {MERGED_GRAPH}


def test_graph_keyword_alias():
    doc = {
        "@context": {"graph": "@graph", "@vocab": "http://v/"},
        "graph": [{"@id": "http://e/1", "p": "v"}],
    }
    assert expand(doc) == [{"@id": "http://e/1", "http://v/p": [{"@value": "v"}]}]


def test_scoped_context_in_subtree():
    # a nested node's @context applies only within that subtree
    doc = {
        "@context": {"p": "http://outer/p"},
        "@id": "http://e/1",
        "p": {
            "@context": {"p": "http://inner/p"},
            "@id": "http://e/2",
            "p": "deep",
        },
    }
    out = expand(doc)[0]
    inner = out["http://outer/p"][0]
    assert inner["http://inner/p"] == [{"@value": "deep"}]
    # sibling after the nested node still uses the outer mapping
    doc2 = {
        "@context": {"p": "http://outer/p", "q": "http://outer/q"},
        "@id": "http://e/1",
        "p": {"@context": {"q": "http://inner/q"}, "@id": "http://e/2"},
        "q": "outer still",
    }
    out2 = expand(doc2)[0]
    assert out2["http://outer/q"] == [{"@value": "outer still"}]


def test_compact_reattaches_remote_style_context():
    ctx = {"@context": {"name": "http://v/name"}}
    out = compact({"@id": "http://e/1", "http://v/name": "x"}, ctx)
    assert out["@context"] == {"name": "http://v/name"}
    assert out["name"] == "x"


def test_php_loose_equals_comparison_table():
    """php_loose_equals mirrors pre-PHP-8 loose == (frame matcher's
    in_array, Processor.php:2736; php>=5.3, composer.json:17)."""
    from jsonld_spark.kernel.util import php_loose_equals as eq

    # number vs string: prefix conversion ("abc" -> 0, "10abc" -> 10)
    assert eq("5", 5) and eq(5, "5") and eq("1e3", 1000) and eq("10abc", 10)
    assert eq("abc", 0) and eq(" 5", 5)
    # string vs string: numeric only when BOTH numeric, else bytes
    assert eq("1e3", "1000") and eq("05", "5.0") and not eq("abc", "abd")
    assert not eq("5 ", "05")  # trailing whitespace: not numeric pre-PHP-8
    # bool converts the other side
    assert eq(True, 1) and eq(True, "abc") and not eq(True, "0")
    assert eq(False, 0) and eq(False, "0") and eq(False, "")
    # null: "" for strings, falsy otherwise, but NOT "0"
    assert eq(None, None) and eq(None, 0) and eq(None, "") and eq(None, False)
    assert not eq(None, "0") and not eq(None, "abc") and not eq(None, 5)
    # non-scalars never equal scalars
    assert not eq({"a": 1}, 1) and not eq([1], 1)


def test_frame_explicit_value_matches_loosely():
    """Explicit {"@value": ...} frames go through the array-wrapped
    loose path; raw scalar frames stay strict (Processor.php:666-671
    vs :2678)."""
    import json

    from jsonld_spark.kernel import api

    doc = json.dumps({"@context": {"ex": "http://example.com/"},
                      "@id": "ex:a", "ex:p": 5})
    loose = json.dumps({"@context": {"ex": "http://example.com/"},
                        "ex:p": {"@value": "5"}})
    strict = json.dumps({"@context": {"ex": "http://example.com/"},
                         "ex:p": "5"})
    assert api.frame(doc, loose)["@graph"], "explicit @value must match loosely"
    assert not api.frame(doc, strict)["@graph"], "raw scalar must stay strict"

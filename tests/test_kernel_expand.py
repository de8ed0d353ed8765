"""Tier-1: expansion kernel vs reference fixtures + spec cases.

The reference validates expansion against the W3C suite
(/root/reference/Test/W3CTestSuiteTest.php:76-93) with
key-order-insensitive JSON equality (JsonTestCase.php:29-63); Python
dict equality is already key-order-insensitive so plain == suffices.
"""

from __future__ import annotations

import pytest

from jsonld_spark.kernel import JsonLdError, expand
from tests.conftest import load_reference_fixture

BASE = "http://example.com/doc"


def test_sample_fixture_roundtrip():
    doc = load_reference_fixture("sample-in.jsonld")
    expected = load_reference_fixture("sample-expanded.jsonld")
    assert expand(doc, base=BASE) == expected


def test_scalar_values_wrap_and_coerce():
    doc = {
        "@context": {
            "name": "http://xmlns.com/foaf/0.1/name",
            "age": {"@id": "http://ex.org/age", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
            "homepage": {"@id": "http://xmlns.com/foaf/0.1/homepage", "@type": "@id"},
        },
        "@id": "http://ex.org/john",
        "name": "John",
        "age": 41,
        "homepage": "http://ex.org/john/home",
    }
    assert expand(doc) == [
        {
            "@id": "http://ex.org/john",
            "http://ex.org/age": [
                {"@value": 41, "@type": "http://www.w3.org/2001/XMLSchema#integer"}
            ],
            "http://xmlns.com/foaf/0.1/homepage": [{"@id": "http://ex.org/john/home"}],
            "http://xmlns.com/foaf/0.1/name": [{"@value": "John"}],
        }
    ]


def test_default_language_applies_to_strings_only():
    doc = {
        "@context": {"@language": "en", "@vocab": "http://v/"},
        "@id": "http://ex.org/1",
        "label": ["hi", 7],
    }
    assert expand(doc) == [
        {
            "@id": "http://ex.org/1",
            "http://v/label": [{"@value": "hi", "@language": "en"}, {"@value": 7}],
        }
    ]


def test_language_container_map_lowercases_tags():
    doc = {
        "@context": {"label": {"@id": "http://v/label", "@container": "@language"}},
        "@id": "http://ex.org/1",
        "label": {"EN": "hello", "de": ["hallo", "servus"]},
    }
    result = expand(doc)
    values = result[0]["http://v/label"]
    # keys iterate sorted: EN < de
    assert values == [
        {"@value": "hello", "@language": "en"},
        {"@value": "hallo", "@language": "de"},
        {"@value": "servus", "@language": "de"},
    ]


def test_index_container_map():
    doc = {
        "@context": {"prop": {"@id": "http://v/p", "@container": "@index"}},
        "@id": "http://ex.org/1",
        "prop": {"b": "two", "a": "one"},
    }
    assert expand(doc)[0]["http://v/p"] == [
        {"@value": "one", "@index": "a"},
        {"@value": "two", "@index": "b"},
    ]


def test_list_container_and_explicit_list():
    doc = {
        "@context": {"seq": {"@id": "http://v/seq", "@container": "@list"}},
        "@id": "http://ex.org/1",
        "seq": [1, 2],
        "http://v/other": {"@list": ["a"]},
    }
    out = expand(doc)[0]
    assert out["http://v/seq"] == [{"@list": [{"@value": 1}, {"@value": 2}]}]
    assert out["http://v/other"] == [{"@list": [{"@value": "a"}]}]


def test_list_of_lists_raises():
    doc = {
        "@context": {"seq": {"@id": "http://v/seq", "@container": "@list"}},
        "@id": "http://ex.org/1",
        "seq": [[1]],
    }
    with pytest.raises(JsonLdError) as err:
        expand(doc)
    assert err.value.code == JsonLdError.LIST_OF_LISTS


def test_set_is_elided_and_nulls_dropped():
    doc = {
        "@id": "http://ex.org/1",
        "http://v/p": {"@set": ["a", None, "b"]},
        "http://v/q": None,
        "http://v/r": {"@value": None},
    }
    assert expand(doc) == [
        {"@id": "http://ex.org/1", "http://v/p": [{"@value": "a"}, {"@value": "b"}]}
    ]


def test_free_floating_nodes_dropped():
    # scalar at top level, value object at top level, @id-only node
    assert expand('"free floating"') == []  # strings are parsed as JSON text
    assert expand({"@value": "v", "@language": "en"}) == []
    assert expand({"@id": "http://ex.org/1"}) == []
    # a top-level @list is also free-floating
    assert expand({"@list": ["a"]}) == []


def test_reverse_term_and_keyword():
    doc = {
        "@context": {
            "children": {"@reverse": "http://v/parent"},
        },
        "@id": "http://ex.org/mom",
        "children": [{"@id": "http://ex.org/kid"}],
        "@reverse": {"http://v/knows": {"@id": "http://ex.org/friend"}},
    }
    out = expand(doc)[0]
    assert out["@id"] == "http://ex.org/mom"
    rev = out["@reverse"]
    assert rev["http://v/parent"] == [{"@id": "http://ex.org/kid"}]
    assert rev["http://v/knows"] == [{"@id": "http://ex.org/friend"}]


def test_reverse_value_object_raises():
    doc = {
        "@context": {"children": {"@reverse": "http://v/parent"}},
        "@id": "http://ex.org/mom",
        "children": "just a string",
    }
    with pytest.raises(JsonLdError) as err:
        expand(doc)
    assert err.value.code == JsonLdError.INVALID_REVERSE_PROPERTY_VALUE


def test_relative_iri_vs_vocab():
    doc = {
        "@context": {"@vocab": "http://vocab/"},
        "@id": "relative/node",
        "term": "x",
        "@type": "RelType",
    }
    out = expand(doc, base="http://base.org/dir/doc.jsonld")
    assert out == [
        {
            "@id": "http://base.org/dir/relative/node",
            "@type": ["http://vocab/RelType"],
            "http://vocab/term": [{"@value": "x"}],
        }
    ]


def test_base_manipulation_in_context():
    doc = {
        "@context": [{"@base": "http://other.org/a/b"}, {"@base": "sub/"}],
        "@id": "x",
        "http://v/p": "v",
    }
    assert expand(doc, base="http://orig.org/")[0]["@id"] == "http://other.org/a/sub/x"


def test_keyword_aliases():
    doc = {
        "@context": {"id": "@id", "type": "@type", "value": "@value"},
        "id": "http://ex.org/1",
        "type": "http://ex.org/T",
        "http://v/p": {"value": "lit"},
    }
    assert expand(doc) == [
        {
            "@id": "http://ex.org/1",
            "@type": ["http://ex.org/T"],
            "http://v/p": [{"@value": "lit"}],
        }
    ]


def test_term_chain_and_curie():
    doc = {
        "@context": {
            "ex": "http://example.org/",
            "a": {"@id": "ex:a"},
            "b": "a",  # term chaining resolves through "a"
        },
        "@id": "http://ex.org/1",
        "b": "v",
        "ex:direct": "w",
    }
    out = expand(doc)[0]
    assert out["http://example.org/a"] == [{"@value": "v"}]
    assert out["http://example.org/direct"] == [{"@value": "w"}]


def test_cyclic_context_raises():
    doc = {
        "@context": {"a": "b", "b": "a"},
        "@id": "http://ex.org/1",
        "a": "v",
    }
    with pytest.raises(JsonLdError) as err:
        expand(doc)
    assert err.value.code == JsonLdError.CYCLIC_IRI_MAPPING


def test_null_term_drops_property():
    doc = {
        "@context": {"@vocab": "http://v/", "secret": None},
        "@id": "http://ex.org/1",
        "secret": "hidden",
        "kept": "shown",
    }
    out = expand(doc)[0]
    assert "http://v/secret" not in out
    assert out["http://v/kept"] == [{"@value": "shown"}]


def test_colliding_keywords_raise():
    doc = {
        "@context": {"id": "@id"},
        "id": "http://ex.org/1",
        "@id": "http://ex.org/2",
        "http://v/p": "v",
    }
    with pytest.raises(JsonLdError) as err:
        expand(doc)
    assert err.value.code == JsonLdError.COLLIDING_KEYWORDS


def test_type_list_merges_unique():
    doc = {
        "@id": "http://ex.org/1",
        "@type": ["http://ex.org/T1", "http://ex.org/T2"],
        "http://v/p": "v",
    }
    assert expand(doc)[0]["@type"] == ["http://ex.org/T1", "http://ex.org/T2"]


def test_expand_context_option():
    doc = {"@id": "http://ex.org/1", "name": "n"}
    ctx = {"@context": {"name": "http://v/name"}}
    assert expand(doc, expand_context=ctx) == [
        {"@id": "http://ex.org/1", "http://v/name": [{"@value": "n"}]}
    ]


def test_graph_keyword_and_nested_nodes():
    doc = {
        "@context": {"@vocab": "http://v/"},
        "@graph": [
            {"@id": "http://ex.org/1", "knows": {"@id": "http://ex.org/2", "name": "two"}}
        ],
    }
    out = expand(doc)
    assert out == [
        {
            "@id": "http://ex.org/1",
            "http://v/knows": [
                {"@id": "http://ex.org/2", "http://v/name": [{"@value": "two"}]}
            ],
        }
    ]

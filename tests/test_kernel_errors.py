"""Tier-1: spec error-code taxonomy (the reference's negative tests,
Test/W3CTestSuiteTest.php:224-244; codes Exception/JsonLdException.php)."""

from __future__ import annotations

import pytest

from jsonld_spark.kernel import JsonLdError, expand, to_rdf_quads
from jsonld_spark.kernel.api import compact


def err(code):
    return pytest.raises(JsonLdError)


CASES = [
    # (name, document, expected code)
    ("invalid @id value", {"@id": 42, "http://v/p": "x"}, JsonLdError.INVALID_ID_VALUE),
    ("invalid type value", {"@id": "http://e/1", "@type": {"@id": "x"}, "http://v/p": "v"},
     JsonLdError.INVALID_TYPE_VALUE),
    ("invalid value object value", {"http://v/p": {"@value": {"nested": True}}},
     JsonLdError.INVALID_VALUE_OBJECT_VALUE),
    ("invalid language-tagged string",
     {"http://v/p": {"@value": "x", "@language": 42}},
     JsonLdError.INVALID_LANGUAGE_TAGGED_STRING),
    ("invalid language-tagged value",
     {"http://v/p": {"@value": 7, "@language": "en"}},
     JsonLdError.INVALID_LANGUAGE_TAGGED_VALUE),
    ("invalid typed value",
     {"http://v/p": {"@value": "x", "@type": "not-an-iri"}},
     JsonLdError.INVALID_TYPED_VALUE),
    ("invalid value object (extra members)",
     {"http://v/p": {"@value": "x", "http://v/other": "y"}},
     JsonLdError.INVALID_VALUE_OBJECT),
    ("invalid set/list object",
     {"@id": "http://e/1", "http://v/p": {"@list": ["a"], "http://v/q": "b"}},
     JsonLdError.INVALID_SET_OR_LIST_OBJECT),
    ("list of lists",
     {"@id": "http://e/1", "http://v/p": {"@list": [{"@list": ["a"]}]}},
     JsonLdError.LIST_OF_LISTS),
    ("invalid reverse value",
     {"@id": "http://e/1", "@reverse": "not an object"},
     JsonLdError.INVALID_REVERSE_VALUE),
    ("invalid reverse property value",
     {"@id": "http://e/1", "@reverse": {"http://v/p": [{"@value": "lit"}]}},
     JsonLdError.INVALID_REVERSE_PROPERTY_VALUE),
    ("keywords in reverse map",
     {"@id": "http://e/1", "@reverse": {"@type": "http://e/T"}},
     JsonLdError.INVALID_REVERSE_PROPERTY_MAP),
    ("invalid index value",
     {"@id": "http://e/1", "http://v/p": "v", "@index": 42},
     JsonLdError.INVALID_INDEX_VALUE),
    ("invalid language map value",
     {"@context": {"l": {"@id": "http://v/l", "@container": "@language"}},
      "@id": "http://e/1", "l": {"en": 42}},
     JsonLdError.INVALID_LANGUAGE_MAP_VALUE),
]

CONTEXT_CASES = [
    ("keyword redefinition", {"@value": "http://v/x"}, JsonLdError.KEYWORD_REDEFINITION),
    ("invalid base IRI", {"@base": 42}, JsonLdError.INVALID_BASE_IRI),
    ("invalid vocab mapping", {"@vocab": "no-colon"}, JsonLdError.INVALID_VOCAB_MAPPING),
    ("invalid default language", {"@language": 42}, JsonLdError.INVALID_DEFAULT_LANGUAGE),
    ("invalid term definition", {"t": 42}, JsonLdError.INVALID_TERM_DEFINITION),
    ("invalid IRI mapping", {"t": {"@id": 42}}, JsonLdError.INVALID_IRI_MAPPING),
    ("unresolvable term", {"t": "noprefix"}, JsonLdError.INVALID_IRI_MAPPING),
    ("reverse with @id", {"t": {"@reverse": "http://v/p", "@id": "http://v/q"}},
     JsonLdError.INVALID_REVERSE_PROPERTY),
    ("reverse with list container",
     {"t": {"@reverse": "http://v/p", "@container": "@list"}},
     JsonLdError.INVALID_REVERSE_PROPERTY),
    ("invalid container", {"t": {"@id": "http://v/p", "@container": "@bogus"}},
     JsonLdError.INVALID_CONTAINER_MAPPING),
    ("invalid type mapping", {"t": {"@id": "http://v/p", "@type": 42}},
     JsonLdError.INVALID_TYPE_MAPPING),
    ("context alias for @context", {"t": {"@id": "@context"}},
     JsonLdError.INVALID_KEYWORD_ALIAS),
    ("invalid local context", "relative-url-with-no-base", JsonLdError.INVALID_BASE_IRI),
]


@pytest.mark.parametrize("name,doc,code", CASES, ids=[c[0] for c in CASES])
def test_expansion_error_codes(name, doc, code):
    with pytest.raises(JsonLdError) as excinfo:
        expand(doc)
    assert excinfo.value.code == code


@pytest.mark.parametrize("name,ctx,code", CONTEXT_CASES, ids=[c[0] for c in CONTEXT_CASES])
def test_context_error_codes(name, ctx, code):
    with pytest.raises(JsonLdError) as excinfo:
        expand({"@context": ctx, "@id": "http://e/1", "http://v/p": "v"})
    assert excinfo.value.code == code


def test_conflicting_indexes():
    doc = [
        {"@id": "http://e/1", "@index": "a", "http://v/p": "v"},
        {"@id": "http://e/1", "@index": "b", "http://v/q": "w"},
    ]
    with pytest.raises(JsonLdError) as excinfo:
        to_rdf_quads(doc)
    assert excinfo.value.code == JsonLdError.CONFLICTING_INDEXES


def test_compaction_to_list_of_lists():
    ctx = {"seq": {"@id": "http://v/seq", "@container": "@list"}}
    doc = {
        "@id": "http://e/1",
        "http://v/seq": [{"@list": ["a"]}, {"@list": ["b"]}],
    }
    with pytest.raises(JsonLdError) as excinfo:
        compact(expand(doc), {"@context": ctx})
    assert excinfo.value.code == JsonLdError.COMPACTION_TO_LIST_OF_LISTS
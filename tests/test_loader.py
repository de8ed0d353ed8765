"""Tier-1: driver-side document loading / context catalog."""

from __future__ import annotations

import json

import pytest

from jsonld_spark.kernel import JsonLdError, expand
from jsonld_spark.sources.loader import CachingLoader, resolve_context_catalog


def test_pinned_remote_context():
    loader = CachingLoader(pinned={
        "http://ctx.example/v1": {"@context": {"name": "http://v/name"}},
    })
    doc = {"@context": "http://ctx.example/v1", "@id": "http://e/1", "name": "x"}
    out = expand(doc, loader=loader)
    assert out == [{"@id": "http://e/1", "http://v/name": [{"@value": "x"}]}]
    # memoized: a second expansion does not re-fetch
    expand(doc, loader=loader)
    assert loader.fetch_count == 1


def test_file_fetcher(tmp_path):
    path = tmp_path / "ctx.jsonld"
    path.write_text(json.dumps({"@context": {"p": "http://v/p"}}))
    loader = CachingLoader()
    doc = {"@context": f"file://{path}", "@id": "http://e/1", "p": "v"}
    assert expand(doc, loader=loader)[0]["http://v/p"] == [{"@value": "v"}]


def test_unloadable_context_raises():
    loader = CachingLoader()
    doc = {"@context": "http://unpinned.example/ctx", "@id": "http://e/1"}
    with pytest.raises(JsonLdError) as err:
        expand(doc, loader=loader)
    assert err.value.code == JsonLdError.LOADING_REMOTE_CONTEXT_FAILED


def test_recursive_remote_context_detected():
    loader = CachingLoader(pinned={
        "http://a/ctx": {"@context": "http://b/ctx"},
        "http://b/ctx": {"@context": "http://a/ctx"},
    })
    doc = {"@context": "http://a/ctx", "@id": "http://e/1", "http://v/p": "v"}
    with pytest.raises(JsonLdError) as err:
        expand(doc, loader=loader)
    assert err.value.code == JsonLdError.RECURSIVE_CONTEXT_INCLUSION


def test_link_header_parsing():
    from jsonld_spark.sources.loader import context_url_from_links, parse_link_header

    header = (
        '<http://ctx.example/v1>; rel="http://www.w3.org/ns/json-ld#context"; '
        'type="application/ld+json", <http://alt.example/doc>; rel="alternate"'
    )
    links = parse_link_header(header)
    assert links[0]["target"] == "http://ctx.example/v1"
    assert links[0]["type"] == "application/ld+json"
    assert links[1]["rel"] == "alternate"
    assert context_url_from_links(header) == "http://ctx.example/v1"
    assert context_url_from_links('<http://x>; rel="other"') is None


def test_resolve_context_catalog():
    loader = CachingLoader(pinned={
        "http://ctx.example/shared": {"@context": {"@vocab": "http://shared/"}},
    })
    catalog = resolve_context_catalog(
        {
            "inline": {"name": "http://v/name"},
            "remote": "http://ctx.example/shared",
        },
        loader=loader,
    )
    assert catalog["inline"]["name"]["@id"] == "http://v/name"
    assert catalog["remote"]["@vocab"] == "http://shared/"

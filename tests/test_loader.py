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


# --- HttpDocumentLoader (injectable transport; no network in sandbox) ---

def _fake_transport(responses):
    """responses: url -> (final_url, media_type, link_headers, body)."""
    calls = []

    def transport(url):
        calls.append(url)
        if url not in responses:
            raise OSError(f"connection refused: {url}")
        return responses[url]

    transport.calls = calls
    return transport


def test_http_loader_plain_ldjson():
    from jsonld_spark.sources.loader import HttpDocumentLoader

    t = _fake_transport({
        "http://e.com/doc": ("http://e.com/doc", "application/ld+json", [],
                             '{"@id": "http://e.com/n"}'),
    })
    doc = HttpDocumentLoader(transport=t).load_document("http://e.com/doc")
    assert doc.document == {"@id": "http://e.com/n"}
    assert doc.media_type == "application/ld+json"
    assert doc.context_url is None


def test_http_loader_context_link_and_redirect_base():
    """A plain-JSON response with a RELATIVE context Link target must
    resolve against the post-redirect URL (FileGetContentsLoader.php
    redirect-aware base)."""
    from jsonld_spark.sources.loader import HttpDocumentLoader

    t = _fake_transport({
        "http://e.com/doc": (
            "http://cdn.e.com/real/doc.json", "application/json",
            ['<ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"'],
            '{"name": "x"}'),
    })
    doc = HttpDocumentLoader(transport=t).load_document("http://e.com/doc")
    assert doc.context_url == "http://cdn.e.com/real/ctx.jsonld"
    assert doc.document == {"name": "x"}


def test_http_loader_follows_single_alternate():
    """schema.org pattern: text/html + Link rel=alternate
    type=application/ld+json is followed (FileGetContentsLoader.php:111-127)."""
    from jsonld_spark.sources.loader import HttpDocumentLoader

    t = _fake_transport({
        "http://e.com/page": (
            "http://e.com/page", "text/html",
            ['<http://e.com/data.jsonld>; rel="alternate"; type="application/ld+json"'],
            "<html/>"),
        "http://e.com/data.jsonld": (
            "http://e.com/data.jsonld", "application/ld+json", [],
            '{"@id": "http://e.com/n"}'),
    })
    doc = HttpDocumentLoader(transport=t).load_document("http://e.com/page")
    assert doc.document_url == "http://e.com/data.jsonld"
    assert doc.document == {"@id": "http://e.com/n"}
    assert t.calls == ["http://e.com/page", "http://e.com/data.jsonld"]


def test_http_loader_error_taxonomy():
    import pytest

    from jsonld_spark.kernel.exceptions import JsonLdError
    from jsonld_spark.sources.loader import HttpDocumentLoader

    cases = {
        # multiple context links
        "http://e.com/multi-ctx": (
            "http://e.com/multi-ctx", "application/json",
            ['<a>; rel="http://www.w3.org/ns/json-ld#context"',
             '<b>; rel="http://www.w3.org/ns/json-ld#context"'],
            "{}"),
        # multiple alternates
        "http://e.com/multi-alt": (
            "http://e.com/multi-alt", "text/html",
            ['<a>; rel="alternate"; type="application/ld+json"',
             '<b>; rel="alternate"; type="application/ld+json"'],
            "<html/>"),
        # invalid media type, no alternate
        "http://e.com/bad-type": (
            "http://e.com/bad-type", "text/plain", [], "hi"),
    }
    loader = HttpDocumentLoader(transport=_fake_transport(cases))
    with pytest.raises(JsonLdError) as e:
        loader.load_document("http://e.com/multi-ctx")
    assert e.value.code == "multiple context link headers"
    for url in ("http://e.com/multi-alt", "http://e.com/bad-type",
                "http://e.com/unreachable"):
        with pytest.raises(JsonLdError) as e:
            loader.load_document(url)
        assert e.value.code == "loading document failed"


def test_http_loader_inline_json_passthrough():
    from jsonld_spark.sources.loader import HttpDocumentLoader

    doc = HttpDocumentLoader(transport=_fake_transport({})).load_document(
        ' {"@id": "http://e.com/x"}'
    )
    assert doc.document == {"@id": "http://e.com/x"}


def test_http_loader_feeds_caching_loader():
    """HttpDocumentLoader plugs into CachingLoader.fetchers — the
    production wiring for remote contexts, memoized on the driver."""
    from jsonld_spark.sources.loader import HttpDocumentLoader

    t = _fake_transport({
        "http://ctx.example/v1": ("http://ctx.example/v1", "application/ld+json",
                                  [], '{"@context": {"@vocab": "http://v/"}}'),
    })
    caching = CachingLoader(fetchers=(HttpDocumentLoader(transport=t),))
    assert caching("http://ctx.example/v1")["@context"]["@vocab"] == "http://v/"
    caching("http://ctx.example/v1")
    assert t.calls == ["http://ctx.example/v1"]  # memoized

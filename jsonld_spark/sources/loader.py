"""Driver-side document/context loading with pre-fetch + broadcast.

The reference fetches remote contexts lazily over HTTP from inside the
processor (FileGetContentsLoader.php:25-150, with Accept headers and
HTTP Link rel=context handling). A distributed engine must never do
network I/O in executors (SURVEY.md §2.1), so loading is restructured:

* ``CachingLoader`` resolves documents on the driver, once per URL,
  from pluggable sources (in-memory dict for pinned contexts, file://
  or plain paths; HTTP intentionally unsupported in this sandbox — a
  production deployment plugs an HTTP fetcher into ``fetchers``).
* ``resolve_context_catalog`` pre-resolves every context a corpus
  references into plain dicts, ready to broadcast; executors only ever
  see resolved active contexts.
"""

from __future__ import annotations

import json
import os

from jsonld_spark.kernel.context import initial_context, process_context
from jsonld_spark.kernel.exceptions import JsonLdError


class RemoteDocument:
    """(documentUrl, mediaType, contextUrl, document) tuple
    (reference: RemoteDocument.php:1-57)."""

    __slots__ = ("document_url", "media_type", "context_url", "document")

    def __init__(self, document_url, document, media_type="application/ld+json",
                 context_url=None):
        self.document_url = document_url
        self.document = document
        self.media_type = media_type
        self.context_url = context_url


def _file_fetcher(url: str):
    path = url[len("file://"):] if url.startswith("file://") else url
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


class CachingLoader:
    """Memoizing driver-side loader usable as the kernel ``loader=``
    callable. ``pinned`` maps URL -> parsed document (the way a
    production pipeline pins/vendors well-known contexts)."""

    def __init__(self, pinned: dict | None = None, fetchers=( _file_fetcher,)):
        self.pinned = dict(pinned or {})
        self.fetchers = list(fetchers)
        self.cache: dict = {}
        self.fetch_count = 0

    def __call__(self, url: str):
        if url in self.cache:
            return self.cache[url]
        if url in self.pinned:
            doc = self.pinned[url]
        else:
            doc = None
            for fetch in self.fetchers:
                doc = fetch(url)
                if doc is not None:
                    break
            if doc is None:
                raise JsonLdError(
                    JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                    f"cannot load {url}: not pinned and no fetcher succeeded "
                    "(executors never fetch; pin contexts on the driver)",
                )
        self.fetch_count += 1
        self.cache[url] = doc
        return doc


def parse_link_header(header: str) -> list[dict]:
    """Parse an HTTP Link header into [{target, rel?, type?, ...}].

    The reference uses Link rel="http://www.w3.org/ns/json-ld#context"
    to attach out-of-band contexts to plain JSON responses
    (FileGetContentsLoader.php:73-118, parser 156-197). This is the
    driver-side half of that behavior; the resulting context URL feeds
    ``CachingLoader`` like any other.
    """
    import re

    links = []
    for match in re.finditer(r"<([^>]*)>((?:\s*;\s*[A-Za-z0-9-]+=(?:\"[^\"]*\"|[^,;\s]+))*)", header):
        link = {"target": match.group(1)}
        for param in re.finditer(r";\s*([A-Za-z0-9-]+)=(?:\"([^\"]*)\"|([^,;\s]+))", match.group(2)):
            key = param.group(1).lower()
            link[key] = param.group(2) if param.group(2) is not None else param.group(3)
        links.append(link)
    return links


JSONLD_CONTEXT_REL = "http://www.w3.org/ns/json-ld#context"


def context_url_from_links(header: str) -> str | None:
    """The context URL advertised by a Link header, if any."""
    for link in parse_link_header(header):
        if link.get("rel") == JSONLD_CONTEXT_REL:
            return link["target"]
    return None


def resolve_context_catalog(contexts: dict, base: str | None = None,
                            loader: CachingLoader | None = None) -> dict:
    """Resolve a catalog of named contexts (values may be inline dicts
    or URLs) into plain active-context dicts — the broadcastable form
    the kernel stages consume (one resolution per distinct context,
    never per row)."""
    loader = loader or CachingLoader()
    resolved = {}
    for name, ctx in contexts.items():
        activectx = initial_context(base)
        if isinstance(ctx, str):
            ctx = [ctx]  # remote reference; process_context fetches via loader
        process_context(ctx, activectx, base_iri=base, loader=loader)
        resolved[name] = dict(activectx)
    return resolved

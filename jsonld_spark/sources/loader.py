"""Driver-side document/context loading with pre-fetch + broadcast.

The reference fetches remote contexts lazily over HTTP from inside the
processor (FileGetContentsLoader.php:25-150, with Accept headers and
HTTP Link rel=context handling). A distributed engine must never do
network I/O in executors (SURVEY.md §2.1), so loading is restructured:

* ``CachingLoader`` resolves documents on the driver, once per URL,
  from pluggable sources (in-memory dict for pinned contexts, file://
  or plain paths, or ``HttpDocumentLoader`` — whose transport is
  injectable because this sandbox has no network).
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


ACCEPT_HEADER = "application/ld+json, application/json; q=0.9, */*; q=0.1"
REMOTE_TIMEOUT = 10  # seconds (reference: Processor.php:26)


def urllib_transport(url: str):
    """Default HTTP transport: (final_url, media_type, link_headers,
    body). Split out so the sandbox (no network) and tests inject a
    fake; a production driver uses this one as-is."""
    from urllib.request import Request, urlopen  # driver-side only

    req = Request(url, headers={"Accept": ACCEPT_HEADER,
                                "User-Agent": "jsonld-spark"})
    with urlopen(req, timeout=REMOTE_TIMEOUT) as resp:  # noqa: S310
        media_type = (resp.headers.get_content_type()
                      if resp.headers else None)
        links = resp.headers.get_all("Link") if resp.headers else []
        return resp.geturl(), media_type, list(links or []), resp.read().decode("utf-8")


class HttpDocumentLoader:
    """Driver-side HTTP document loader mirroring the reference's
    FileGetContentsLoader.loadDocument (FileGetContentsLoader.php:25-150):

    * inline JSON input (leading ``{``/``[``) is parsed directly;
    * the Accept header offers ld+json > json > anything (:34);
    * redirects re-base relative Link targets (final URL wins);
    * ``Link rel="http://www.w3.org/ns/json-ld#context"`` attaches an
      out-of-band context URL (exactly one allowed, :83-96);
    * a non-ld+json media type with a single
      ``Link rel=alternate; type=application/ld+json`` header is
      FOLLOWED recursively (:111-127 — the schema.org pattern);
    * other media types must be application/json or ``+json`` (:129-137).

    The transport is injectable; executors never use this class — it
    feeds ``CachingLoader``/``resolve_context_catalog`` on the driver.
    """

    def __init__(self, transport=urllib_transport, max_redirects: int = 5):
        self.transport = transport
        self.max_redirects = max_redirects

    def load_document(self, url: str, _depth: int = 0) -> RemoteDocument:
        text = url.strip()
        if text[:1] in ("{", "["):
            return RemoteDocument(url, json.loads(text))
        if _depth > self.max_redirects:
            raise JsonLdError(JsonLdError.LOADING_DOCUMENT_FAILED,
                              f"too many alternate-link redirects loading {url}")
        try:
            final_url, media_type, link_headers, body = self.transport(url)
        except JsonLdError:
            raise
        except Exception as exc:
            raise JsonLdError(
                JsonLdError.LOADING_DOCUMENT_FAILED,
                f'Unable to load the remote document "{url}": {exc}',
            ) from exc

        links = []
        for header in link_headers:
            links.extend(parse_link_header(header))
        from jsonld_spark.kernel.iri import iri_resolve

        for link in links:
            link["target"] = iri_resolve(final_url, link["target"])

        doc = RemoteDocument(final_url, None, media_type=media_type)
        context_links = [
            ln for ln in links
            if JSONLD_CONTEXT_REL in (ln.get("rel") or "").split(" ")
        ]
        if len(context_links) == 1:
            doc.context_url = context_links[0]["target"]
        elif len(context_links) > 1:
            raise JsonLdError(JsonLdError.MULTIPLE_CONTEXT_LINK_HEADERS,
                              "Found multiple contexts in HTTP Link headers")

        if media_type:
            media_type = media_type.split(";", 1)[0].strip()
            doc.media_type = media_type
            if media_type == "application/ld+json":
                doc.context_url = None
            else:
                alternates = [
                    ln for ln in links
                    if ln.get("rel") == "alternate"
                    and ln.get("type") == "application/ld+json"
                ]
                if len(alternates) == 1:
                    return self.load_document(alternates[0]["target"], _depth + 1)
                if len(alternates) > 1:
                    raise JsonLdError(JsonLdError.LOADING_DOCUMENT_FAILED,
                                      "Received multiple alternate link headers")
                if media_type != "application/json" and not media_type.endswith("+json"):
                    raise JsonLdError(JsonLdError.LOADING_DOCUMENT_FAILED,
                                      f"Invalid media type: {media_type}")

        doc.document = json.loads(body)
        return doc

    def __call__(self, url: str):
        """CachingLoader-fetcher shape: return just the parsed document."""
        return self.load_document(url).document


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

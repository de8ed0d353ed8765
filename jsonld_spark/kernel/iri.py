"""RFC 3986/3987 IRI parsing, resolution and classification.

The reference delegates this to the external ``ml/iri`` package
(reference: composer.json:19; call sites Processor.php:904, 1256).
That library parses with the RFC 3986 Appendix B regex, so a "scheme"
is any run of non-``:/?#`` characters before the first colon — which
is what makes ``_:b0`` parse as an IRI with scheme ``_`` (used by the
N-Quads serializer to detect blank nodes, reference: NQuads.php:29-31).
``isAbsolute`` is "has a scheme". We mirror both choices exactly.

Implemented from the public RFC 3986 algorithms (sections 5.2/5.3);
no code is taken from the reference or its dependencies.
"""

from __future__ import annotations

import re
from functools import lru_cache

# RFC 3986 Appendix B, with the scheme part constrained to non-:/?# runs.
_RFC3986 = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.S,
)


@lru_cache(maxsize=65536)
def iri_parse(iri: str):
    """Split an IRI into (scheme, authority, path, query, fragment).

    Components absent from the input are None (matching RFC 3986's
    "defined vs undefined" distinction, which matters for resolution).
    """
    m = _RFC3986.match(iri)
    # The regex matches any string; groups are None when absent.
    scheme, authority, path, query, fragment = m.groups()
    return scheme, authority, path if path is not None else "", query, fragment


def iri_scheme(iri: str) -> str | None:
    return iri_parse(iri)[0]


def is_absolute_iri(value) -> bool:
    """True when the value parses with a scheme (mirrors ml/iri
    ``isAbsolute``, which the reference uses to gate quad emission,
    Processor.php:2146-2180)."""
    if not isinstance(value, str):
        return False
    return iri_parse(value)[0] is not None


def _merge_paths(base_authority, base_path: str, ref_path: str) -> str:
    # RFC 3986 section 5.3 "merge"
    if base_authority is not None and base_path == "":
        return "/" + ref_path
    idx = base_path.rfind("/")
    if idx < 0:
        return ref_path
    return base_path[: idx + 1] + ref_path


def remove_dot_segments(path: str) -> str:
    # RFC 3986 section 5.2.4
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                nxt = path.find("/", 1)
            else:
                nxt = path.find("/")
            if nxt < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:nxt])
                path = path[nxt:]
    return "".join(out)


def _recompose(scheme, authority, path, query, fragment) -> str:
    # RFC 3986 section 5.3
    parts: list[str] = []
    if scheme is not None:
        parts.append(scheme)
        parts.append(":")
    if authority is not None:
        parts.append("//")
        parts.append(authority)
    parts.append(path)
    if query is not None:
        parts.append("?")
        parts.append(query)
    if fragment is not None:
        parts.append("#")
        parts.append(fragment)
    return "".join(parts)


def iri_relativize(base: str | None, iri: str) -> str:
    """Best relative reference for ``iri`` against ``base`` (the
    inverse of resolution; the reference delegates to ml/iri
    ``baseFor``, call site Processor.php:1256). Falls back to the
    absolute IRI when no shorter form round-trips."""
    if base is None:
        return iri
    b_scheme, b_auth, b_path, b_query, _ = iri_parse(base)
    i_scheme, i_auth, i_path, i_query, i_frag = iri_parse(iri)
    if b_scheme != i_scheme or i_scheme is None:
        return iri
    frag = "" if i_frag is None else "#" + i_frag
    query = "" if i_query is None else "?" + i_query
    if b_auth != i_auth:
        if i_auth is None:
            # authority-less IRI (e.g. "http:g"): any relative form would
            # re-resolve against the base's authority — not round-trippable
            return iri
        candidate = _recompose(None, i_auth, i_path, i_query, i_frag)
        return candidate if iri_resolve(base, candidate) == iri else iri
    if i_path == b_path:
        if i_query == b_query:
            return frag if frag else iri
        return query + frag
    # same authority: make the path relative to base's directory
    b_segs = b_path.split("/")
    i_segs = i_path.split("/")
    # drop the base's final segment (its "file")
    b_dir = b_segs[:-1]
    common = 0
    while common < len(b_dir) and common < len(i_segs) - 1 and b_dir[common] == i_segs[common]:
        common += 1
    ups = [".."] * (len(b_dir) - common)
    rel_segs = ups + i_segs[common:]
    rel = "/".join(rel_segs)
    if not rel:
        rel = "./"
    # a ':' in the first segment would parse as a scheme; guard with ./
    first = rel_segs[0] if rel_segs else ""
    if ":" in first:
        rel = "./" + rel
    candidate = rel + query + frag
    if iri_resolve(base, candidate) == iri:
        return candidate
    return iri


def iri_resolve(base: str | None, reference: str) -> str:
    """Resolve ``reference`` against ``base`` per RFC 3986 section 5.2.2.

    ``base=None`` returns the reference unchanged (the reference keeps
    relative IRIs untouched when no base is set, Processor.php:903-909).
    """
    if base is None:
        return reference
    r_scheme, r_auth, r_path, r_query, r_frag = iri_parse(reference)
    if r_scheme is not None:
        return _recompose(r_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag)
    b_scheme, b_auth, b_path, b_query, _ = iri_parse(base)
    if r_auth is not None:
        t = (b_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag)
    elif r_path == "":
        t = (b_scheme, b_auth, b_path, r_query if r_query is not None else b_query, r_frag)
    elif r_path.startswith("/"):
        t = (b_scheme, b_auth, remove_dot_segments(r_path), r_query, r_frag)
    else:
        merged = _merge_paths(b_auth, b_path, r_path)
        t = (b_scheme, b_auth, remove_dot_segments(merged), r_query, r_frag)
    return _recompose(*t)

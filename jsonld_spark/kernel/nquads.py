"""N-Quads serialization and parsing.

Mirrors the reference's serializer/parser (NQuads.php:25-175): blank
nodes print bare (``_:`` scheme), only ``\\n`` and ``"`` are escaped on
output, ``^^<type>`` is suppressed for implied xsd:string, language
literals print ``@lang``, and an optional 4th term carries the graph.
The parser uses the W3C n-quads grammar (blank-node label rules from
https://www.w3.org/TR/n-quads/#BNodes), the same structure the
reference adopted from DigitalBazaar's php-json-ld.
"""

from __future__ import annotations

import re

from jsonld_spark.kernel.exceptions import InvalidQuadError
from jsonld_spark.kernel.iri import iri_scheme
from jsonld_spark.kernel.rdf import Quad, XSD_STRING


def _term(iri: str) -> str:
    return iri if iri_scheme(iri) == "_" else f"<{iri}>"


def quad_to_line(quad: Quad) -> str:
    """Serialize one quad to its N-Quads line (without newline)."""
    parts = [_term(quad.subject), " ", _term(quad.predicate), " "]
    if quad.obj_kind == "iri":
        parts.append(_term(quad.obj_value))
    else:
        # bug-compat with the reference: only \n and " are escaped
        # (NQuads.php:44-47); backslashes pass through untouched
        escaped = quad.obj_value.replace("\n", "\\n").replace('"', '\\"')
        parts.append(f'"{escaped}"')
        if quad.obj_lang is not None:
            parts.append("@" + quad.obj_lang)
        elif quad.obj_type is not None and quad.obj_type != XSD_STRING:
            parts.append(f"^^<{quad.obj_type}>")
    parts.append(" ")
    if quad.graph:
        parts.append(_term(quad.graph))
        parts.append(" ")
    parts.append(".")
    return "".join(parts)


def nquads_serialize(quads) -> str:
    return "".join(quad_to_line(q) + "\n" for q in quads)


# --- parser ---------------------------------------------------------------

_IRI = r"(?:<([^>]*)>)"
_BNODE = r"(_:(?:[A-Za-z0-9_]|[A-Za-z0-9_][A-Za-z0-9_\-.]*[A-Za-z0-9_\-]))"
_PLAIN = r'"([^"\\]*(?:\\.[^"\\]*)*)"'
_DATATYPE = rf"\^\^{_IRI}"
_LANGUAGE = r"(?:@([a-z]+(?:-[a-z0-9]+)*))"
_LITERAL = rf"(?:{_PLAIN}(?:{_DATATYPE}|{_LANGUAGE})?)"
_WS = r"[ \t]"

QUAD_REGEX = re.compile(
    rf"^{_WS}*(?:{_IRI}|{_BNODE}){_WS}+{_IRI}{_WS}+"
    rf"(?:{_IRI}|{_BNODE}|{_LITERAL})(?:{_WS}+(?:{_IRI}|{_BNODE}))?{_WS}*\.{_WS}*$"
)
IGNORE_REGEX = re.compile(rf"^{_WS}*(?:#.*)?$")

_UNESCAPE = {'\\"': '"', "\\t": "\t", "\\n": "\n", "\\r": "\r", "\\\\": "\\"}
_UNESCAPE_RE = re.compile(r'\\(?:["tnr\\])')


def _unescape(value: str) -> str:
    return _UNESCAPE_RE.sub(lambda m: _UNESCAPE[m.group(0)], value)


def parse_line(line: str) -> Quad | None:
    """Parse a single N-Quads line; None for blank/comment lines."""
    if IGNORE_REGEX.match(line):
        return None
    m = QUAD_REGEX.match(line)
    if not m:
        raise InvalidQuadError(f"Error while parsing N-Quads. Invalid quad: {line}", line)
    g = m.groups()
    # groups: 1 subj-iri, 2 subj-bnode, 3 pred-iri, 4 obj-iri, 5 obj-bnode,
    #         6 literal, 7 datatype, 8 language, 9 graph-iri, 10 graph-bnode
    subject = g[0] if g[0] else g[1]
    predicate = g[2]
    if g[3]:
        obj = ("iri", g[3], None, None)
    elif g[4]:
        obj = ("iri", g[4], None, None)
    else:
        value = _unescape(g[5] if g[5] is not None else "")
        if g[6]:
            obj = ("literal", value, g[6], None)
        elif g[7]:
            obj = ("literal", value, None, g[7])
        else:
            obj = ("literal", value, XSD_STRING, None)
    graph = g[8] if g[8] else (g[9] if g[9] else None)
    return Quad(graph, subject, predicate, *obj)


def nquads_parse(text: str) -> list[Quad]:
    quads = []
    for number, line in enumerate(re.split(r"\r\n|[\n\r]", text), start=1):
        try:
            quad = parse_line(line)
        except InvalidQuadError as exc:
            raise InvalidQuadError(
                f"Error while parsing N-Quads. Invalid quad in line {number}: {line}", line
            ) from exc
        if quad is not None:
            quads.append(quad)
    return quads

"""RDF quad emission (toRdf) and literal canonicalization.

Mirrors the reference's quad generation (Processor.php:2130-2261) and
literal rules (Value.php:69-112): native doubles get the canonical
``%1.15E`` exponent form with trailing-zero compression (``5.3`` →
``"5.3E0"``), integral numbers become ``xsd:integer``, booleans
``"true"``/``"false"``, ``@type`` beats ``@language``, untyped strings
are ``xsd:string``. ``@list`` values become rdf:first/rest linked
lists with fresh blank nodes (Processor.php:2235-2261).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import NamedTuple

from jsonld_spark.kernel.context import DEFAULT_GRAPH
from jsonld_spark.kernel.iri import is_absolute_iri
from jsonld_spark.kernel.nodemap import BlankNodeIssuer, build_node_map

# RDF vocabulary (reference: RdfConstants.php:19-27)
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_LIST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#List"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"
XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


class Quad(NamedTuple):
    """Flat, column-friendly quad — the engine's canonical record
    (SURVEY.md §1.2). ``graph=None`` means the default graph."""

    graph: str | None
    subject: str
    predicate: str
    obj_kind: str        # 'iri' | 'literal'
    obj_value: str
    obj_type: str | None  # datatype IRI (literals only)
    obj_lang: str | None  # BCP47 tag (language literals only)


def canonical_double(value) -> str:
    """Canonical xsd:double lexical form: ``%1.15E`` with up to 14
    trailing mantissa zeros compressed and no ``+`` in the exponent
    (``5.3`` → ``5.3E0``, ``1e24`` → ``1.0E24``)."""
    # memo key: repr() keeps the sign of zero; hashing the float itself
    # conflates 0.0/-0.0 (equal keys) and returned the cached "0.0E0"
    # for -0.0 depending on executor-process call order (ADVICE r2)
    return _canonical_double_memo(repr(float(value)))


@lru_cache(maxsize=8192)
def _canonical_double_memo(value_repr: str) -> str:
    formatted = "%1.15E" % float(value_repr)
    if "E" not in formatted:  # inf / nan
        return formatted
    mantissa, exponent = formatted.split("E")
    int_part, _, frac = mantissa.partition(".")
    frac = frac.rstrip("0") or "0"
    return f"{int_part}.{frac}E{int(exponent)}"


def value_object_to_literal(element: dict):
    """Convert an expanded ``{"@value": ...}`` object to a literal
    triple-object tuple ``(obj_value, obj_type, obj_lang)``; returns
    None when the value cannot form a literal."""
    value = element["@value"]
    vtype = element.get("@type")
    lang = element.get("@language")

    if isinstance(value, bool):
        value = "true" if value else "false"
        if vtype is None and lang is None:
            return (value, XSD_BOOLEAN, None)
    elif isinstance(value, (int, float)):
        try:
            # mirror PHP's `$value != (int) $value` (Value.php:85): the
            # (int) cast is only faithful inside the 64-bit range, so
            # integral floats beyond it take the canonical-double path
            # (e.g. 1e24 -> "1.0E24"^^xsd:double)
            integral = value == int(value) and -(2**63) <= value < 2**63
        except (OverflowError, ValueError):
            integral = False
        if not integral or vtype == XSD_DOUBLE:
            value = canonical_double(value)
            if vtype is None and lang is None:
                return (value, XSD_DOUBLE, None)
        else:
            value = "%d" % value
            if vtype is None and lang is None:
                return (value, XSD_INTEGER, None)
    elif not isinstance(value, str):
        return None

    # @type gets precedence over @language
    if vtype is None and lang is not None:
        return (value, None, lang)
    return (value, vtype if vtype is not None else XSD_STRING, None)


def _element_to_object(element: dict):
    """Expanded element -> ('iri'|'literal', value, type, lang) or None."""
    if "@value" in element:
        literal = value_object_to_literal(element)
        if literal is None:
            return None
        return ("literal",) + literal
    iri = element.get("@id")
    if isinstance(iri, str) and is_absolute_iri(iri):
        return ("iri", iri, None, None)
    return None


def _list_to_rdf(entries: list, quads: list, graph, issuer: BlankNodeIssuer) -> str:
    """Emit an rdf:first/rdf:rest chain; returns the head IRI."""
    if not entries:
        return RDF_NIL
    head = issuer.issue()
    obj = _element_to_object(entries[0])
    if obj is not None:
        quads.append(Quad(graph, head, RDF_FIRST, *obj))
    bnode = head
    for entry in entries[1:]:
        nxt = issuer.issue()
        quads.append(Quad(graph, bnode, RDF_REST, "iri", nxt, None, None))
        obj = _element_to_object(entry)
        if obj is not None:
            quads.append(Quad(graph, nxt, RDF_FIRST, *obj))
        bnode = nxt
    quads.append(Quad(graph, bnode, RDF_REST, "iri", RDF_NIL, None, None))
    return head


def node_map_to_quads(
    node_map: dict, issuer: BlankNodeIssuer, generalized_rdf: bool = False
) -> list[Quad]:
    """Emit quads from a node map (reference: Processor.php:2139-2203).

    Non-absolute graph/subject/predicate IRIs are skipped; blank-node
    predicates are dropped unless ``generalized_rdf``. The issuer must
    be the same one used to build the node map so list blank nodes
    continue the label sequence.
    """
    result: list[Quad] = []
    for graph_name, graph in node_map.items():
        if graph_name == DEFAULT_GRAPH:
            active_graph = None
        else:
            if not is_absolute_iri(graph_name):
                continue
            active_graph = graph_name

        for subject, node in graph.items():
            if not is_absolute_iri(subject):
                continue
            for prop, values in node.items():
                if prop == "@id":
                    continue
                if prop == "@type":
                    for value in values:
                        result.append(
                            Quad(active_graph, subject, RDF_TYPE, "iri", value, None, None)
                        )
                    continue
                if prop.startswith("@"):
                    continue
                if prop.startswith("_:") and not generalized_rdf:
                    continue
                if not is_absolute_iri(prop):
                    continue
                for value in values:
                    if "@list" in value:
                        list_quads: list[Quad] = []
                        head = _list_to_rdf(value["@list"], list_quads, active_graph, issuer)
                        result.append(
                            Quad(active_graph, subject, prop, "iri", head, None, None)
                        )
                        result.extend(list_quads)
                    else:
                        obj = _element_to_object(value)
                        if obj is None:
                            continue
                        result.append(Quad(active_graph, subject, prop, *obj))
    return result


def expanded_to_quads(expanded, generalized_rdf: bool = False) -> list[Quad]:
    """Expanded document -> quads (node map + emission in one step)."""
    issuer = BlankNodeIssuer()
    node_map = build_node_map(expanded, issuer)
    return node_map_to_quads(node_map, issuer, generalized_rdf)


# ---------------------------------------------------------------------------
# fromRdf support: native-type round trip (reference: TypedValue.php:92-118)
#
# Mirrored bug-compat, quirks included (audited round 5):
# * PHP's sign class ``[\+|-]`` ALSO matches a literal '|', so "|5"
#   passes the integer regex — and ``intval("|5")`` is 0, so the
#   native value becomes 0 (TypedValue.php:105 + 106).
# * The regex runs on ``trim($value)`` but the CONVERSION runs on the
#   raw value (" 5 " -> 5 natively; intval skips leading whitespace).
# * The double regex requires a leading digit — ".5" stays a typed
#   string (no ``\.\d+`` alternative in TypedValue.php:112).
# * ``intval`` SATURATES at the 64-bit bounds on overflow
#   ("99999999999999999999" -> 9223372036854775807), unlike Python's
#   arbitrary-precision int.

_PHP_SIGN = r"[+|-]"  # PHP [\+|-]: the '|' is IN the class, not alternation
_INTEGER_RE = re.compile(rf"^{_PHP_SIGN}?\d+$")
_DOUBLE_RE = re.compile(rf"^{_PHP_SIGN}?\d+(\.\d*)?([eE]{_PHP_SIGN}?\d+)?$")
_INT64_MAX = 2**63 - 1
_INT64_MIN = -(2**63)


def _php_intval(value: str) -> int:
    """PHP ``intval`` on a string: leading whitespace skipped, optional
    sign + digit prefix parsed, anything else -> 0; 64-bit saturation."""
    m = re.match(r"\s*[+-]?\d+", value)
    if not m:
        return 0
    return max(_INT64_MIN, min(_INT64_MAX, int(m.group())))


def _php_floatval(value: str) -> float:
    """PHP ``floatval`` (strtod prefix parse): the longest leading
    numeric prefix, else 0.0."""
    m = re.match(r"\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", value)
    return float(m.group()) if m else 0.0


def literal_to_jsonld(obj_value: str, obj_type: str | None, obj_lang: str | None,
                      use_native_types: bool = False) -> dict:
    """Literal -> expanded value object, optionally converting
    xsd:integer/double/boolean back to native JSON types."""
    if obj_lang is not None:
        return {"@value": obj_value, "@language": obj_lang}
    vtype = obj_type if obj_type is not None else XSD_STRING
    if use_native_types:
        if vtype == XSD_INTEGER and _INTEGER_RE.match(obj_value.strip()):
            return {"@value": _php_intval(obj_value)}
        if vtype == XSD_DOUBLE and _DOUBLE_RE.match(obj_value.strip()):
            return {"@value": _php_floatval(obj_value)}
        if vtype == XSD_BOOLEAN and obj_value in ("true", "false"):
            return {"@value": obj_value == "true"}
    if vtype == XSD_STRING:
        return {"@value": obj_value}
    return {"@value": obj_value, "@type": vtype}

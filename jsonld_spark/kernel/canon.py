"""URDNA2015 / RDFC-1.0 RDF dataset canonicalization.

Implements the public W3C RDF Dataset Canonicalization algorithm
(https://www.w3.org/TR/rdf-canon/, the algorithm popularized as
URDNA2015): every blank node receives a label derived purely from the
graph's structure, so isomorphic datasets get byte-identical canonical
N-Quads regardless of input labels or order.

This goes beyond the reference, whose "canonicalization" is
first-visit counter relabeling (Processor.php:2069-2079) — BASELINE
asks for "URDNA2015-style deterministic relabeling"; the pipeline's
default hash mode satisfies the input-order-independence requirement,
and this module provides the real isomorphism-invariant algorithm as
an option (kernel here; distributed per-document application in
operators/canonicalize.py::urdna_bnode_labels).

Implemented from the specification text only — the reference contains
no such algorithm and no external implementation was consulted.
"""

from __future__ import annotations

import hashlib
from itertools import permutations

from jsonld_spark.kernel.rdf import Quad


def _is_bnode(value) -> bool:
    return isinstance(value, str) and value.startswith("_:")


def _quad_positions(quad: Quad):
    """(position-code, value) pairs for bnode-bearing positions."""
    yield "s", quad.subject
    if quad.obj_kind == "iri":
        yield "o", quad.obj_value
    if quad.graph is not None:
        yield "g", quad.graph


def _serialize_quad(quad: Quad, repl) -> str:
    """N-Quads form of ``quad`` with blank nodes substituted via
    ``repl(label, position)`` (spec: Hash First Degree Quads step 3)."""

    def term(value, is_bn, pos):
        if is_bn:
            return repl(value, pos)
        return f"<{value}>"

    s = term(quad.subject, _is_bnode(quad.subject), "s")
    p = f"<{quad.predicate}>"
    if quad.obj_kind == "iri":
        o = term(quad.obj_value, _is_bnode(quad.obj_value), "o")
    else:
        escaped = quad.obj_value.replace("\\", "\\\\").replace('"', '\\"') \
            .replace("\n", "\\n").replace("\r", "\\r")
        if quad.obj_lang is not None:
            o = f'"{escaped}"@{quad.obj_lang}'
        elif quad.obj_type is not None and \
                quad.obj_type != "http://www.w3.org/2001/XMLSchema#string":
            o = f'"{escaped}"^^<{quad.obj_type}>'
        else:
            o = f'"{escaped}"'
    line = f"{s} {p} {o}"
    if quad.graph is not None:
        line += " " + term(quad.graph, _is_bnode(quad.graph), "g")
    return line + " .\n"


def _sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


class _Issuer:
    """Identifier issuer (spec §4.5): prefix + counter, memoized."""

    __slots__ = ("prefix", "counter", "issued", "order")

    def __init__(self, prefix: str = "_:c14n"):
        self.prefix = prefix
        self.counter = 0
        self.issued: dict = {}
        self.order: list = []

    def issue(self, identifier: str) -> str:
        if identifier in self.issued:
            return self.issued[identifier]
        label = f"{self.prefix}{self.counter}"
        self.counter += 1
        self.issued[identifier] = label
        self.order.append(identifier)
        return label

    def clone(self) -> "_Issuer":
        other = _Issuer(self.prefix)
        other.counter = self.counter
        other.issued = dict(self.issued)
        other.order = list(self.order)
        return other


def _hash_first_degree(bnode: str, bnode_quads: dict) -> str:
    nquads = []
    for quad in bnode_quads[bnode]:
        nquads.append(
            _serialize_quad(
                quad,
                lambda label, pos: "_:a" if label == bnode else "_:z",
            )
        )
    return _sha256("".join(sorted(nquads)))


def _hash_related(related: str, quad: Quad, position: str, state, issuer) -> str:
    """Hash Related Blank Node (spec §4.7)."""
    if related in state["canonical"].issued:
        identifier = state["canonical"].issued[related]
    elif related in issuer.issued:
        identifier = issuer.issued[related]
    else:
        identifier = state["fdh"][related]
    inp = position
    if position != "g":
        inp += f"<{quad.predicate}>"
    return _sha256(inp + identifier)


def _hash_n_degree(identifier: str, state, issuer: _Issuer):
    """Hash N-Degree Quads (spec §4.8). Returns (hash, issuer)."""
    hash_to_related: dict = {}
    for quad in state["quads_by_bnode"][identifier]:
        for pos, value in _quad_positions(quad):
            if _is_bnode(value) and value != identifier:
                h = _hash_related(value, quad, pos, state, issuer)
                hash_to_related.setdefault(h, []).append(value)

    data = ""
    for related_hash in sorted(hash_to_related):
        data += related_hash
        chosen_path = ""
        chosen_issuer = None
        blank_nodes = hash_to_related[related_hash]
        for perm in permutations(blank_nodes):
            issuer_copy = issuer.clone()
            path = ""
            recursion = []
            skip = False
            for related in perm:
                if related in state["canonical"].issued:
                    path += state["canonical"].issued[related]
                else:
                    if related not in issuer_copy.issued:
                        recursion.append(related)
                    path += issuer_copy.issue(related)
                if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            for related in recursion:
                result_hash, result_issuer = _hash_n_degree(related, state, issuer_copy)
                path += issuer_copy.issue(related)
                path += f"<{result_hash}>"
                issuer_copy = result_issuer
                if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            if not chosen_path or path < chosen_path:
                chosen_path = path
                chosen_issuer = issuer_copy
        data += chosen_path
        issuer = chosen_issuer if chosen_issuer is not None else issuer

    return _sha256(data), issuer


def urdna2015_mapping(quads) -> dict[str, str]:
    """Blank-node label -> canonical ``_:c14nN`` label for a dataset."""
    quads_by_bnode: dict = {}
    for quad in quads:
        for _, value in _quad_positions(quad):
            if _is_bnode(value):
                quads_by_bnode.setdefault(value, []).append(quad)

    state = {
        "quads_by_bnode": quads_by_bnode,
        "canonical": _Issuer(),
        "fdh": {},
    }
    # 1: first-degree hashes
    for bnode in quads_by_bnode:
        state["fdh"][bnode] = _hash_first_degree(bnode, quads_by_bnode)

    hash_to_bnodes: dict = {}
    for bnode, h in state["fdh"].items():
        hash_to_bnodes.setdefault(h, []).append(bnode)

    # 2: unique hashes get canonical ids in hash order
    non_unique = []
    for h in sorted(hash_to_bnodes):
        nodes = hash_to_bnodes[h]
        if len(nodes) == 1:
            state["canonical"].issue(nodes[0])
        else:
            non_unique.append((h, nodes))

    # 3: shared hashes disambiguate via N-degree hashing
    for _, nodes in non_unique:
        results = []
        for bnode in nodes:
            if bnode in state["canonical"].issued:
                continue
            temp = _Issuer("_:b")
            temp.issue(bnode)
            ndh, issuer = _hash_n_degree(bnode, state, temp)
            results.append((ndh, issuer))
        for _, issuer in sorted(results, key=lambda r: r[0]):
            for identifier in issuer.order:
                state["canonical"].issue(identifier)

    return {b: state["canonical"].issued[b] for b in quads_by_bnode}


def _relabel(value, mapping):
    return mapping.get(value, value) if _is_bnode(value) else value


def urdna2015(quads) -> list[Quad]:
    """Relabel a dataset's blank nodes canonically; quads returned in
    sorted canonical N-Quads order (the spec's canonical form)."""
    mapping = urdna2015_mapping(quads)
    relabeled = [
        Quad(
            _relabel(q.graph, mapping) if q.graph is not None else None,
            _relabel(q.subject, mapping),
            q.predicate,
            q.obj_kind,
            _relabel(q.obj_value, mapping) if q.obj_kind == "iri" else q.obj_value,
            q.obj_type,
            q.obj_lang,
        )
        for q in quads
    ]
    return sorted(set(relabeled), key=lambda q: _serialize_quad(q, lambda l, p: l))


def canonical_nquads(quads) -> str:
    """The canonical N-Quads serialization (sorted, relabeled)."""
    return "".join(_serialize_quad(q, lambda l, p: l) for q in urdna2015(quads))

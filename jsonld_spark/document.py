"""Mutable object-graph API: Document -> Graph -> Node.

Mirrors the reference's OO surface (Document.php, Graph.php, Node.php,
Processor.php:239-299 ``getDocument``): default + named graphs, nodes
with forward properties and maintained reverse-property back-pointers,
get-or-create node semantics, per-graph blank-node counters, graph
merging with blank-node remapping, and deterministic ``to_jsonld``.

Scale note (SURVEY.md §1.1): this API is a *driver-side* convenience
for subgraphs small enough to collect. The distributed analogues are
the triple/adjacency DataFrames — ``document_from_triples`` hydrates
an object graph from (a filtered slice of) the triple table.
"""

from __future__ import annotations

from jsonld_spark.kernel.context import DEFAULT_GRAPH
from jsonld_spark.kernel.iri import iri_resolve
from jsonld_spark.kernel.nodemap import BlankNodeIssuer, build_node_map
from jsonld_spark.kernel.rdf import (
    RDF_TYPE,
    XSD_STRING,
    literal_to_jsonld,
    value_object_to_literal,
)

TYPE = "@type"


class Value:
    """Base for literal values (reference: Value.php)."""

    __slots__ = ("value",)

    def __init__(self, value: str):
        if not isinstance(value, str):
            raise ValueError("value must be a string.")
        self.value = value

    def get_value(self) -> str:
        return self.value

    @staticmethod
    def from_jsonld(element: dict):
        """Expanded value object -> TypedValue / LanguageTaggedString
        (canonicalizing numbers/booleans, Value.php:69-112)."""
        literal = value_object_to_literal(element)
        if literal is None:
            return None
        lexical, vtype, lang = literal
        if lang is not None:
            return LanguageTaggedString(lexical, lang)
        return TypedValue(lexical, vtype if vtype is not None else XSD_STRING)


class TypedValue(Value):
    __slots__ = ("type",)

    def __init__(self, value: str, type_iri: str):
        super().__init__(value)
        self.type = type_iri

    def get_type(self) -> str:
        return self.type

    def equals(self, other) -> bool:
        return (
            type(other) is TypedValue
            and self.value == other.value
            and self.type == other.type
        )

    def to_jsonld(self, use_native_types: bool = True) -> dict:
        return literal_to_jsonld(self.value, self.type, None, use_native_types)

    def __repr__(self):
        return f'TypedValue("{self.value}", {self.type})'


class LanguageTaggedString(Value):
    __slots__ = ("language",)

    def __init__(self, value: str, language: str):
        super().__init__(value)
        self.language = language

    def get_language(self) -> str:
        return self.language

    def equals(self, other) -> bool:
        return (
            type(other) is LanguageTaggedString
            and self.value == other.value
            and self.language == other.language
        )

    def to_jsonld(self, use_native_types: bool = True) -> dict:
        return {"@value": self.value, "@language": self.language}

    def __repr__(self):
        return f'LanguageTaggedString("{self.value}", @{self.language})'


def _equal_values(a, b) -> bool:
    if isinstance(a, Value):
        return isinstance(b, Value) and a.equals(b)
    if isinstance(a, Node) or isinstance(b, Node):
        return a is b
    return type(a) is type(b) and a == b


class Node:
    """A node with forward properties and reverse back-pointers
    (reference: Node.php)."""

    def __init__(self, graph: "Graph", node_id: str | None = None):
        self._graph = graph
        self._id = node_id
        self._properties: dict = {}
        self._rev_properties: dict = {}

    # -- identity ------------------------------------------------------------

    def get_id(self):
        return self._id

    def is_blank_node(self) -> bool:
        return self._id is None or self._id.startswith("_:")

    def get_graph(self):
        return self._graph

    def equals(self, other) -> bool:
        return self is other

    # -- types ---------------------------------------------------------------

    def set_type(self, node_type):
        if node_type is not None and not isinstance(node_type, (Node, list)):
            raise ValueError("type must be a Node, a list of Nodes, or None")
        if isinstance(node_type, list):
            self.remove_property(TYPE)
            for t in node_type:
                self.add_type(t)
        else:
            self.set_property(TYPE, node_type)
        return self

    def add_type(self, node_type: "Node"):
        return self.add_property_value(TYPE, node_type)

    def remove_type(self, node_type: "Node"):
        return self.remove_property_value(TYPE, node_type)

    def get_type(self):
        return self.get_property(TYPE)

    def get_nodes_with_this_type(self) -> list:
        nodes = self._rev_properties.get(TYPE)
        return list(nodes.values()) if nodes else []

    # -- properties ----------------------------------------------------------

    def set_property(self, prop, value):
        if value is None:
            self.remove_property(prop)
        else:
            self._merge_into_property(str(prop), [], value)
        return self

    def add_property_value(self, prop, value):
        existing = self._properties.get(str(prop), [])
        if not isinstance(existing, list):
            existing = [existing]
        self._merge_into_property(str(prop), existing, value)
        return self

    def _merge_into_property(self, prop: str, existing: list, value):
        if value is None:
            return
        if not self._is_valid_value(value):
            raise ValueError(
                "value must be a scalar, a node of the same graph, a "
                "language-tagged string, or a typed value"
            )
        normalized = self._normalize(value)
        for item in existing:
            if _equal_values(item, normalized):
                return
        existing = existing + [normalized]
        self._properties[prop] = existing[0] if len(existing) == 1 else existing
        if isinstance(normalized, Node):
            normalized._add_reverse_property(prop, self)

    def remove_property(self, prop):
        prop = str(prop)
        if prop not in self._properties:
            return self
        values = self._properties[prop]
        for value in values if isinstance(values, list) else [values]:
            if isinstance(value, Node):
                value._remove_reverse_property(prop, self)
        del self._properties[prop]
        return self

    def remove_property_value(self, prop, value):
        prop = str(prop)
        if not self._is_valid_value(value) or prop not in self._properties:
            return self
        normalized = self._normalize(value)
        values = self._properties[prop]
        if not isinstance(values, list):
            values = [values]
        for i, item in enumerate(values):
            if _equal_values(item, normalized):
                if isinstance(normalized, Node):
                    normalized._remove_reverse_property(prop, self)
                del values[i]
                break
        if not values:
            del self._properties[prop]
        else:
            self._properties[prop] = values[0] if len(values) == 1 else values
        return self

    def get_properties(self) -> dict:
        return dict(self._properties)

    def get_property(self, prop):
        return self._properties.get(str(prop))

    def get_reverse_properties(self) -> dict:
        return {k: list(v.values()) for k, v in self._rev_properties.items()}

    def get_reverse_property(self, prop):
        nodes = self._rev_properties.get(str(prop))
        if not nodes:
            return None
        result = list(nodes.values())
        return result[0] if len(result) == 1 else result

    # -- graph membership ------------------------------------------------------

    def remove_from_graph(self):
        for prop, nodes in list(self._rev_properties.items()):
            for node in list(nodes.values()):
                node.remove_property_value(prop, self)
        for prop, values in list(self._properties.items()):
            for value in values if isinstance(values, list) else [values]:
                if isinstance(value, Node):
                    self.remove_property_value(prop, value)
        graph, self._graph = self._graph, None
        if graph is not None:
            graph.remove_node(self)
        return self

    # -- serialization ----------------------------------------------------------

    def to_jsonld(self, use_native_types: bool = True) -> dict:
        node: dict = {}
        # blank nodes are labeled only when referenced
        if not self.is_blank_node() or self._rev_properties:
            node["@id"] = self._id
        for prop, values in self._properties.items():
            if not isinstance(values, list):
                values = [values]
            if prop == TYPE:
                node["@type"] = [v.get_id() for v in values]
                continue
            out = []
            for value in values:
                if isinstance(value, Node):
                    out.append({"@id": value.get_id()})
                elif isinstance(value, Value):
                    out.append(value.to_jsonld(use_native_types))
                else:
                    out.append({"@value": value})
            node[prop] = out
        return node

    # -- internals ----------------------------------------------------------------

    def _add_reverse_property(self, prop: str, node: "Node"):
        self._rev_properties.setdefault(prop, {})[node.get_id()] = node

    def _remove_reverse_property(self, prop: str, node: "Node"):
        entry = self._rev_properties.get(prop)
        if entry is not None:
            entry.pop(node.get_id(), None)
            if not entry:
                del self._rev_properties[prop]

    def _is_valid_value(self, value) -> bool:
        if isinstance(value, (str, int, float, bool)):
            return True
        if isinstance(value, Node):
            return value.get_graph() is self._graph
        return isinstance(value, Value)

    def _normalize(self, value):
        if isinstance(value, (Node, Value)):
            return value
        return Value.from_jsonld({"@value": value})


class Graph:
    """A graph: node map + per-graph blank-node counter
    (reference: Graph.php)."""

    def __init__(self, document: "Document | None" = None):
        self._document = document
        self._nodes: dict = {}
        self._bnode_counter = 0

    def create_node(self, node_id: str | None = None, preserve_bnode_id: bool = False):
        if not isinstance(node_id, str) or (
            not preserve_bnode_id and node_id.startswith("_:")
        ):
            node_id = self._create_blank_node_id()
        else:
            node_id = self._resolve_iri(node_id)
            if node_id in self._nodes:
                return self._nodes[node_id]
        node = Node(self, node_id)
        self._nodes[node_id] = node
        return node

    def remove_node(self, node: Node):
        if node.get_graph() is self:
            node.remove_from_graph()
        node_id = node.get_id()
        if not node.is_blank_node():
            node_id = self._resolve_iri(node_id)
        self._nodes.pop(node_id, None)
        return self

    def get_nodes(self) -> list:
        return list(self._nodes.values())

    def get_node(self, node_id: str):
        if not (isinstance(node_id, str) and node_id.startswith("_:")):
            node_id = self._resolve_iri(node_id)
        return self._nodes.get(node_id)

    def get_nodes_by_type(self, node_type) -> list:
        if isinstance(node_type, str):
            node_type = self.get_node(node_type)
            if node_type is None:
                return []
        return node_type.get_nodes_with_this_type()

    def contains_node(self, node_or_id) -> bool:
        node = node_or_id
        node_id = node.get_id() if isinstance(node, Node) else node
        if node_id is None or not isinstance(node_id, str):
            return False
        if node_id.startswith("_:"):
            return node_id in self._nodes and self._nodes[node_id] is node
        return self._resolve_iri(node_id) in self._nodes

    def get_document(self):
        return self._document

    def merge(self, other: "Graph"):
        """Union with blank-node remapping (Graph.php:179-224)."""
        bnode_map: dict = {}

        def local(node: Node) -> Node:
            if node.is_blank_node():
                if node.get_id() not in bnode_map:
                    bnode_map[node.get_id()] = self.create_node()
                return bnode_map[node.get_id()]
            return self.create_node(node.get_id())

        for node in other.get_nodes():
            target = local(node)
            for prop, values in node.get_properties().items():
                for value in values if isinstance(values, list) else [values]:
                    if isinstance(value, Node):
                        value = local(value)
                    elif isinstance(value, TypedValue):
                        value = TypedValue(value.value, value.type)
                    elif isinstance(value, LanguageTaggedString):
                        value = LanguageTaggedString(value.value, value.language)
                    target.add_property_value(prop, value)
        return self

    def to_jsonld(self, use_native_types: bool = True) -> list:
        return [
            self._nodes[k].to_jsonld(use_native_types) for k in sorted(self._nodes)
        ]

    def _create_blank_node_id(self) -> str:
        label = f"_:b{self._bnode_counter}"
        self._bnode_counter += 1
        return label

    def _resolve_iri(self, iri: str) -> str:
        if self._document is not None and self._document.get_iri():
            return iri_resolve(self._document.get_iri(), iri)
        return iri


class Document:
    """Default graph + named graphs (reference: Document.php)."""

    def __init__(self, iri: str | None = None):
        self._iri = iri
        self._default_graph = Graph(self)
        self._named_graphs: dict = {}

    def set_iri(self, iri: str):
        self._iri = iri
        return self

    def get_iri(self):
        return self._iri

    def create_graph(self, name: str) -> Graph:
        name = iri_resolve(self._iri, name) if self._iri else name
        if name not in self._named_graphs:
            self._named_graphs[name] = Graph(self)
        return self._named_graphs[name]

    def get_graph(self, name: str | None = None):
        if name is None:
            return self._default_graph
        name = iri_resolve(self._iri, name) if self._iri else name
        return self._named_graphs.get(name)

    def get_graph_names(self) -> list:
        return list(self._named_graphs)

    def contains_graph(self, name: str) -> bool:
        name = iri_resolve(self._iri, name) if self._iri else name
        return name in self._named_graphs

    def remove_graph(self, graph=None):
        if graph is None or graph is self._default_graph:
            self._default_graph = Graph(self)
            return self
        if isinstance(graph, str):
            name = iri_resolve(self._iri, graph) if self._iri else graph
            self._named_graphs.pop(name, None)
            return self
        for name, g in list(self._named_graphs.items()):
            if g is graph:
                del self._named_graphs[name]
        return self

    def to_jsonld(self, use_native_types: bool = True):
        default = self._default_graph.to_jsonld(use_native_types)
        if not self._named_graphs:
            return default
        for name, graph in self._named_graphs.items():
            default.append({"@id": name, "@graph": graph.to_jsonld(use_native_types)})
        return [{"@graph": default}]


def get_document(doc, base: str | None = None, expand_context=None, loader=None) -> Document:
    """Parsed JSON-LD -> Document object graph (Processor.php:239-299).
    Lists are not supported (matching the reference's limitation,
    Processor.php:287-289)."""
    from jsonld_spark.kernel.api import expand

    expanded = expand(doc, base=base, expand_context=expand_context, loader=loader)
    node_map = build_node_map(expanded, BlankNodeIssuer())
    document = Document(base)

    for graph_name, nodes in node_map.items():
        graph = (
            document.get_graph()
            if graph_name == DEFAULT_GRAPH
            else document.create_graph(graph_name)
        )
        for item in nodes.values():
            node = graph.create_node(item["@id"], True)
            for node_type in item.get("@type", []):
                node.add_type(graph.create_node(node_type, True))
            for prop, values in item.items():
                if prop in ("@id", "@type"):
                    continue
                for value in values if isinstance(values, list) else [values]:
                    if "@value" in value:
                        node.add_property_value(prop, Value.from_jsonld(value))
                    elif "@id" in value:
                        node.add_property_value(prop, graph.create_node(value["@id"], True))
                    else:
                        raise NotImplementedError(
                            "Lists are not supported by get_document() "
                            "(matching the reference, Processor.php:287-289)"
                        )
        # rdf:type as a property name maps onto @type handling upstream
    return document


def document_from_triples(rows, base: str | None = None) -> Document:
    """Hydrate a Document from collected triple rows (the driver-side
    view over a filtered slice of the distributed triple table)."""
    document = Document(base)
    for row in rows:
        graph = (
            document.get_graph()
            if row["graph"] is None
            else document.create_graph(row["graph"])
        )
        subject = graph.create_node(row["subject"], True)
        if row["predicate"] == RDF_TYPE and row["obj_kind"] == "iri":
            subject.add_type(graph.create_node(row["obj_value"], True))
        elif row["obj_kind"] == "iri":
            subject.add_property_value(
                row["predicate"], graph.create_node(row["obj_value"], True)
            )
        else:
            if row["obj_lang"] is not None:
                value = LanguageTaggedString(row["obj_value"], row["obj_lang"])
            else:
                value = TypedValue(
                    row["obj_value"],
                    row["obj_type"] if row["obj_type"] is not None else XSD_STRING,
                )
            subject.add_property_value(row["predicate"], value)
    return document

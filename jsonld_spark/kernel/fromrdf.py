"""RDF quads -> expanded JSON-LD (fromRdf).

Mirrors the reference (Processor.php:2274-2466): groups quads by graph
then subject, maps rdf:type to @type (unless use_rdf_type), tracks a
usage index of IRI objects, and reconstructs ``@list`` arrays by
walking rdf:rest chains backwards from rdf:nil with the same
well-formedness guards.

Spark shape (SURVEY.md §2.2): groupBy(graph, subject) + collect_list,
then per-graph chain walking via applyInPandas; this module is the
per-group kernel and the single-process API.
"""

from __future__ import annotations

from jsonld_spark.kernel.context import DEFAULT_GRAPH
from jsonld_spark.kernel.rdf import (
    RDF_FIRST,
    RDF_LIST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    literal_to_jsonld,
)
from jsonld_spark.kernel.util import merge_into_property, php_ksort_keys


def _object_to_jsonld(quad, use_native_types: bool):
    if quad.obj_kind == "iri":
        return {"@id": quad.obj_value}
    return literal_to_jsonld(quad.obj_value, quad.obj_type, quad.obj_lang, use_native_types)


def _ingest_quads(quads, use_native_types: bool, use_rdf_type: bool,
                  value_index: dict | None = None):
    """The fromRdf ingestion loop (Processor.php:2294-2353): build the
    per-graph node maps plus the IRI-object usage indexes the list walk
    needs. ``value_index`` (optional) records the value dict created for
    each IRI-object quad so callers can detect @list substitutions."""
    graphs: dict = {DEFAULT_GRAPH: {}}
    usages: dict = {}
    nil_usages: dict = {}  # graph name -> usage list (reference stores
    # these on the graph's rdf:nil node, Processor.php:2332)

    for quad in quads:
        graph_name = DEFAULT_GRAPH
        if quad.graph:
            graph_name = quad.graph
            # reference the named graph from the default graph
            graphs[DEFAULT_GRAPH].setdefault(graph_name, {"@id": graph_name})
        graph = graphs.setdefault(graph_name, {})

        subject, prop = quad.subject, quad.predicate
        node = graph.setdefault(subject, {"@id": subject})
        if quad.obj_kind == "iri":
            graph.setdefault(quad.obj_value, {"@id": quad.obj_value})

        if prop == RDF_TYPE and not use_rdf_type and quad.obj_kind == "iri":
            merge_into_property(node, "@type", quad.obj_value, True, True)
            continue

        value = _object_to_jsonld(quad, use_native_types)
        merge_into_property(node, prop, value, True, True)

        if quad.obj_kind == "iri":
            obj = quad.obj_value
            usage = {"graph": graph_name, "node": node, "prop": prop, "value": value}
            if obj == RDF_NIL:
                nil_usages.setdefault(graph_name, []).append(usage)
            else:
                # dedup per (graph, subject, property) like the reference
                usages.setdefault(obj, {}).setdefault(
                    f"{graph_name}|{subject}|{prop}", usage
                )
            if value_index is not None:
                value_index[(graph_name, subject, prop, obj)] = value

    return graphs, usages, nil_usages


def quads_to_jsonld(quads, use_native_types: bool = False, use_rdf_type: bool = False) -> list:
    graphs, usages, nil_usages = _ingest_quads(quads, use_native_types, use_rdf_type)
    _create_list_objects(graphs, usages, nil_usages)

    document = []
    for node_id in php_ksort_keys(graphs[DEFAULT_GRAPH]):
        node = graphs[DEFAULT_GRAPH][node_id]
        if node_id in graphs and node_id != DEFAULT_GRAPH:
            node["@graph"] = [
                graphs[node_id][gid]
                for gid in php_ksort_keys(graphs[node_id])
                if len(graphs[node_id][gid]) > 1
            ]
        if len(node) > 1:
            document.append(node)
    return document


def _create_list_objects(graphs: dict, usages: dict, nil_usages: dict) -> None:
    """Walk rdf:rest chains backwards from rdf:nil, replacing
    well-formed chains with @list objects (Processor.php:2396-2466)."""
    for graph_name, graph in graphs.items():
        for usage in nil_usages.get(graph_name, ()):
            node, prop, head = usage["node"], usage["prop"], usage["value"]
            items: list = []
            list_nodes: list = []

            while (
                prop == RDF_REST
                and len(usages.get(node["@id"], {})) == 1
                and RDF_FIRST in node
                and RDF_REST in node
                and len(node[RDF_FIRST]) == 1
                and len(node[RDF_REST]) == 1
                and (
                    len(node) == 3  # only @id, rdf:first, rdf:rest
                    or (
                        len(node) == 4
                        and node.get("@type") == [RDF_LIST]
                    )
                )
            ):
                items.append(node[RDF_FIRST][0])
                list_nodes.append(node["@id"])
                nxt = next(iter(usages[node["@id"]].values()))
                node, prop, head = nxt["node"], nxt["prop"], nxt["value"]
                if not node["@id"].startswith("_:"):
                    break

            # chain terminated inside another list (nested list)
            if prop == RDF_FIRST:
                if head.get("@id") == RDF_NIL:
                    continue  # empty nested list: keep the rdf:nil node
                head_node = graph[head["@id"]]
                head = head_node[RDF_REST][0]
                if items:
                    items.pop()
                if list_nodes:
                    list_nodes.pop()

            head.pop("@id", None)
            head["@list"] = list(reversed(items))
            for list_node in list_nodes:
                graph.pop(list_node, None)


def list_replacements(quads, use_native_types: bool = False,
                      use_rdf_type: bool = False):
    """Compute the @list substitutions the reference's fromRdf would
    apply, without assembling nodes.

    Input: the list-machinery SUBSET of a graph's quads — every quad
    whose subject carries rdf:first/rdf:rest, every quad referencing
    such a subject, and every rdf:nil reference. That subset is exactly
    what the chain walk (Processor.php:2396-2466) reads: the walk
    inspects only candidate nodes' full property maps (present: own
    quads), their usage counts (present: referencing quads), and nil
    usages — so running the kernel walk on the subset yields the same
    substitutions as running it on the whole graph.

    Returns (replacements, consumed):
      replacements — [(graph, subject, predicate, old_obj, items)]
        where the quad (subject, predicate, old_obj) becomes the value
        {"@list": items};
      consumed — [(graph, node_id)] chain nodes to drop entirely.
    """
    value_index: dict = {}
    graphs, usages, nil_usages = _ingest_quads(
        quads, use_native_types, use_rdf_type, value_index
    )
    before = {g: set(nodes) for g, nodes in graphs.items()}
    _create_list_objects(graphs, usages, nil_usages)

    replacements = [
        (graph_name, subject, prop, obj, value["@list"])
        for (graph_name, subject, prop, obj), value in value_index.items()
        if "@list" in value and "@id" not in value
    ]
    consumed = [
        (graph_name, node_id)
        for graph_name, ids in before.items()
        for node_id in ids - set(graphs.get(graph_name, {}))
    ]
    return replacements, consumed


def assemble_node(subject: str, rows, use_native_types: bool = False,
                  use_rdf_type: bool = False) -> dict:
    """Assemble one expanded node object from its (pre-sorted) quads —
    the per-subject slice of the reference's fromRdf ingestion
    (Processor.php:2294-2322) with @list substitutions pre-applied.

    ``rows``: iterable of (predicate, obj_kind, obj_value, obj_type,
    obj_lang, list_items-or-None).
    """
    node: dict = {"@id": subject}
    for pred, kind, val, typ, lang, items in rows:
        if items is not None:
            value = {"@list": items}
        elif kind == "iri":
            if pred == RDF_TYPE and not use_rdf_type:
                merge_into_property(node, "@type", val, True, True)
                continue
            value = {"@id": val}
        else:
            value = literal_to_jsonld(val, typ, lang, use_native_types)
        merge_into_property(node, pred, value, True, True)
    return node

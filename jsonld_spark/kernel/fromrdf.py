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


def quads_to_jsonld(quads, use_native_types: bool = False, use_rdf_type: bool = False) -> list:
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

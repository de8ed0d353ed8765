"""Distributed JSON-LD document transforms: the reference's four API
entry points (expand / compact / flatten / fromRdf) as Spark stages.

Each per-document transform is one Arrow-batched ``mapInPandas`` over
the same (conv_id, turn_idx, jsonld) shape the KG pipeline uses, with
the resolved context closure-shipped (S2). fromRdf assembly is an
``applyInPandas`` per graph group — list reconstruction needs the
whole graph's usage index, so the graph is the grouping unit; at
100 TB a graph-partitioned layout keeps groups bounded.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from jsonld_spark.kernel.compaction import compact_element, create_inverse_context
from jsonld_spark.kernel.fromrdf import quads_to_jsonld
from jsonld_spark.kernel.rdf import Quad
from jsonld_spark.operators.extract import PIPELINE_CONTEXT
from jsonld_spark.operators.kg_pipeline import resolve_context
from jsonld_spark.plans.session import ensure_package_shipped

DOC_SCHEMA = "conv_id string, turn_idx int, doc string"


def _doc_transform(docs: DataFrame, fn, doc_col: str = "jsonld") -> DataFrame:
    ensure_package_shipped(docs.sparkSession)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = [
                (c, t, None if d is None else json.dumps(fn(d), sort_keys=True))
                for c, t, d in zip(pdf["conv_id"], pdf["turn_idx"], pdf[doc_col])
            ]
            yield pd.DataFrame(out, columns=["conv_id", "turn_idx", "doc"])

    n_parts = 3 * docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("conv_id", "turn_idx", doc_col)
        .repartition(n_parts)
        .mapInPandas(run, DOC_SCHEMA)
    )


def expand_documents(docs: DataFrame, context: dict | None = PIPELINE_CONTEXT,
                     base: str | None = None) -> DataFrame:
    """Per-document expansion (JsonLD::expand over a corpus)."""
    activectx = resolve_context(context, base)

    def fn(doc):
        return _expand_with(doc, activectx, base)

    return _doc_transform(docs, fn)


def _expand_with(doc, activectx, base):
    from jsonld_spark.kernel.context import ActiveContext
    from jsonld_spark.kernel.expand import expand_element

    if not hasattr(activectx, "defcache"):
        activectx = ActiveContext(activectx)
    expanded = expand_element(json.loads(doc), activectx, None, False, None, base)
    if isinstance(expanded, dict) and len(expanded) == 1 and "@graph" in expanded:
        expanded = expanded["@graph"]
    if not isinstance(expanded, list):
        expanded = [] if expanded is None else [expanded]
    return expanded


def compact_documents(docs: DataFrame, context: dict | None = None,
                      expand_context: dict | None = PIPELINE_CONTEXT,
                      base: str | None = None) -> DataFrame:
    """Per-document expand-then-compact (JsonLD::compact over a corpus).
    The inverse context is built once on the driver and shipped."""
    context = context if context is not None else dict(expand_context or {})
    expand_ctx = resolve_context(expand_context, base)
    compact_ctx = resolve_context(context, base)
    inversectx = create_inverse_context(dict(compact_ctx))

    def fn(doc):
        expanded = _expand_with(doc, expand_ctx, base)
        return compact_element(expanded, compact_ctx, inversectx, None, True)

    return _doc_transform(docs, fn)


def flatten_documents(docs: DataFrame, context: dict | None = PIPELINE_CONTEXT,
                      base: str | None = None) -> DataFrame:
    """Per-document flatten (JsonLD::flatten over a corpus)."""
    activectx = resolve_context(context, base)

    def fn(doc):
        from jsonld_spark.kernel.nodemap import BlankNodeIssuer, build_node_map
        from jsonld_spark.kernel.util import php_ksort_keys

        expanded = _expand_with(doc, activectx, base)
        node_map = build_node_map(expanded, BlankNodeIssuer())
        default_graph = node_map.pop("@default")
        for graph_name, graph in node_map.items():
            entry = default_graph.setdefault(graph_name, {"@id": graph_name})
            entry["@graph"] = [graph[k] for k in php_ksort_keys(graph) if len(graph[k]) > 1]
        return [default_graph[k] for k in php_ksort_keys(default_graph)
                if len(default_graph[k]) > 1]

    return _doc_transform(docs, fn)


FROMRDF_SCHEMA = "graph string, subject string, node string"


def from_rdf_nodes(triples: DataFrame, use_native_types: bool = False,
                   use_rdf_type: bool = False) -> DataFrame:
    """Quads -> expanded node objects, grouped per graph
    (Processor::fromRdf semantics within each graph; rdf list chains
    are reconstructed from the group's full usage index)."""
    ensure_package_shipped(triples.sparkSession)
    cols = ["graph", "subject", "predicate", "obj_kind", "obj_value", "obj_type", "obj_lang"]

    def assemble(pdf):
        import pandas as pd

        graph_name = None
        if len(pdf) and not pd.isna(pdf["graph"].iloc[0]):
            graph_name = pdf["graph"].iloc[0]
        # assemble within the group's graph: quads enter as default-graph
        # quads so quads_to_jsonld returns this graph's node objects
        quads = [
            Quad(None, r.subject, r.predicate, r.obj_kind, r.obj_value,
                 None if pd.isna(r.obj_type) else r.obj_type,
                 None if pd.isna(r.obj_lang) else r.obj_lang)
            for r in pdf.itertuples()
        ]
        nodes = quads_to_jsonld(quads, use_native_types, use_rdf_type)
        return pd.DataFrame(
            [(graph_name, n["@id"], json.dumps(n, sort_keys=True)) for n in nodes],
            columns=["graph", "subject", "node"],
        )

    grouped = triples.select(*cols).groupBy("graph")
    return grouped.applyInPandas(assemble, FROMRDF_SCHEMA)

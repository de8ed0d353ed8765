"""Tier-2: distributed JSON-LD document transforms vs the kernel."""

from __future__ import annotations

import json
import os

import pytest

from jsonld_spark.kernel.compaction import compact_element, create_inverse_context
from jsonld_spark.kernel.fromrdf import quads_to_jsonld
from jsonld_spark.kernel.rdf import Quad
from jsonld_spark.operators.extract import PIPELINE_CONTEXT, with_payload
from jsonld_spark.operators.jsonld_ops import (
    _expand_with,
    compact_documents,
    expand_documents,
    flatten_documents,
    from_rdf_nodes,
)
from jsonld_spark.operators.kg_pipeline import kg_triples, resolve_context
from jsonld_spark.sources.transcripts import transcripts_from_events

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not available"
)


def _docs(spark, n=50):
    return with_payload(transcripts_from_events(spark, SF)).limit(n)


def test_expand_documents_matches_kernel(spark):
    docs = _docs(spark)
    rows = docs.select("conv_id", "turn_idx", "jsonld").collect()
    activectx = resolve_context(PIPELINE_CONTEXT)
    expected = {
        (r["conv_id"], r["turn_idx"]): json.dumps(
            _expand_with(r["jsonld"], activectx, None), sort_keys=True
        )
        for r in rows
    }
    actual = {
        (r["conv_id"], r["turn_idx"]): r["doc"]
        for r in expand_documents(docs).collect()
    }
    assert actual == expected


def test_compact_documents_roundtrip(spark):
    docs = _docs(spark)
    out = compact_documents(docs).collect()
    assert len(out) == docs.count()
    activectx = resolve_context(PIPELINE_CONTEXT)
    inversectx = create_inverse_context(dict(activectx))
    originals = {
        (r["conv_id"], r["turn_idx"]): r["jsonld"]
        for r in docs.select("conv_id", "turn_idx", "jsonld").collect()
    }
    for row in out:
        compacted = json.loads(row["doc"])
        expected = compact_element(
            _expand_with(originals[(row["conv_id"], row["turn_idx"])], activectx, None),
            activectx, inversectx, None, True,
        )
        assert compacted == expected
        # compacted docs keep the term-level shape of the original payload
        assert compacted["@type"] == "Turn"
        assert "mentions" in compacted


def test_flatten_documents_shape(spark):
    docs = _docs(spark)
    out = flatten_documents(docs).collect()
    flat = json.loads(out[0]["doc"])
    ids = [n["@id"] for n in flat]
    assert ids == sorted(ids)  # flatten sorts subjects
    turn_nodes = [n for n in flat if "/turn/" in n["@id"]]
    assert len(turn_nodes) == 1


def test_from_rdf_nodes_matches_kernel(spark):
    tri = kg_triples(spark, SF)
    nodes = from_rdf_nodes(tri, use_native_types=True).collect()
    quads = [
        Quad(None, r["subject"], r["predicate"], r["obj_kind"], r["obj_value"],
             r["obj_type"], r["obj_lang"])
        for r in tri.collect()
    ]
    expected = {
        n["@id"]: json.dumps(n, sort_keys=True)
        for n in quads_to_jsonld(quads, use_native_types=True)
    }
    actual = {r["subject"]: r["node"] for r in nodes}
    assert actual == expected

"""Tier-1/2: object-graph API (Document/Graph/Node) parity tests,
modeled on the reference's GraphTest/DocumentTest/JsonLDApiTest."""

from __future__ import annotations

import os

import pytest

from jsonld_spark.document import (
    Document,
    Graph,
    LanguageTaggedString,
    TypedValue,
    Value,
    document_from_triples,
    get_document,
)
from jsonld_spark.kernel.rdf import XSD_DOUBLE, XSD_INTEGER
from tests.conftest import load_reference_fixture


def test_value_from_jsonld_canonicalizes():
    assert Value.from_jsonld({"@value": 4}).equals(TypedValue("4", XSD_INTEGER))
    assert Value.from_jsonld({"@value": 5.3}).equals(TypedValue("5.3E0", XSD_DOUBLE))
    lang = Value.from_jsonld({"@value": "hi", "@language": "en"})
    assert isinstance(lang, LanguageTaggedString) and lang.get_language() == "en"


def test_node_properties_and_reverse_index():
    graph = Graph()
    alice = graph.create_node("http://ex.org/alice", True)
    bob = graph.create_node("http://ex.org/bob", True)
    alice.add_property_value("http://v/knows", bob)
    alice.set_property("http://v/name", "Alice")

    assert bob.get_reverse_property("http://v/knows") is alice
    assert alice.get_property("http://v/knows") is bob
    # duplicate values are not added
    alice.add_property_value("http://v/knows", bob)
    assert alice.get_property("http://v/knows") is bob

    alice.remove_property_value("http://v/knows", bob)
    assert alice.get_property("http://v/knows") is None
    assert bob.get_reverse_property("http://v/knows") is None


def test_node_types_and_semi_join():
    graph = Graph()
    person = graph.create_node("http://v/Person", True)
    alice = graph.create_node("http://ex.org/alice", True)
    bob = graph.create_node("http://ex.org/bob", True)
    alice.add_type(person)
    bob.add_type(person)
    assert set(graph.get_nodes_by_type("http://v/Person")) == {alice, bob}
    bob.remove_type(person)
    assert graph.get_nodes_by_type(person) == [alice]


def test_get_or_create_and_blank_ids():
    graph = Graph()
    a = graph.create_node("http://ex.org/a", True)
    assert graph.create_node("http://ex.org/a", True) is a
    b1, b2 = graph.create_node(), graph.create_node()
    assert b1.get_id() == "_:b0" and b2.get_id() == "_:b1"
    assert graph.contains_node(a)
    assert graph.contains_node("http://ex.org/a")
    assert not graph.contains_node("_:b0") or graph.get_node("_:b0") is b1


def test_remove_node_cleans_references():
    graph = Graph()
    a = graph.create_node("http://ex.org/a", True)
    b = graph.create_node("http://ex.org/b", True)
    a.add_property_value("http://v/knows", b)
    graph.remove_node(b)
    assert graph.get_node("http://ex.org/b") is None
    assert a.get_property("http://v/knows") is None


def test_graph_merge_remaps_blank_nodes():
    g1 = Graph()
    a = g1.create_node("http://ex.org/a", True)
    bn1 = g1.create_node()  # _:b0 in g1
    a.add_property_value("http://v/p", bn1)
    bn1.add_property_value("http://v/name", "anon")

    g2 = Graph()
    x = g2.create_node("http://ex.org/x", True)
    bn2 = g2.create_node()  # also _:b0 in g2
    x.add_property_value("http://v/p", bn2)
    bn2.add_property_value("http://v/name", "other anon")

    g1.merge(g2)
    merged_ids = {n.get_id() for n in g1.get_nodes()}
    assert "http://ex.org/a" in merged_ids and "http://ex.org/x" in merged_ids
    # the two blank nodes stay distinct after remapping
    bnodes = [n for n in g1.get_nodes() if n.is_blank_node()]
    names = set()
    for bn in bnodes:
        value = bn.get_property("http://v/name")
        if value is not None:
            names.add(value.get_value())
    assert names == {"anon", "other anon"}


def test_get_document_from_fixture():
    doc = get_document(load_reference_fixture("sample-in.jsonld"), base="http://example.com/doc")
    graph = doc.get_graph()
    node = graph.get_node("http://example.com/id1")
    assert node is not None
    assert node.get_type().get_id() == "http://example.com/t1"
    term1 = node.get_property("http://example.com/term1")
    assert term1.get_value() == "v1"
    # serialization matches the reference's sample-serialized-document
    serialized = graph.to_jsonld()
    expected = load_reference_fixture("sample-serialized-document.jsonld")
    assert serialized == expected


def test_get_document_named_graphs():
    doc = get_document(load_reference_fixture("dataset.jsonld"), base="http://example.com/dataset")
    assert len(doc.get_graph_names()) == 2
    ng = doc.get_graph("http://example.com/named-graph")
    assert ng is not None
    node = ng.get_node("http://example.com/named-graph/node1")
    assert node is not None


SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata not available")
def test_document_from_triples_slice(spark):
    from pyspark.sql import functions as F

    from jsonld_spark.operators.kg_pipeline import kg_triples
    from jsonld_spark.sources.entities import KG, VOCAB, entity_iri

    tri = kg_triples(spark, SF)
    # point lookup: pull one conversation's subgraph to the driver
    rows = tri.where(
        F.col("subject").startswith(KG + "turn/conv-00000000/")
        | F.col("subject").startswith(KG + "entity/")
    ).collect()
    doc = document_from_triples(rows)
    graph = doc.get_graph()
    turn = graph.get_node(KG + "turn/conv-00000000/0")
    assert turn is not None
    assert turn.get_property(VOCAB + "role") is not None
    # reverse adjacency without back-pointer maintenance in Spark:
    # hydrated object graph maintains it locally
    e0 = graph.get_node(entity_iri(0))
    assert e0 is not None and e0.get_reverse_properties()

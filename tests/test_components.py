"""Randomized differential test for the shared connected-components
utility (operators/components.py) — used by the fromRdf chain resolver,
dataset-level URDNA2015, and kg_entity_components."""

from __future__ import annotations

import random

from pyspark.sql import functions as F  # noqa: F401  (parity with peers)

from jsonld_spark.operators.components import connected_components


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return {frozenset(g) for g in groups.values()}


def test_connected_components_random_graphs(spark):
    """Random sparse graphs across two keys: the distributed labels
    must induce exactly the union-find partition, per key."""
    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(5, 40)
        nodes = [f"n{i}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(0, 2 * n))
        ]
        nodes_df = spark.createDataFrame(
            [(k, x) for k in ("k1", "k2") for x in nodes], "key string, node string"
        )
        edges_df = spark.createDataFrame(
            [(k, a, b) for k in ("k1", "k2") for a, b in edges] or
            [("k1", "n0", "n0")],  # createDataFrame needs >= 1 row
            "key string, a string, b string",
        )
        got = connected_components(nodes_df, edges_df).collect()
        expected = _union_find(nodes, edges)
        for key in ("k1", "k2"):
            by_label: dict = {}
            for r in got:
                if r["key"] == key:
                    by_label.setdefault(r["label"], set()).add(r["node"])
            assert {frozenset(g) for g in by_label.values()} == expected, seed
            # labels are canonical: min of the component
            for label, members in by_label.items():
                assert label == min(members)


def test_connected_components_long_chain(spark):
    """A 200-node path converges via pointer jumping (O(log n) rounds,
    not O(n)) and labels the whole chain with its minimum."""
    n = 200
    nodes = spark.createDataFrame(
        [("", f"c{i:03d}") for i in range(n)], "key string, node string"
    )
    edges = spark.createDataFrame(
        [("", f"c{i:03d}", f"c{i + 1:03d}") for i in range(n - 1)],
        "key string, a string, b string",
    )
    got = connected_components(nodes, edges).collect()
    assert len(got) == n
    assert {r["label"] for r in got} == {"c000"}

"""Distributed connected components over small induced subgraphs.

Min-label propagation with POINTER JUMPING (label <- label(label)), the
Shiloach-Vishkin shortcut: O(log D) tiny-table rounds for components of
diameter D instead of O(D) plain propagation. Used by the fromRdf
list-chain resolver (jsonld_ops._chain_ids) and dataset-level URDNA2015
(canonicalize.urdna_dataset_labels) — both operate on subsets that are
small relative to the corpus (list machinery / bnode co-occurrence) but
must not collapse onto one task.

Each round is two joins + an aggregate on the label table plus a
convergence count; tables are localCheckpoint()ed so the loop never
re-derives the (potentially full-corpus) lineage of its inputs. At
cluster scale the checkpoints would go to reliable storage
(df.checkpoint()); the algorithm itself is partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_MAX_ROUNDS = 50  # pointer jumping: covers diameters ~2^50


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_rounds: int = CC_MAX_ROUNDS) -> DataFrame:
    """Label each node with the minimum node id of its component.

    ``nodes``: (key, node) — isolated nodes allowed; ``edges``:
    (key, a, b) — direction ignored (symmetrized here); components
    never span distinct ``key`` values. Returns (key, node, label).
    Labels only decrease, so convergence (no label changed) is exact.
    """
    both = edges.where(F.col("a") != F.col("b")).distinct()
    both = both.unionByName(
        both.select("key", F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = nodes.select(
        "key", "node", F.col("node").alias("label")
    ).distinct().localCheckpoint()
    for _ in range(max_rounds):
        neigh = (
            both.join(
                labels.select("key", F.col("node").alias("b"),
                              F.col("label").alias("nlabel")),
                ["key", "b"],
            )
            .groupBy("key", "a").agg(F.min("nlabel").alias("nmin"))
            .select("key", F.col("a").alias("node"), "nmin")
        )
        new = labels.join(neigh, ["key", "node"], "left").select(
            "key", "node",
            F.least("label", F.coalesce("nmin", "label")).alias("label"),
        )
        jumped = (
            new.join(
                new.select("key", F.col("node").alias("label"),
                           F.col("label").alias("jlabel")),
                ["key", "label"], "left",
            )
            .select("key", "node",
                    F.least("label", F.coalesce("jlabel", "label")).alias("label"))
            .localCheckpoint()
        )
        changed = jumped.join(
            labels.select("key", "node", F.col("label").alias("old_label")),
            ["key", "node"],
        ).where(F.col("label") < F.col("old_label")).count()
        labels = jumped
        if changed == 0:
            return labels
    raise RuntimeError(f"connected components did not converge in {max_rounds} rounds")

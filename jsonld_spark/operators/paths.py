"""Property-path queries over the triple table.

The reference exposes graph navigation imperatively — Node.php's
getProperty/getReverseProperties walks one edge at a time in PHP
(Node.php:200-260, 433-452). At corpus scale the declarative analogue
is a SPARQL 1.1 property-path fragment compiled to DataFrame joins, so
Catalyst plans the whole navigation (join order, broadcast, AQE) and no
per-node driver loop exists:

    pred(p)          one forward step over predicate p
    nps([p1, p2])    negated property set !(p1|p2): any OTHER predicate
    inv(path)        inverse (walk backwards)
    seq(a, b, ...)   sequence: a/b
    alt(a, b, ...)   alternation: a|b
    closure(p, k)    bounded transitive closure p{1,k} (SPARQL's p+
                     capped at k hops — the cap makes cost explicit,
                     like khop_distances)
    closure_all(p)   true unbounded p+ — fixpoint iteration with an
                     explicit round budget and an optional row-count
                     circuit breaker, so runaway closures fail loudly
                     instead of consuming the cluster

Each expression evaluates to a DISTINCT (src, dst) relation over
node-valued objects — IRIs AND blank nodes (both carry
obj_kind='iri' in the triple table); literal objects are not nodes
and are never traversed. Composition is pure relational algebra —
sequence is a join on the shared endpoint, alternation a union,
inverse a column swap — so every path is SQL-expressible and
oracle-checkable exactly.

Design notes for scale: every step relation filters to one predicate
BEFORE joining (predicate pushdown to the triple scan), sequences join
distinct-reduced relations (the (src,dst) projection dedups fan-out
early), and closure reuses the frontier-at-a-time shape of
graph.khop_distances rather than materializing the full reachability
matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonld_spark.operators import scratch


def pred(p: str):
    """One forward step over predicate ``p`` (node-valued objects:
    IRIs and blank nodes; literals excluded)."""
    def rel(triples: DataFrame) -> DataFrame:
        return (
            triples.where((F.col("predicate") == p) & (F.col("obj_kind") == "iri"))
            .select(F.col("subject").alias("src"), F.col("obj_value").alias("dst"))
            .distinct()
        )
    return rel


def nps(excluded: list[str]):
    """Negated property set !(p1|p2|...): one forward step over ANY
    predicate not in ``excluded`` (SPARQL 1.1 §9.1). The NOT IN filter
    sits directly above the triple source, so it is applied before any
    join: against a parquet-backed triple table it is pushed into the
    scan (PushedFilters); against a cached table it is the first
    operator over the in-memory scan (which Spark evaluates against
    cached batches, not parquet metadata)."""
    def rel(triples: DataFrame) -> DataFrame:
        return (
            triples.where(
                (~F.col("predicate").isin(excluded)) & (F.col("obj_kind") == "iri")
            )
            .select(F.col("subject").alias("src"), F.col("obj_value").alias("dst"))
            .distinct()
        )
    return rel


def inv(path):
    """Inverse path: ^p — walk the underlying path backwards."""
    def rel(triples: DataFrame) -> DataFrame:
        r = path(triples)
        return r.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return rel


def seq(*paths):
    """Sequence path a/b/...: relational composition (join on the
    shared endpoint), distinct-reduced at each step so fan-out
    collapses before the next join."""
    if not paths:
        raise ValueError("seq() needs at least one path")

    def rel(triples: DataFrame) -> DataFrame:
        out = paths[0](triples)
        for p in paths[1:]:
            nxt = p(triples).select(
                F.col("src").alias("dst"), F.col("dst").alias("nxt_dst")
            )
            out = (
                out.join(nxt, "dst")
                .select("src", F.col("nxt_dst").alias("dst"))
                .distinct()
            )
        return out
    return rel


def alt(*paths):
    """Alternation a|b|...: union of the step relations."""
    if not paths:
        raise ValueError("alt() needs at least one path")

    def rel(triples: DataFrame) -> DataFrame:
        out = paths[0](triples)
        for p in paths[1:]:
            out = out.unionByName(p(triples))
        return out.distinct()
    return rel


def closure(path, max_hops: int):
    """Bounded transitive closure path{1,max_hops}: frontier-at-a-time
    expansion (the khop_distances shape) — round d joins only the new
    frontier pairs, settled (src, dst) pairs are anti-joined out.

    NOTE: like khop_distances this EXECUTES when evaluated (each
    round's frontier must materialize to drive the early exit)."""
    if max_hops < 1:
        raise ValueError("closure needs max_hops >= 1")

    def rel(triples: DataFrame) -> DataFrame:
        # consumed every round AND referenced by the returned union, so
        # scratch-tracked rather than unpersisted at exit (the caller
        # releases after materializing; operators/scratch.py)
        step = scratch.track(path(triples))
        reach = step
        frontier = step
        for _ in range(max_hops - 1):
            expanded = (
                frontier.join(
                    step.select(F.col("src").alias("dst"), F.col("dst").alias("nxt")),
                    "dst",
                )
                .select("src", F.col("nxt").alias("dst"))
                .distinct()
            )
            nxt = expanded.join(reach, ["src", "dst"], "left_anti").localCheckpoint()
            if nxt.isEmpty():
                break
            reach = reach.unionByName(nxt)
            frontier = nxt
        return reach
    return rel


def closure_all(path, max_rounds: int = 64, max_rows: int | None = None):
    """Unbounded transitive closure p+ — fixpoint iteration (the
    connected-components loop shape, operators/components.py) with
    guard rails: ``max_rounds`` bounds the number of frontier rounds
    (the graph's diameter must be below it — 64 covers any plausible
    real diameter while stopping cyclic runaways), ``max_rows``
    optionally caps the total closure size. Breaching either raises
    RuntimeError instead of silently consuming the cluster: at 100 TB
    an unbounded closure over an adversarial graph is a
    quadratic-output query, and failing loudly with the row count seen
    so far is the only safe default. Executes when evaluated (each
    round's frontier drives the fixpoint test)."""
    if max_rounds < 1:
        raise ValueError("closure_all needs max_rounds >= 1")

    def rel(triples: DataFrame) -> DataFrame:
        step = scratch.track(path(triples))
        reach = step
        frontier = step
        total = None  # lazily counted only when max_rows is set
        if max_rows is not None:
            total = step.count()
            if total > max_rows:
                raise RuntimeError(
                    f"closure_all: step relation alone has {total} rows "
                    f"(> max_rows={max_rows})"
                )
        for _ in range(max_rounds):
            expanded = (
                frontier.join(
                    step.select(F.col("src").alias("dst"), F.col("dst").alias("nxt")),
                    "dst",
                )
                .select("src", F.col("nxt").alias("dst"))
                .distinct()
            )
            nxt = expanded.join(reach, ["src", "dst"], "left_anti").localCheckpoint()
            if nxt.isEmpty():
                return reach
            if max_rows is not None:
                total += nxt.count()
                if total > max_rows:
                    raise RuntimeError(
                        f"closure_all: closure exceeded max_rows={max_rows} "
                        f"({total} pairs and still growing)"
                    )
            reach = reach.unionByName(nxt)
            frontier = nxt
        raise RuntimeError(
            f"closure_all: no fixpoint after max_rounds={max_rounds} "
            "(graph diameter exceeds the budget or the path cycles)"
        )
    return rel


def evaluate(triples: DataFrame, path) -> DataFrame:
    """Evaluate a path expression to its (src, dst) relation. Every
    combinator already returns a distinct relation (pred/seq/alt end in
    distinct; closure unions pairwise-disjoint anti-joined frontiers),
    so no extra dedup is added here — a trailing distinct over a
    closure result would cost a full extra shuffle Catalyst cannot
    remove (the union of checkpointed frontiers is opaque to
    RemoveRedundantAggregates)."""
    return path(triples)

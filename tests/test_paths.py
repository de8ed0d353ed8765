"""Randomized differential tests for the property-path compiler
(operators/paths.py) against naive Python set algebra."""

from __future__ import annotations

import random

from jsonld_spark.operators import paths


def _triples_df(spark, rows):
    # (subject, predicate, obj_kind, obj_value) is all the compiler reads
    return spark.createDataFrame(
        [(s, p, "iri", o, None, None, None) for s, p, o in rows],
        "subject string, predicate string, obj_kind string, obj_value string,"
        " graph string, obj_type string, obj_lang string",
    )


def _naive(rows, p):
    return {(s, o) for s, pr, o in rows if pr == p}


def _naive_seq(a, b):
    return {(s, o2) for s, o in a for s2, o2 in b if o == s2}


def _naive_closure(rel, k):
    # independent formulation: p{1,k} = p U p^2 U ... U p^k by
    # DEFINITION (full iterated composition, no frontier pruning or
    # early exit — structurally unlike the implementation, so a
    # systematic frontier-algorithm flaw cannot hide here)
    reach = set(rel)
    power = set(rel)
    for _ in range(k - 1):
        power = _naive_seq(power, rel)
        reach |= power
    return reach


def _rows(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def test_path_algebra_random_graphs(spark):
    """pred/inv/seq/alt evaluate to exactly the relational-algebra
    result on random multi-predicate graphs."""
    for seed in range(5):
        rng = random.Random(seed)
        nodes = [f"n{i}" for i in range(rng.randint(4, 15))]
        rows = [
            (rng.choice(nodes), rng.choice("pq"), rng.choice(nodes))
            for _ in range(rng.randint(5, 60))
        ]
        t = _triples_df(spark, rows)
        p, q = _naive(rows, "p"), _naive(rows, "q")
        assert _rows(paths.evaluate(t, paths.pred("p"))) == p, seed
        assert _rows(paths.evaluate(t, paths.inv(paths.pred("q")))) == {
            (o, s) for s, o in q
        }, seed
        assert _rows(
            paths.evaluate(t, paths.seq(paths.pred("p"), paths.pred("q")))
        ) == _naive_seq(p, q), seed
        assert _rows(
            paths.evaluate(t, paths.alt(paths.pred("p"), paths.pred("q")))
        ) == (p | q), seed
        # composite: ^p / (p | q)
        got = _rows(
            paths.evaluate(
                t,
                paths.seq(
                    paths.inv(paths.pred("p")),
                    paths.alt(paths.pred("p"), paths.pred("q")),
                ),
            )
        )
        assert got == _naive_seq({(o, s) for s, o in p}, p | q), seed


def test_path_negated_property_set(spark):
    """nps([p]) steps over every predicate except p — and composes."""
    for seed in range(3):
        rng = random.Random(300 + seed)
        nodes = [f"n{i}" for i in range(rng.randint(4, 12))]
        rows = [
            (rng.choice(nodes), rng.choice("pqr"), rng.choice(nodes))
            for _ in range(rng.randint(5, 40))
        ]
        t = _triples_df(spark, rows)
        q_or_r = _naive(rows, "q") | _naive(rows, "r")
        assert _rows(paths.evaluate(t, paths.nps(["p"]))) == q_or_r, seed
        got = _rows(paths.evaluate(t, paths.seq(paths.pred("p"), paths.nps(["p", "q"]))))
        assert got == _naive_seq(_naive(rows, "p"), _naive(rows, "r")), seed


def test_path_closure_random_graphs(spark):
    """Bounded closure p{1,k} equals the iterated naive expansion,
    including early convergence below the cap."""
    for seed in range(4):
        rng = random.Random(50 + seed)
        nodes = [f"n{i}" for i in range(rng.randint(4, 12))]
        rows = [
            (rng.choice(nodes), "p", rng.choice(nodes))
            for _ in range(rng.randint(3, 25))
        ]
        t = _triples_df(spark, rows)
        rel = _naive(rows, "p")
        for k in (1, 2, 4):
            got = _rows(paths.evaluate(t, paths.closure(paths.pred("p"), k)))
            assert got == _naive_closure(rel, k), (seed, k)


def test_path_closure_chain_converges_under_cap(spark):
    """A 6-node chain with cap 10: closure stops when the frontier
    empties (round 6), yielding all 15 ancestor pairs."""
    rows = [(f"c{i}", "p", f"c{i + 1}") for i in range(5)]
    t = _triples_df(spark, rows)
    got = _rows(paths.evaluate(t, paths.closure(paths.pred("p"), 10)))
    assert got == {
        (f"c{i}", f"c{j}") for i in range(6) for j in range(i + 1, 6)
    }


def test_path_ignores_literal_objects(spark):
    """Steps traverse IRI edges only — literal objects are not nodes."""
    t = spark.createDataFrame(
        [("a", "p", "iri", "b", None, None, None),
         ("a", "p", "literal", "text", None, None, None)],
        "subject string, predicate string, obj_kind string, obj_value string,"
        " graph string, obj_type string, obj_lang string",
    )
    assert _rows(paths.evaluate(t, paths.pred("p"))) == {("a", "b")}


def test_closure_all_reaches_fixpoint(spark):
    """closure_all == definitional p+ (p U p^2 U ... to fixpoint) on
    random DAG-ish graphs; on a chain it returns all ancestor pairs."""
    import pytest

    for seed in range(3):
        rng = random.Random(90 + seed)
        nodes = [f"n{i}" for i in range(rng.randint(4, 10))]
        # acyclic by construction (edges only go up-index) so the
        # fixpoint exists and the naive definitional answer is finite
        rows = []
        for _ in range(rng.randint(3, 20)):
            i, j = sorted(rng.sample(range(len(nodes)), 2))
            rows.append((nodes[i], "p", nodes[j]))
        t = _triples_df(spark, rows)
        rel = _naive(rows, "p")
        want = _naive_closure(rel, len(nodes))  # k=n is past any fixpoint
        got = _rows(paths.evaluate(t, paths.closure_all(paths.pred("p"))))
        assert got == want, seed


def test_closure_all_cycle_terminates_at_fixpoint(spark):
    """A cycle has a finite closure (all pairs on the cycle) — the
    fixpoint terminates even though paths are infinite."""
    rows = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")]
    t = _triples_df(spark, rows)
    got = _rows(paths.evaluate(t, paths.closure_all(paths.pred("p"))))
    assert got == {(x, y) for x in "abc" for y in "abc"}


def test_closure_all_round_budget_raises(spark):
    """A long chain with a tiny round budget fails loudly."""
    import pytest

    rows = [(f"c{i}", "p", f"c{i + 1}") for i in range(8)]
    t = _triples_df(spark, rows)
    with pytest.raises(RuntimeError, match="max_rounds"):
        paths.evaluate(t, paths.closure_all(paths.pred("p"), max_rounds=3))


def test_closure_all_row_breaker_raises(spark):
    """The row-count circuit breaker trips before materializing a
    quadratic closure."""
    import pytest

    rows = [(f"c{i}", "p", f"c{i + 1}") for i in range(9)]
    t = _triples_df(spark, rows)
    with pytest.raises(RuntimeError, match="max_rows"):
        paths.evaluate(t, paths.closure_all(paths.pred("p"), max_rows=12))

"""Round-5 operator families: interval joins, KMV sketch, neighbor
similarity — randomized differentials against plain-Python references
(independent formulations; the DuckDB oracles are the driver gate)."""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

BASE = datetime(2023, 1, 1)


def _random_events(rng, n_keys=4, n_rows=60):
    rows = []
    for i in range(n_rows):
        rows.append((
            i,
            f"k{rng.randrange(n_keys)}",
            BASE + timedelta(seconds=rng.randrange(0, 5000)),
        ))
    return rows


def test_as_of_join_matches_python_reference(spark):
    from jsonld_spark.operators.interval import as_of_join

    for seed in range(5):
        rng = random.Random(seed)
        left_rows = _random_events(rng)
        right_rows = [
            (f"k{rng.randrange(4)}",
             BASE + timedelta(seconds=rng.randrange(0, 5000)),
             rng.randrange(100))
            for _ in range(25)
        ]
        left = spark.createDataFrame(
            left_rows, "event_id long, key string, ts timestamp")
        right = spark.createDataFrame(
            right_rows, "key string, ts timestamp, payload long")
        got = {
            (r["event_id"], r["payload"])
            for r in as_of_join(
                left, right, key="key", left_ts="ts", right_ts="ts",
                value_cols=["payload"],
            ).collect()
        }
        # reference: latest right with ts <= left ts; ties on right ts
        # broken like the window does (last in sort order — for equal
        # (key, ts) the later-sorted payload wins); keep fixtures
        # collision-free instead of modeling the tiebreak
        by_key = {}
        for k, ts, p in right_rows:
            by_key.setdefault(k, []).append((ts, p))
        seen_ts = {}
        collision = False
        for k, ts, p in right_rows:
            if (k, ts) in seen_ts:
                collision = True
            seen_ts[(k, ts)] = p
        if collision:
            continue
        want = set()
        for eid, k, ts in left_rows:
            cands = [(rts, p) for rts, p in by_key.get(k, []) if rts <= ts]
            want.add((eid, max(cands)[1] if cands else None))
        assert got == want, seed


def test_binned_range_join_matches_python_reference(spark):
    from jsonld_spark.operators.interval import binned_range_join

    for seed in range(5):
        rng = random.Random(100 + seed)
        pts = _random_events(rng)
        ivals = [
            (f"k{rng.randrange(4)}", rng.randrange(10),
             BASE + timedelta(seconds=(s := rng.randrange(0, 4500))),
             BASE + timedelta(seconds=s + rng.randrange(1, 1500)))
            for _ in range(15)
        ]
        points = spark.createDataFrame(
            pts, "event_id long, key string, ts timestamp")
        intervals = spark.createDataFrame(
            ivals, "key string, win_id long, win_start timestamp, win_end timestamp")
        for bin_s in (60, 600, 7200):  # smaller/near/larger than intervals
            got = {
                (r["event_id"], r["win_id"])
                for r in binned_range_join(
                    points, intervals, key="key", point_ts="ts",
                    start_col="win_start", end_col="win_end",
                    payload_cols=["win_id"], bin_seconds=bin_s,
                ).collect()
            }
            want = {
                (eid, wid)
                for eid, k, ts in pts
                for ik, wid, s, e in ivals
                if ik == k and s <= ts < e
            }
            assert got == want, (seed, bin_s)


def test_kmv_estimate_properties(spark):
    """KMV: exact below k, within ~4/sqrt(k) relative error above it,
    and bit-reproducible across partitionings."""
    from jsonld_spark.operators.sketch import KMV_K, kmv_distinct

    rows = [("small", f"v{i}") for i in range(20)]
    rows += [("big", f"w{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, val string")
    out = {r["grp"]: r for r in kmv_distinct(df, "grp", "val").collect()}
    assert out["small"]["exact_distinct"] == 20
    assert out["small"]["kmv_estimate"] == 20.0  # below k -> exact
    assert out["small"]["sketch_size"] == 20
    big = out["big"]
    assert big["exact_distinct"] == 2000
    assert big["sketch_size"] == KMV_K
    rel_err = abs(big["kmv_estimate"] - 2000) / 2000
    assert rel_err < 4 / (KMV_K ** 0.5), big["kmv_estimate"]

    repart = {
        r["grp"]: r["kmv_estimate"]
        for r in kmv_distinct(df.repartition(13), "grp", "val").collect()
    }
    assert repart["big"] == big["kmv_estimate"]  # deterministic


def test_neighbor_similarity_matches_python_reference(spark):
    from jsonld_spark.operators.graph import neighbor_similarity

    for seed in range(4):
        rng = random.Random(seed)
        n = 30
        edges_set = {
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
            for _ in range(80)
        }
        edges_set = {(a, b) for a, b in edges_set if a != b}
        edges = spark.createDataFrame(sorted(edges_set), "src string, dst string")
        max_deg, min_common = 5, 1
        got = {
            (r["node_a"], r["node_b"]): (r["n_common"], round(r["jaccard"], 9))
            for r in neighbor_similarity(
                edges, max_deg=max_deg, min_common=min_common
            ).collect()
        }
        # python reference: undirected adjacency, drop hub NEIGHBORS,
        # jaccard over the filtered sets
        und = {tuple(sorted(e)) for e in edges_set}
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        deg = {v: len(nbs) for v, nbs in adj.items()}
        fadj = {
            v: {nb for nb in nbs if deg[nb] <= max_deg}
            for v, nbs in adj.items()
        }
        want = {}
        nodes = sorted(adj)
        for i, x in enumerate(nodes):
            for y in nodes[i + 1:]:
                common = fadj[x] & fadj[y]
                if len(common) >= min_common:
                    denom = len(fadj[x]) + len(fadj[y]) - len(common)
                    want[(x, y)] = (len(common), round(len(common) / denom, 9))
        assert got == want, seed


def test_neighbor_similarity_hub_neighbors_are_ignored(spark):
    """A hub neighbor (degree > max_deg) contributes NO similarity:
    the star around it yields no pairs."""
    from jsonld_spark.operators.graph import neighbor_similarity

    rows = [("hub", f"leaf{i}") for i in range(10)]
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = neighbor_similarity(edges, max_deg=5, min_common=1).collect()
    assert out == []


def test_kmv_hash_matches_sql_digit_arithmetic(spark):
    """The Spark conv() hash and the SQL per-digit arithmetic agree."""
    import duckdb

    from jsonld_spark.operators.sketch import _hv_expr, _hv_sql

    vals = ["alpha", "beta", "", "Zürich", "123"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["v"]: r["hv"] for r in df.select("v", _hv_expr(F.col("v")).alias("hv")).collect()}
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            f"SELECT {_hv_sql('?')}".replace("md5(?)", "md5($1)"), [v]
        ).fetchone()[0]
        assert got[v] == want, v


def test_as_of_join_null_value_columns_stay_atomic(spark):
    """A NULL in one right-side value column must NOT tear the matched
    row (per-column fills would fall through to an older row's value;
    review finding): the whole matched row rides as one struct."""
    from jsonld_spark.operators.interval import as_of_join

    left = spark.createDataFrame(
        [(1, "k", BASE + timedelta(seconds=30))],
        "event_id long, key string, ts timestamp")
    right = spark.createDataFrame(
        [("k", BASE + timedelta(seconds=10), 1, "a"),
         ("k", BASE + timedelta(seconds=20), 2, None)],
        "key string, ts timestamp, version long, val string")
    rows = as_of_join(
        left, right, key="key", left_ts="ts", right_ts="ts",
        value_cols=["version", "val"],
    ).collect()
    assert len(rows) == 1
    # the matched row is (version=2, val=NULL) — never (2, 'a')
    assert rows[0]["version"] == 2 and rows[0]["val"] is None


def test_neighbor_similarity_ignores_self_loops(spark):
    """Self-loop edges must not double degrees or create self-neighbor
    wedges (review finding): with a self-loop on the shared neighbor,
    jaccard stays what the loop-free graph gives."""
    from jsonld_spark.operators.graph import neighbor_similarity

    rows = [("a", "b"), ("c", "b"), ("b", "b"), ("a", "a")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = neighbor_similarity(edges, max_deg=5, min_common=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["node_a"], r["node_b"]) == ("a", "c")
    # fadj(a) = {b}, fadj(c) = {b} -> jaccard 1/(1+1-1) = 1.0
    assert r["n_common"] == 1 and r["jaccard"] == 1.0


def test_count_min_is_one_sided_and_exact_python_parity(spark):
    """CM guarantee: estimate >= true count for every probe; and the
    whole sketch matches an exact Python recompute of the same
    (md5-salted-hash mod width) construction."""
    import hashlib
    from jsonld_spark.operators import sketch

    rows = [("join",)] * 5 + [("hash",)] * 3 + [("x1",), ("x2",), ("x3",)]
    vals = spark.createDataFrame(rows, "token string")
    probes = ["join", "hash", "x1", "missing"]
    got = {
        r["term"]: (r["true_count"], r["cm_estimate"])
        for r in sketch.count_min_frequencies(
            vals, "token", probes=probes, depth=3, width=4).collect()
    }

    def bucket(tok, r, w):
        hv = int(hashlib.md5(f"{r}:{tok}".encode()).hexdigest()[:15], 16)
        return hv % w

    table: dict[tuple[int, int], int] = {}
    for (tok,) in rows:
        for r in range(3):
            key = (r, bucket(tok, r, 4))
            table[key] = table.get(key, 0) + 1
    want = {}
    for p in probes:
        true = sum(1 for (t,) in rows if t == p)
        est = min(table.get((r, bucket(p, r, 4)), 0) for r in range(3))
        want[p] = (true, est)
    assert got == want
    assert all(est >= true for true, est in got.values())


def test_count_min_wide_sketch_is_exact(spark):
    """With width >> distinct values and no collisions, every estimate
    equals the true count."""
    from jsonld_spark.operators import sketch

    rows = [(f"t{i % 7}",) for i in range(70)]
    vals = spark.createDataFrame(rows, "token string")
    got = sketch.count_min_frequencies(
        vals, "token", probes=[f"t{i}" for i in range(7)],
        depth=4, width=4096).collect()
    assert all(r["cm_estimate"] == r["true_count"] == 10 for r in got)


def test_count_min_empty_bucket_counts_as_zero(spark):
    """Regression (round-5 review): a probe whose bucket is empty in
    SOME depth rows must estimate through the zero counter — the
    inner-join formulation silently dropped empty buckets and
    overshot. Here 'p0' collides with 'a' in one row but hits an empty
    bucket in another, so the true CM estimate is 0."""
    from jsonld_spark.operators import sketch

    vals = spark.createDataFrame([("a",)], "token string")
    got = sketch.count_min_frequencies(
        vals, "token", probes=["p0"], depth=2, width=4).collect()
    assert got[0]["true_count"] == 0
    assert got[0]["cm_estimate"] == 0

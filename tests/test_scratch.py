"""Cache lifecycle for the graph/path family (VERDICT r3 #3): running
many graph queries in one session must not accumulate orphaned executor
storage — every operator-internal cache is scratch-tracked and freed by
``scratch.release()`` once results are materialized."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonld_spark.operators import graph, paths, scratch


def _edges(spark):
    rows = [(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(40)] + [
        (f"n{i}", f"n{(i + 1) % 40}") for i in range(40)
    ]
    return spark.createDataFrame(rows, "src string, dst string")


def test_graph_family_scratch_release(spark):
    scratch.release()  # isolate from earlier tests
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()

    edges = _edges(spark)  # NOT cached: operators scratch-track it
    seeds = spark.createDataFrame([("n0",)], "node string")

    results = [
        graph.triangle_counts(edges),
        graph.pagerank_fixedpoint(edges, iterations=2),
        graph.personalized_pagerank_fixedpoint(edges, seeds, iterations=2),
        graph.khop_distances(edges, seeds, k=3),
        graph.ego_subgraph(edges, seeds, k=2),
        graph.neighbor_sample(edges, k=4),
        graph.degree_histogram(edges),
    ]
    for df in results:
        assert df.count() >= 0  # materialize everything

    t = edges.select(
        F.lit(None).cast("string").alias("graph"),
        F.col("src").alias("subject"),
        F.lit("p").alias("predicate"),
        F.lit("iri").alias("obj_kind"),
        F.col("dst").alias("obj_value"),
        F.lit(None).cast("string").alias("obj_type"),
        F.lit(None).cast("string").alias("obj_lang"),
    )
    paths.evaluate(t, paths.closure(paths.pred("p"), 3)).count()
    paths.evaluate(t, paths.closure_all(paths.pred("p"))).count()

    tracked = list(scratch._SCRATCH)
    assert len(tracked) >= 8  # the family registered its internals

    def live_count():
        n = 0
        for rdd in jsc.getPersistentRDDs().values():
            lvl = rdd.getStorageLevel()
            if lvl.useMemory() or lvl.useDisk():
                n += 1
        return n

    live_before_release = live_count()
    released = scratch.release()
    assert released == len(tracked)
    assert scratch.tracked_count() == 0
    for df in tracked:
        assert not df.is_cached  # storage level reset to NONE

    # every tracked .cache() entry is gone NOW; what remains is
    # localCheckpoint residue (khop/ego/closure round frontiers),
    # which the ContextCleaner reclaims on GC. The release must have
    # dropped the persistent set by exactly the tracked caches that
    # made it to storage — so the live count shrinks by at least the
    # majority of tracked entries (some lazy caches were never
    # materialized and occupy nothing).
    assert live_count() <= live_before_release - len(tracked) // 2
    assert before <= live_before_release  # family really added storage


def test_khop_step_cache_freed_eagerly(spark):
    """khop's step relation is loop-local — it must be unpersisted at
    function exit, not deferred to release()."""
    scratch.release()
    edges = _edges(spark).cache()  # caller-owned; not tracked
    seeds = spark.createDataFrame([("n0",)], "node string")
    n_before = scratch.tracked_count()
    graph.khop_distances(edges, seeds, k=2)
    # only the seed-dist table is tracked; the step cache is already
    # gone (it never enters the registry)
    assert scratch.tracked_count() == n_before + 1
    scratch.release()
    edges.unpersist()

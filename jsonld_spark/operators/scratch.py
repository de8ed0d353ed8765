"""Scratch-cache registry for iterative operators (VERDICT r3 #3).

The graph/path operators cache intermediates that are consumed several
times inside one logical query (edge projections, degree joins, step
relations). Some of those caches remain referenced by the *returned*
lazy DataFrame, so the operator cannot unpersist them at function exit
without forcing recomputation on the caller's first action. Instead
every such cache is registered here, and the caller releases them once
results are materialized:

    from jsonld_spark.operators import scratch
    ... run graph/path queries, materialize results ...
    scratch.release()          # unpersists every tracked cache

One query per session needs nothing; a long session running many graph
queries calls ``release()`` between batches so executor storage does
not accumulate until eviction pressure (bench.py --graph does this).
Caches the CALLER created (e.g. __spark_entry__.cached_edges) are never
tracked here — caller-owned lifecycles stay caller-owned.

Prefer ``scope()`` over a global ``release()`` when other lazy plans
built earlier in the session may still reference their own scratch
caches — a global release would unpersist those too, silently
re-introducing the per-consumer recomputation the caches prevent.

The registry is a process-global list with no locking: it assumes the
single-threaded Spark DRIVER pattern (one thread builds queries and
releases scratch). Concurrent job submission from multiple driver
threads must coordinate externally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it for a later ``release()``."""
    df = df.cache()
    _SCRATCH.append(df)
    return df


def release() -> int:
    """Unpersist every tracked scratch cache; returns how many."""
    n = 0
    for df in _SCRATCH:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _SCRATCH.clear()
    return n


def tracked_count() -> int:
    return len(_SCRATCH)


class scope:
    """Context manager scoping releases to caches tracked WITHIN it:

        with scratch.scope():
            df = graph.triangle_counts(edges)
            df.count()
        # only the caches triangle_counts tracked are now released

    Use when other lazy query plans built earlier in the session still
    reference their own scratch caches — a global ``release()`` would
    unpersist those too, silently re-introducing the per-consumer
    recomputation the caches exist to prevent. Materialize everything
    built inside the scope before it exits."""

    def __enter__(self):
        self._mark = len(_SCRATCH)
        return self

    def __exit__(self, *exc):
        for df in _SCRATCH[self._mark:]:
            try:
                df.unpersist()
            except Exception:
                pass
        del _SCRATCH[self._mark:]
        return False

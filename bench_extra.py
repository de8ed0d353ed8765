"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the driver contract — ``bench.py`` stays frozen. This file exists so
optimization work can (a) time one query at a time against the noop sink
(so the computation is measured, not the sink or the driver collect),
(b) dump ``.explain("formatted")`` plans into ``plans/rNN/`` for the
before/after evidence the round deliverables require, and (c) run the
same query repeatedly without paying for the rest of the headline list.

Usage:
    python bench_extra.py --tag before --queries dedup_simhash_suite
    python bench_extra.py --tag after  --reps 3 --queries kg_pagerank
    python bench_extra.py --plans-only --tag before   # dump all plans

Timing methodology: same warm-up as bench.py (one kg_triples pass at
sf0.001), then per query REPS passes of a noop-sink write; a fresh
queries() map per pass (so per-query caches never survive a pass), and
``spark.catalog.clearCache()`` between passes. Reported per query:
every sample plus the min.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None,
                    help="query names (default: bench.py HEADLINE list)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default=None,
                    help="dump plans/rNN/<q>_<tag>.txt explain output")
    ap.add_argument("--round", default="r06")
    ap.add_argument("--plans-only", action="store_true",
                    help="dump plans, skip timing")
    ap.add_argument("--count", action="store_true",
                    help="time df.count() instead of the noop sink "
                         "(bench.py methodology, for comparability)")
    args = ap.parse_args()

    import bench as benchmod
    from jsonld_spark.plans.session import get_spark
    import __spark_entry__ as entrymod

    names = args.queries or benchmod.HEADLINE
    spark = get_spark(
        app_name="jsonld-spark-bench-extra", cores=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext

    plan_dir = os.path.join(REPO_ROOT, "plans", args.round)
    if args.tag:
        os.makedirs(plan_dir, exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = entrymod.queries()[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.catalog.clearCache()
        from jsonld_spark.operators import scratch
        scratch.release()
    if args.plans_only:
        print(json.dumps({"plans": names, "dir": plan_dir}))
        return

    # warm-up (same as bench.py): Python workers + codegen
    entrymod.queries()["kg_triples"](spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    from jsonld_spark.operators import scratch
    scratch.release()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        queries = entrymod.queries()
        spark.catalog.clearCache()
        for name in names:
            df = queries[name](spark, SF_DIR)
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            if args.count:
                df.count()
            else:
                noop(df)
            samples[name].append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        scratch.release()
    print(json.dumps({
        "sink": "count" if args.count else "noop",
        "reps": args.reps,
        "queries_min": {n: min(s) for n, s in samples.items()},
        "samples": samples,
        "loadavg": round(os.getloadavg()[0], 2),
        "cores": CPUS,
    }))


if __name__ == "__main__":
    main()

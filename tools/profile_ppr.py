"""One-off phase profiler for the PPR-vs-PR gap (VERDICT r4 #7).

Times, on the sf0.1 IRI-edge graph with a prebuilt reversed
edges_with_outdeg cache: plain PR, PPR end-to-end, and PPR's seed/
present subplan in isolation. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from jsonld_spark.operators import graph, scratch
    from jsonld_spark.operators.kg_pipeline import kg_triples
    from jsonld_spark.plans.session import get_spark

    spark = get_spark(app_name="ppr-profile",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tri = kg_triples(spark, SF_DIR).cache()
    tri.count()
    edges = graph.iri_edges(tri).cache()
    edges.count()
    seeds = spark.createDataFrame(
        [("http://kg.example/entity/E0",)], "node string")

    out = {}
    t0 = time.time()
    resrc = graph.edges_with_outdeg(edges, reverse=True).cache()
    resrc.count()
    out["resrc_build_sec"] = round(time.time() - t0, 3)

    # the seed-presence subplan alone
    e = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    seed_nodes = seeds.select("node").distinct()
    present = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .join(F.broadcast(seed_nodes), "node")
        .distinct()
    )
    t0 = time.time()
    present.count()
    out["present_sec"] = round(time.time() - t0, 3)

    for label, fn in (
        ("pr", lambda: graph.pagerank_fixedpoint(edges)),
        ("ppr_prebuilt", lambda: graph.personalized_pagerank_fixedpoint(
            edges, seeds, reverse=True, esrc=resrc)),
        ("ppr_own_esrc", lambda: graph.personalized_pagerank_fixedpoint(
            edges, seeds, reverse=True)),
    ):
        for rep in range(2):
            t0 = time.time()
            n = fn().count()
            out[f"{label}_rep{rep}_sec"] = round(time.time() - t0, 3)
            out[f"{label}_rows"] = n
            scratch.release()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

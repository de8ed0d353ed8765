"""ANN recall report: LSH (corpus-scaled planes + multiprobe) and IVF
top-k vs the exact brute-force baseline at a given scale factor.

Usage: python tools/ann_recall.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line; numbers land in BENCH/BASELINE.md.
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
    from jsonld_spark.operators import similarity as S
    from jsonld_spark.plans.session import get_spark, read_table

    spark = get_spark(app_name="ann-recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    n_vecs = read_table(spark, SF_DIR, "embeddings").count()

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    t0 = time.time()
    brute = pairs(S.brute_force_topk(spark, SF_DIR))
    brute_sec = time.time() - t0
    out = {"metric": "ann_recall_vs_brute", "sf_dir": SF_DIR, "n_vecs": n_vecs,
           "k": S.TOP_K, "n_queries": S.N_QUERIES,
           "brute_sec": round(brute_sec, 2), "variants": {}}
    variants = (
        # the recall curve (VERDICT r4 #4): single-table is the r1-r4
        # construction; multitable is the round-5 default (L bit-slice
        # tables over the same sign word, OR-combined candidates)
        ("lsh_single_table", lambda sp, sf: S.lsh_ann_topk(sp, sf, max_tables=1)),
        ("lsh_multitable", S.lsh_ann_topk),
        (f"ivf_nprobe{S.IVF_NPROBE}", S.ivf_topk),
    )
    for name, fn in variants:
        t0 = time.time()
        got = pairs(fn(spark, SF_DIR))
        sec = time.time() - t0
        out["variants"][name] = {
            "recall": round(len(got & brute) / len(brute), 4) if brute else 1.0,
            "returned": len(got),
            "sec": round(sec, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

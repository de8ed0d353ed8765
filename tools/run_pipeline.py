"""spark-submit entry point for the KG-construction pipeline.

Usage (local sandbox):
    python tools/run_pipeline.py --input /root/testdata/sf0.01 \
        --output /tmp/kg_out --buckets 8

Usage (cluster):
    python -c "from jsonld_spark.plans.session import ensure_package_shipped" # or:
    zip -r jsonld_spark.zip jsonld_spark
    spark-submit --py-files jsonld_spark.zip tools/run_pipeline.py \
        --input <transcripts table/dir> --output <warehouse path> --buckets 256

The job is resumable: re-submitting after a failure skips buckets
recorded complete in the output table's last committed manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="sf dir containing events.parquet")
    parser.add_argument("--output", required=True, help="snapshot table root")
    parser.add_argument("--buckets", type=int, default=16)
    parser.add_argument("--cores", type=int, default=None)
    args = parser.parse_args()

    from jsonld_spark.plans.session import get_spark
    from jsonld_spark.streaming.resume import read_triples, run_resumable

    spark = get_spark(app_name="kg-pipeline", cores=args.cores)
    t0 = time.time()
    table = run_resumable(spark, args.input, args.output, n_buckets=args.buckets)
    manifest = table.latest_manifest()
    triples = read_triples(spark, args.output)  # cross-bucket dedup view
    n = triples.count() if triples is not None else 0
    print(json.dumps({
        "completed_buckets": manifest["completed_buckets"],
        "snapshot": manifest["snapshot_id"],
        "sequence": manifest["sequence"],
        "triples_committed": n,
        "wall_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()

"""Replicated-corpus volume check for the documents/embeddings ops.

Replicates the sf-dir documents table DOC_REPS times (doc_id offset
10^7 per replica — divisible by every planted mod-schedule, so the
PII/decontamination/langid fixtures keep their density) and the
embeddings table EMB_REPS times (replicas shifted +1, which ROTATES
the residue class: replica copies of residue-6 originals become eval
items, so the contamination eval set grows with the corpus — 50 ->
1,600 items at 32x, making the sweep a deliberately harder 102M-pair
check; the recorded BENCH/BASELINE.md numbers use exactly this
construction), writes them to a scratch dir, and times the curation
operators end-to-end. This check caught two plan bugs invisible at
sf0.1 (see BENCH/BASELINE.md "Volume check" section): scale evidence
is only evidence if the job actually runs at scale.

Usage: python tools/volume_check.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jsonld_spark.plans.session import get_spark

DOC_REPS = 128
EMB_REPS = 32
OFFSET = 10**7


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/volume_check_corpus"
    spark = get_spark(app_name="volume-check", cores=32,
                      shuffle_partitions=64)

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    rep = spark.range(DOC_REPS).select(F.col("id").alias("r"))
    big = docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("r") * OFFSET).alias("doc_id"),
        "text", "lang", "source", "n_chars")
    big.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    rep2 = spark.range(EMB_REPS).select(F.col("id").alias("r"))
    bigemb = emb.crossJoin(rep2).select(
        F.when(F.col("r") == 0, F.col("vec_id"))
         .otherwise(F.col("vec_id") + F.col("r") * OFFSET + 1)
         .alias("vec_id"),
        "embedding")
    bigemb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    # count the WRITTEN files (parquet footer metadata, nearly free) —
    # counting big/bigemb would re-run the replication crossJoins
    n_docs = spark.read.parquet(f"{out}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{out}/embeddings.parquet").count()
    print(f"corpus written: {n_docs} docs ({DOC_REPS}x), "
          f"{n_vecs} vectors ({EMB_REPS}x)")

    from jsonld_spark.operators import (
        dedup, relational, scratch, search, similarity, sketch, suites,
    )

    cases = [
        ("decontaminate", lambda: dedup.decontaminate(spark, out)),
        ("token_budget_mix", lambda: relational.token_budget_mix(spark, out)),
        ("bm25_topk", lambda: search.bm25_topk(spark, out)),
        ("count_min", lambda: sketch.corpus_token_count_min(spark, out)),
        ("text_stats_suite", lambda: suites.text_stats_suite(spark, out)),
        ("embedding_contamination",
         lambda: similarity.embedding_contamination(spark, out)),
        # NOTE: the pair-emitting dedup ops (minhash/simhash/jaccard)
        # are deliberately absent: a 128x-replicated corpus makes
        # EVERY doc a 128-way duplicate, so the output itself is
        # O(replicas^2 x docs) — the blowup is in the answer, not the
        # plan. Their skew behavior is covered by the planted tests.
    ]
    for name, fn in cases:
        with scratch.scope():
            t0 = time.monotonic()
            n = fn().count()
            dt = time.monotonic() - t0
        print(f"{name}: {n} rows in {dt:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

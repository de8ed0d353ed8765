"""Resumable, bucket-incremental pipeline execution.

The reference is a batch in-memory library; the scale rebuild instead
processes the transcript corpus in conv-id hash buckets, committing
each bucket's triples + lineage as an atomic snapshot. A killed job
re-run skips `completed_buckets` from the last committed manifest —
idempotent resume without reprocessing (BASELINE.md "Resumability").

At 10^12 turns the buckets would be Iceberg partition predicates over
the transcripts table (partition pruning makes the re-scan free); here
the same pruning happens via a pushed-down hash filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonld_spark.operators.kg_pipeline import QUAD_COLUMNS, transcripts_to_triples
from jsonld_spark.operators.lineage import bucket_of, lineage_metrics
from jsonld_spark.sources.tables import SnapshotTable
from jsonld_spark.sources.transcripts import transcripts_from_events


def run_resumable(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    n_buckets: int = 4,
    fail_after: int | None = None,
) -> SnapshotTable:
    """Run the pipeline bucket-by-bucket with snapshot commits.

    ``fail_after`` aborts after N bucket commits (test hook simulating
    a killed job); re-invoking resumes from the manifest.
    """
    table = SnapshotTable(out_root)
    done = table.completed_buckets()
    transcripts = transcripts_from_events(spark, sf_dir).withColumn(
        "bucket", bucket_of(F.col("conv_id"), n_buckets)
    )
    committed = 0
    for bucket in range(n_buckets):
        if bucket in done:
            continue
        part = transcripts.where(F.col("bucket") == bucket).drop("bucket")
        quads = transcripts_to_triples(part, keep_lineage=True)
        lineage = lineage_metrics(quads, n_buckets)
        from jsonld_spark.operators.extract import entity_triples

        triples = (
            quads.select(*QUAD_COLUMNS)
            .unionByName(entity_triples(part))
            .dropDuplicates(QUAD_COLUMNS)
        )
        table.commit(triples, [bucket], lineage=lineage)
        committed += 1
        if fail_after is not None and committed >= fail_after:
            break  # simulated crash after commit point
    return table


def read_triples(spark: SparkSession, out_root: str) -> DataFrame | None:
    """Read the committed triple set (cross-bucket dedup applied on
    read; entity triples can legitimately appear in many buckets)."""
    df = SnapshotTable(out_root).read(spark)
    if df is None:
        return None
    return df.dropDuplicates(QUAD_COLUMNS)

"""Structured Streaming ingestion for the KG pipeline.

The reference is a batch, in-memory library (SURVEY.md §2.6), so this
is engine capability beyond it: transcripts arriving as files are
processed incrementally — ``readStream`` -> the same S1..S7 stages via
``foreachBatch`` -> atomic SnapshotTable commits. The stream
checkpoint gives exactly-once per input file; the snapshot manifest
gives atomic visibility (same guarantees as the batch resume path,
arrived-data-driven instead of bucket-driven).

``windowed_mention_counts`` is the watermarked windowed-aggregation
shape for late data (sliding entity-mention counts per hour).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonld_spark.operators.extract import _link_map_expr
from jsonld_spark.operators.kg_pipeline import QUAD_COLUMNS, transcripts_to_triples
from jsonld_spark.operators.lineage import lineage_metrics
from jsonld_spark.sources.tables import SnapshotTable

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def stream_transcripts_to_triples(
    spark: SparkSession,
    input_dir: str,
    out_root: str,
    checkpoint_dir: str,
    n_lineage_buckets: int = 8,
) -> SnapshotTable:
    """Process all transcript parquet files not yet seen by the
    checkpoint (Trigger.AvailableNow), committing each micro-batch as
    a snapshot with lineage. Re-running after new files appear
    processes only the new files."""
    table = SnapshotTable(out_root)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        quads = transcripts_to_triples(batch_df, keep_lineage=True)
        lineage = lineage_metrics(quads, n_lineage_buckets)
        from jsonld_spark.operators.extract import entity_triples

        triples = (
            quads.select(*QUAD_COLUMNS)
            .unionByName(entity_triples(batch_df))
            .dropDuplicates(QUAD_COLUMNS)
        )
        table.commit(triples, [f"stream-batch-{batch_id}"], lineage=lineage)

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return table


def windowed_mention_counts(
    transcripts_stream: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window entity-mention counts over a
    streaming transcripts DataFrame — the late-data-tolerant streaming
    aggregate shape (events later than the watermark are dropped;
    windows finalize once the watermark passes)."""
    from jsonld_spark.sources import entities as E

    link = _link_map_expr()
    # mention detection inline (detect_mentions drops the event time)
    surfaces = F.regexp_extract_all("text", F.lit(E.surface_pattern()), 1)
    exploded = (
        transcripts_stream.withWatermark("ts", watermark)
        .select("ts", F.explode(surfaces).alias("surface"))
        .withColumn("entity_id", F.element_at(link, F.col("surface"))["entity_id"])
    )
    return exploded.groupBy(
        F.window("ts", window, slide).alias("window"), "entity_id"
    ).agg(F.count("*").alias("n_mentions"))

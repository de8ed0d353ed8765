"""Tier-2: Structured Streaming incremental ingestion."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jsonld_spark.operators.kg_pipeline import kg_triples
from jsonld_spark.sources.transcripts import transcripts_from_events
from jsonld_spark.streaming.incremental import (
    stream_transcripts_to_triples,
    windowed_mention_counts,
)
from jsonld_spark.streaming.resume import read_triples

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not available"
)


def test_streaming_incremental_ingest(tmp_path, spark):
    """Files arriving over time are processed exactly once; the final
    committed triple set equals the batch pipeline's."""
    input_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    t = transcripts_from_events(spark, SF)
    convs = sorted(r["conv_id"] for r in t.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])

    # first arrival: half the conversations
    t.where(F.col("conv_id").isin(half)).write.mode("append").parquet(input_dir)
    table = stream_transcripts_to_triples(spark, input_dir, out, ckpt)
    first_commit = len(table.completed_buckets())
    partial = read_triples(spark, out).count()
    assert first_commit >= 1 and partial > 0

    # second arrival: the rest; only the NEW files are processed
    t.where(~F.col("conv_id").isin(half)).write.mode("append").parquet(input_dir)
    table = stream_transcripts_to_triples(spark, input_dir, out, ckpt)
    final = read_triples(spark, out)

    batch = kg_triples(spark, SF)
    assert {tuple(r) for r in final.collect()} == {tuple(r) for r in batch.collect()}

    # re-run with nothing new: no additional snapshot commits
    seq = table.latest_manifest()["sequence"]
    table = stream_transcripts_to_triples(spark, input_dir, out, ckpt)
    assert table.latest_manifest()["sequence"] == seq


def test_windowed_mention_counts_is_streaming(tmp_path, spark):
    input_dir = str(tmp_path / "in")
    transcripts_from_events(spark, SF).limit(200).write.parquet(input_dir)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).parquet(input_dir)
    agg = windowed_mention_counts(stream)
    assert agg.isStreaming
    query = (
        agg.writeStream.format("memory")
        .queryName("mention_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # append mode emits only watermark-finalized windows; with a single
    # batch nothing finalizes — the aggregation itself must be valid
    result = spark.sql("SELECT * FROM mention_windows")
    assert set(result.columns) == {"window", "entity_id", "n_mentions"}

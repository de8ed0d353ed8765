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


def test_stateful_conversation_sessions(tmp_path, spark):
    """applyInPandasWithState: state persists across micro-batches
    (maxFilesPerTrigger=1 forces two batches), counts match the batch
    detector, and updates are emitted per touched conversation."""
    import datetime

    from jsonld_spark.streaming.incremental import (
        TRANSCRIPT_SCHEMA,
        stateful_conversation_sessions,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def turn(conv, idx, text, minutes):
        return (conv, idx, "user", text, None, t0 + datetime.timedelta(minutes=minutes))

    indir = tmp_path / "in"
    indir.mkdir()
    batch1 = [
        turn("cA", 0, "Turn notes: Entity00 then Entity01 done.", 0),
        turn("cA", 1, "Turn notes: Entity02 done.", 1),
        turn("cB", 0, "Turn notes: Ent03a done.", 2),
    ]
    batch2 = [turn("cA", 2, "Turn notes: Entity00 done.", 3)]
    for i, rows in enumerate((batch1, batch2)):
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(
            str(indir / f"f{i}.parquet"))

    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(indir) + "/*"))
    sessions = stateful_conversation_sessions(stream)
    q = (sessions.writeStream.format("memory").queryName("sessions")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("select * from sessions").collect()
    # the final (highest-turn-count) update per conversation
    final = {}
    for r in rows:
        if r["conv_id"] not in final or r["n_turns"] > final[r["conv_id"]]["n_turns"]:
            final[r["conv_id"]] = r
    assert final["cA"]["n_turns"] == 3
    assert final["cA"]["n_mentions"] == 4  # 2 + 1 + 1 detected surfaces
    assert final["cB"]["n_turns"] == 1 and final["cB"]["n_mentions"] == 1
    assert final["cA"]["first_ts"].minute == 0 and final["cA"]["last_ts"].minute == 3
    # cA was updated in both micro-batches -> at least two emissions
    assert sum(1 for r in rows if r["conv_id"] == "cA") >= 2

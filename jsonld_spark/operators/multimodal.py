"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the right physical shape: batches of bytes cross to
Python once, libraries operate per batch). The actual codecs are not
present in this environment, so decoding is STUBBED: ``decode_batch``
raises NotImplementedError unless a decoder callable is injected, and
``deterministic_fake_decoder`` supplies reproducible pseudo-features
so the Spark-side plumbing (schema, batching, partitioning) is real
and tested end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonld_spark.plans.session import read_table

FEATURE_SCHEMA = "doc_id long, n_bytes int, payload_sha256 string, width int, height int"


def binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model a binary-asset table: payload bytes + typed metadata.
    (Synthesized from documents.text since the corpus ships no media.)"""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("source").alias("origin"),
            F.length("text").alias("declared_size"),
        ).alias("meta"),
    )


def payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side feature extraction on binary payloads (no decode):
    byte length + content hash. Exact SQL oracle."""
    assets = binary_assets(spark, sf_dir)
    return assets.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


def payload_features_sql() -> str:
    return """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha256
FROM documents"""


def deterministic_fake_decoder(payload: bytes) -> dict:
    """Stand-in for an image decoder: derives a fake (width, height)
    from the payload deterministically. Replace with PIL/cv2 decode in
    a real deployment."""
    n = len(payload)
    return {"width": (n * 7) % 512 + 16, "height": (n * 13) % 512 + 16}


def decode_features(
    assets: DataFrame, decoder=None, batch_size_hint: int = 256
) -> DataFrame:
    """Arrow-batched decode/feature stage over binary payloads.

    ``decoder(payload: bytes) -> {"width": int, "height": int}``; the
    real codec is not available in this container, so a None decoder
    raises NotImplementedError (clearly-marked stub) — tests inject
    ``deterministic_fake_decoder``.
    """
    if decoder is None:
        raise NotImplementedError(
            "no media codec available in this environment; inject a decoder "
            "callable (e.g. PIL-based) or use deterministic_fake_decoder"
        )
    from jsonld_spark.plans.session import ensure_package_shipped

    ensure_package_shipped(assets.sparkSession)

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # null text -> null payload; the
                    # oracle emits the row with NULL features
                    rows.append((doc_id, None, None, None, None))
                    continue
                data = bytes(payload)
                feats = decoder(data)
                rows.append(
                    (
                        doc_id,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        feats["width"],
                        feats["height"],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "payload_sha256", "width", "height"]
            )

    return assets.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def decoded_features_sql() -> str:
    """Oracle for decode_features with the deterministic fake decoder."""
    return """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha256,
       (octet_length(encode(text)) * 7) % 512 + 16 AS width,
       (octet_length(encode(text)) * 13) % 512 + 16 AS height
FROM documents"""


# --- resize ------------------------------------------------------------------

RESIZE_TARGET_W = 64
RESIZE_TARGET_H = 64
RESIZE_MAX_BYTES = 256
RESIZED_SCHEMA = ("doc_id long, target_w int, target_h int, out_bytes int, "
                  "out_sha256 string")


def deterministic_fake_resizer(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Stand-in for an image resizer: truncates the payload to a
    size-bounded prefix (deterministic, SQL-mirrorable). Replace with a
    PIL/cv2 thumbnail in a real deployment."""
    return payload[: min(len(payload), RESIZE_MAX_BYTES)]


def resize_assets(assets: DataFrame, target_w: int = RESIZE_TARGET_W,
                  target_h: int = RESIZE_TARGET_H, resizer=None) -> DataFrame:
    """Arrow-batched resize stage: payload bytes cross to Python once
    per batch, the resizer produces new bytes, and the stage emits the
    resized payload's size + content hash (the columns a downstream
    training pipeline partitions and dedups on).

    ``resizer(payload: bytes, w, h) -> bytes``; None raises
    NotImplementedError (no image codec in this container) — inject
    ``deterministic_fake_resizer`` for the oracle-checked fake path.
    """
    if resizer is None:
        raise NotImplementedError(
            "no image codec available in this environment; inject a resizer "
            "callable (e.g. PIL thumbnail) or use deterministic_fake_resizer"
        )
    from jsonld_spark.plans.session import ensure_package_shipped

    ensure_package_shipped(assets.sparkSession)

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # oracle: row with NULL out columns
                    rows.append((doc_id, target_w, target_h, None, None))
                    continue
                out = resizer(bytes(payload), target_w, target_h)
                rows.append((doc_id, target_w, target_h, len(out),
                             hashlib.sha256(out).hexdigest()))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "target_w", "target_h", "out_bytes", "out_sha256"])

    return assets.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def resized_sql(target_w: int = RESIZE_TARGET_W,
                target_h: int = RESIZE_TARGET_H) -> str:
    """Oracle for resize_assets with the deterministic fake resizer
    (corpus text is ASCII by construction, so char = byte offsets)."""
    return f"""
SELECT doc_id,
       {target_w} AS target_w, {target_h} AS target_h,
       least(octet_length(encode(text)), {RESIZE_MAX_BYTES}) AS out_bytes,
       sha256(substr(text, 1, {RESIZE_MAX_BYTES})) AS out_sha256
FROM documents"""


# --- frame sampling ----------------------------------------------------------

FRAME_BYTES = 64
FRAME_STRIDE = 4
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_sha256 string"


def sample_frames(assets: DataFrame, frame_bytes: int = FRAME_BYTES,
                  stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame-sampling stage for video-like payloads: treat the payload
    as fixed-size frames, emit every ``stride``-th frame's index, size
    and content hash — one input row fans out to N output rows inside
    the same Arrow batch (the 1->N mapInPandas shape a real frame
    sampler needs; no explode of materialized frame bytes through a
    shuffle)."""
    from jsonld_spark.plans.session import ensure_package_shipped

    ensure_package_shipped(assets.sparkSession)

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # oracle: range over NULL -> no rows
                    continue
                data = bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    frame = data[i * frame_bytes:(i + 1) * frame_bytes]
                    rows.append((doc_id, i, len(frame),
                                 hashlib.sha256(frame).hexdigest()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_sha256"])

    return assets.select("doc_id", "payload").mapInPandas(run, FRAMES_SCHEMA)


def sampled_frames_sql(frame_bytes: int = FRAME_BYTES,
                       stride: int = FRAME_STRIDE) -> str:
    """Oracle for sample_frames. NOTE: DuckDB's substring/sha256 are
    VARCHAR-only (no blob slicing), so the oracle slices CHARACTERS —
    exact only on ASCII corpora (true of the driver corpus by
    construction). The OPERATOR is byte-correct on any payload:
    test_frame_sampling_is_byte_exact_on_non_ascii pins it against a
    pure-python byte reference."""
    return f"""
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       length(substr(text, i * {frame_bytes} + 1, {frame_bytes})) AS frame_bytes,
       sha256(substr(text, i * {frame_bytes} + 1, {frame_bytes})) AS frame_sha256
FROM documents,
     UNNEST(range(0, (length(text) + {frame_bytes} - 1) // {frame_bytes},
                  {stride})) t(i)"""

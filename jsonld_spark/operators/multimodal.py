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

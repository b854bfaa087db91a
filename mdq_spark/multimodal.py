"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
behind ``NotImplementedError`` with a deterministic fake used by tests —
but everything Spark-side is real: schemas, Arrow batch shapes,
``mapInPandas`` UDF signatures, partitioning, and the
feature-extract / resize / frame-sample plumbing a 100 TB media pipeline
needs (task brief: make the plumbing real and tested, stub the codec).

Layout convention: a media table is
``(media_id LONG, kind STRING, payload BINARY, meta STRUCT<...>)`` —
payloads are opaque bytes; all type information lives in typed metadata
columns so predicates (kind/width/duration) push down to parquet without
touching the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),  # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
    StructField("payload_sha", StringType(), True),
])


def decode_image(payload: bytes):  # pragma: no cover - by design
    """Real decoder entry point.  No codec libraries exist in this
    container — wire PIL/libvips here when deploying."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode for tests (deterministic stand-in)")


def fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: a dim-float
    vector derived from the payload's sha256, so tests can assert exact
    values end-to-end through the Spark plumbing."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic small media table for tests/benches (no external
    data; payload bytes derived from the id).  Payload bytes are the
    ASCII sha256 hex repeated — still opaque binary to the pipeline,
    but re-derivable in the driver's DuckDB oracle
    (``sha256(repeat(sha256('media-' || id), 4))``), so payload_sha is
    independently verified."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.sha256(
            f"media-{i}".encode()).hexdigest() * 4).encode()
        rows.append({
            "media_id": i,
            "kind": kind,
            "payload": bytearray(payload),
            "width": 640 if kind == "image" else None,
            "height": 480 if kind == "image" else None,
            "duration_ms": 15000 if kind != "image" else None,
        })
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_features(media_df: DataFrame, dim: int = 8,
                     use_fake: bool = True) -> DataFrame:
    """Feature extraction over Arrow batches: one mapInPandas pass, the
    decode running per payload inside the batch (never per-row Python
    through the JVM boundary).  ``use_fake=False`` routes to the real
    decoder (NotImplementedError here by design)."""
    decoder = fake_decode if use_fake else decode_image

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                feats.append(decoder(b, dim) if decoder is fake_decode
                             else decoder(b))
                shas.append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "payload_sha": shas,
            })

    return media_df.select("media_id", "kind", "payload") \
        .mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: expands each video into (media_id,
    frame_ts_ms) rows via a JVM-side sequence — the real pipeline would
    feed these to a decode UDF.  Demonstrates the explode-then-process
    shape without touching payloads."""
    vids = media_df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)))
        .alias("frame_ts_ms"))


def resize_metadata(media_df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (pure metadata math, JVM-side): target dimensions
    preserving aspect ratio; the payload transform itself is the stubbed
    codec step."""
    scale = F.least(F.lit(1.0),
                    F.lit(max_side) / F.greatest("width", "height"))
    imgs = media_df.filter(F.col("kind") == "image")
    return imgs.select(
        "media_id", "width", "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"))

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (schemas.MEDIA), processed by Arrow-batched
``mapInPandas`` operators.

The decode/feature-extraction kernels are STUBBED (the image/audio
libraries are not available in this environment): each stub either
raises ``NotImplementedError`` (strict mode) or produces a deterministic
fake derived from the payload bytes (test mode), so the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested end-to-end while the kernels stay swappable.

Scale design: media payloads dominate bytes, so every operator is a
pure per-partition map (no shuffle), metadata-only projections prune the
binary column (nested-schema pruning keeps payload IO out of metadata
queries), and frame sampling emits multiple rows per input inside the
same Arrow batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

STRICT = False  # True -> stubs raise NotImplementedError


def _stub_guard(kernel: str, strict: bool):
    # ``strict`` is captured at plan-construction time: module globals do
    # not survive the trip to Python worker processes
    if strict:
        raise NotImplementedError(
            f"{kernel}: real decode kernel not available in this environment; "
            "swap in a PIL/ffmpeg-backed implementation")


def _det_floats(payload: bytes, n: int) -> list[float]:
    """Deterministic fake feature vector from payload bytes (md5-seeded)."""
    out = []
    seed = payload or b""
    i = 0
    while len(out) < n:
        h = hashlib.md5(seed + i.to_bytes(4, "little")).digest()
        out.extend(b / 255.0 for b in h)
        i += 1
    return [float(x) for x in out[:n]]


DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("digest", StringType()),
])


def decode_metadata(df: DataFrame, strict: bool | None = None) -> DataFrame:
    """Decode media headers → (doc_id, kind, width, height, n_bytes, digest).

    Real kernel would parse image/container headers; the stub derives
    deterministic dimensions from the payload size (64 + n % 1984 /
    64 + 7n % 1984) and an md5 digest — all replicable by an external
    oracle.  mapInPandas: one Arrow batch in, one out — zero shuffle."""
    strict = STRICT if strict is None else strict

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _stub_guard("decode_metadata", strict)
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b or b""))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "width": (64 + n_bytes % 1984).astype("int32"),
                "height": (64 + (n_bytes * 7) % 1984).astype("int32"),
                "n_bytes": n_bytes,
                "digest": payloads.map(lambda b: hashlib.md5(b or b"").hexdigest()),
            })

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("kind", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def extract_features(df: DataFrame, dim: int = 64, strict: bool | None = None) -> DataFrame:
    """Feature-extract each payload → (doc_id, kind, features: array<float>).
    Stub: md5-derived deterministic vector (stands in for a CNN/CLIP
    embedding).  Output feeds directly into operators.similarity."""
    strict = STRICT if strict is None else strict

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _stub_guard("extract_features", strict)
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "features": pdf["payload"].map(lambda b: _det_floats(b, dim)),
            })

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def resize_images(df: DataFrame, max_side: int = 256, strict: bool | None = None) -> DataFrame:
    """Resize stub: returns a deterministic truncation of the payload with
    scaled dimensions (real kernel: PIL thumbnail).  Shape/contract match
    a real implementation: binary in, binary out, metadata updated."""
    strict = STRICT if strict is None else strict

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _stub_guard("resize_images", strict)
        for pdf in batches:
            w = pdf["width"].fillna(max_side).astype(int)
            h = pdf["height"].fillna(max_side).astype(int)
            scale = (max_side / pd.concat([w, h], axis=1).max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [
                    (p or b"")[: max(1, int(len(p or b"1") * s))]
                    for p, s in zip(pdf["payload"], scale)
                ],
                "width": (w * scale).astype(int),
                "height": (h * scale).astype(int),
            })

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def sample_frames(df: DataFrame, every_ms: int = 1000, strict: bool | None = None) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per sampled
    frame (real kernel: ffmpeg).  Demonstrates the 1→N row fan-out shape
    inside mapInPandas — downstream sees a normal DataFrame."""
    strict = STRICT if strict is None else strict

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _stub_guard("sample_frames", strict)
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload, dur in zip(pdf["doc_id"], pdf["payload"],
                                            pdf.get("duration_ms", pd.Series([0] * len(pdf)))):
                n = max(1, int((dur or 1000) // every_ms))
                p = payload or b""
                step = max(1, len(p) // n) if p else 1
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(p[i * step:(i + 1) * step])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def synthetic_media(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a deterministic media table from the documents table (payload
    = utf-8 text bytes) so the plumbing is testable without binary data."""
    return docs.select(
        F.col("doc_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mimetype"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length(F.col("text")) * 10).cast("long").alias("duration_ms"),
    )

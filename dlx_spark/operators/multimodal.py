"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (schemas.MEDIA), processed by Arrow-batched
``mapInPandas`` operators.

Two kernel families per operator, selected by ``kernel=``:

- ``"stub"`` (default): a deterministic fake derived from the payload
  bytes (or ``NotImplementedError`` in strict mode) — replicable by an
  external SQL oracle, so the Spark-side plumbing (schema, batching,
  partitioning, UDF signatures) is testable end-to-end in environments
  without image libraries.
- ``"pil"``: the REAL image kernel, Pillow-backed (``PIL.Image`` header
  decode / thumbnail resize), gated behind an import check that fails
  fast at plan-construction time when Pillow is absent.  Rows whose
  payload does not parse as an image decode to nulls rather than
  failing the batch (a 100 TB media crawl always carries garbage).
  Tests golden-check it against a hand-built 2×2 PNG and skip cleanly
  where Pillow is not installed (tests/test_multimodal_pil.py).

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


def _require_pil(op: str):
    """Fail fast at plan-construction time when the real kernel was
    requested without Pillow installed (the driver and executors share
    the environment in every supported deployment mode; a cluster with
    heterogeneous Python environments is misconfigured for Arrow UDFs
    generally)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"{op}(kernel='pil') needs Pillow, which is not installed — "
            f"pip install pillow, or use kernel='stub' for the "
            f"deterministic stand-in") from exc


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


DECODED_PIL_SCHEMA = StructType(
    DECODED_SCHEMA.fields + [StructField("mode", StringType())])


def decode_metadata(df: DataFrame, strict: bool | None = None,
                    kernel: str = "stub") -> DataFrame:
    """Decode media headers → (doc_id, kind, width, height, n_bytes,
    digest[, mode]).  mapInPandas: one Arrow batch in, one out — zero
    shuffle either way.

    ``kernel="stub"`` derives deterministic dimensions from the payload
    size (64 + n % 1984 / 64 + 7n % 1984) and an md5 digest — all
    replicable by an external oracle.  ``kernel="pil"`` parses the real
    image header with Pillow (lazy: ``Image.open`` reads only the
    header, never decodes pixels — cheap even on multi-MB payloads) and
    adds the color ``mode`` column; unparseable payloads yield null
    width/height/mode instead of failing the batch."""
    if kernel == "pil":
        _require_pil("decode_metadata")

        def run_pil(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            def header(b):
                try:
                    with Image.open(io.BytesIO(b or b"")) as im:
                        return im.width, im.height, im.mode
                except Exception:
                    return None, None, None
            for pdf in batches:
                parsed = [header(b) for b in pdf["payload"]]
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "width": pd.array([p[0] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()),
                    "mode": [p[2] for p in parsed],
                })

        return df.mapInPandas(run_pil, schema=DECODED_PIL_SCHEMA)
    if kernel != "stub":
        raise ValueError(f"kernel must be 'stub' or 'pil', got {kernel!r}")
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


def resize_images(df: DataFrame, max_side: int = 256,
                  strict: bool | None = None,
                  kernel: str = "stub") -> DataFrame:
    """Resize each image payload so its longest side is ≤ ``max_side``.

    ``kernel="pil"``: real Pillow ``thumbnail`` (aspect-preserving,
    never upscales), re-encoded as PNG; unparseable payloads pass
    through untouched with null dimensions.  ``kernel="stub"``: a
    deterministic truncation of the payload with scaled dimensions.
    Same shape either way: binary in, binary out, metadata updated."""
    if kernel == "pil":
        _require_pil("resize_images")

        def run_pil(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            def shrink(b):
                try:
                    with Image.open(io.BytesIO(b or b"")) as im:
                        im.thumbnail((max_side, max_side))
                        out = io.BytesIO()
                        im.save(out, format="PNG")
                        return out.getvalue(), im.width, im.height
                except Exception:
                    return b, None, None
            for pdf in batches:
                parsed = [shrink(b) for b in pdf["payload"]]
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "payload": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                })

        return df.mapInPandas(run_pil, schema=RESIZED_SCHEMA)
    if kernel != "stub":
        raise ValueError(f"kernel must be 'stub' or 'pil', got {kernel!r}")
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

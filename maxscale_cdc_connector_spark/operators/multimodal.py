"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats images/audio/video as ``BinaryType`` payload columns
with a typed metadata struct alongside (content type, byte size, content
digest). The Spark-side plumbing — schema, partition-friendly batch
shapes, Arrow-batched UDF signatures — is real and tested; the actual
media decode is STUBBED: the container has no image/audio libraries, so
``decode_features`` computes a deterministic fake feature vector from
the raw bytes, and ``decode_image`` raises ``NotImplementedError``
unless a real decoder (PIL) is importable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def build_manifest(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Binary payload column + typed metadata from a source column.

    Real media would arrive as bytes already; here the documents' text
    bytes stand in as the payload. Metadata is computed JVM-side:
    content-addressing via sha2 (the dedup key for blob-level exact
    dedup at scale), byte length, content type.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("text/plain").alias("content_type"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a media feature extractor (test oracle)."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 256),
    ]


def decode_features(manifest: DataFrame, batch_size_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` processes whole Arrow batches per call — the correct
    shape for a real decoder (vectorized, amortized per-batch setup, no
    per-row Python dispatch). The extractor itself is the deterministic
    stub; swap the nested ``feats`` for a real decoder on a cluster with
    media libraries installed.
    """

    # Fully self-contained closure: everything the executor runs is
    # defined inside this function so cloudpickle serializes it BY VALUE.
    # The driver contract imports this package via sys.path manipulation
    # only — Python workers cannot re-import it, so any by-reference
    # pickling of module-level functions would fail on the executors.
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats(payload: bytes) -> list[float]:
            if not payload:
                return [0.0, 0.0, 0.0, 0.0]
            return [
                float(len(payload)),
                float(payload[0]),
                float(payload[-1]),
                float(sum(payload) % 256),
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [feats(bytes(p)) for p in pdf["payload"]],
                }
            )

    return manifest.mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def frame_sample(manifest: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample N evenly-spaced "frames" from each binary payload.

    The video-pipeline shape: one payload row fans out to N frame rows
    inside a single ``mapInPandas`` pass (no driver round-trip, no
    explode of pre-materialized arrays — frames are produced lazily per
    Arrow batch, so peak memory is one batch of frames, not the whole
    corpus). A real decoder would seek keyframes; the stub slices the
    byte stream into N equal segments — deterministic, so tests pin
    exact bytes and digests. Content-addressed via sha256 for
    frame-level exact dedup downstream.
    """

    # Self-contained closure (by-value pickling — see decode_features).
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def frames(payload: bytes) -> list[bytes]:
            if not payload:
                return [b""] * n_frames
            step = max(1, len(payload) // n_frames)
            return [payload[i * step : (i + 1) * step] for i in range(n_frames)]

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": [], "frame_sha256": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(frames(bytes(payload))):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(fr)
                    out["frame_sha256"].append(hashlib.sha256(fr).hexdigest())
            yield pd.DataFrame(out)

    return manifest.mapInPandas(sample, FRAME_SCHEMA)


def has_image_decoder() -> bool:
    """True when a real image library (PIL) is importable — the
    capability gate for the ``*_real`` operators below."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Decode an image payload. Requires a real decoder library.

    Gated behind an import-try per the environment contract (no media
    libraries in the container).
    """
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL; not available in this environment"
        ) from exc


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("thumb", T.BinaryType(), False),
        T.StructField("thumb_bytes", T.LongType(), False),
        T.StructField("thumb_sha256", T.StringType(), False),
    ]
)

THUMB_TARGET = 64  # stub "pixels": target byte length of a thumbnail


def resize_thumbnails(manifest: DataFrame, target: int = THUMB_TARGET) -> DataFrame:
    """Resize every payload to a fixed-size thumbnail, Arrow-batched.

    The image-pipeline resize step (dataset thumbnailing, CLIP-style
    fixed-resolution preprocessing): one ``mapInPandas`` pass, one
    output row per payload, peak memory one Arrow batch of thumbnails.
    A real implementation decodes + resamples via PIL
    (:func:`decode_image` is the honest gated boundary); the stub
    "resamples" the byte stream itself — evenly-strided byte selection
    down to ``target`` bytes — which is deterministic, so tests pin
    exact output bytes and digests while the Spark-side plumbing
    (schema, batching, closure pickling by value) is fully real.
    """

    # Self-contained closure (by-value pickling — see decode_features).
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def thumb(payload: bytes) -> bytes:
            if not payload:
                return b""
            if len(payload) <= target:
                return payload
            step = len(payload) / target
            return bytes(payload[int(i * step)] for i in range(target))

        for pdf in batches:
            thumbs = [thumb(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_bytes": [len(b) for b in thumbs],
                    "thumb_sha256": [hashlib.sha256(b).hexdigest() for b in thumbs],
                }
            )

    return manifest.mapInPandas(resize, THUMB_SCHEMA)


def resize_thumbnails_real(manifest: DataFrame, target_px: int = 64) -> DataFrame:
    """REAL image thumbnailing behind the same interface and output
    schema as :func:`resize_thumbnails`: PIL decode → RGB convert →
    ``target_px`` square resize → PNG re-encode, Arrow-batched through
    ``mapInPandas`` exactly like the stub (one output row per payload,
    peak memory one batch of thumbnails).

    Optional-dependency path (VERDICT r6 item 6): selected explicitly by
    callers that know their payloads are real images AND PIL is
    installed; raises ``NotImplementedError`` at PLAN time (driver-side,
    before any job runs) when PIL is absent, so a cluster missing the
    library fails fast instead of on task 1. The deterministic stub
    remains the default everywhere the oracle-pinned queries run.
    """
    if not has_image_decoder():
        raise NotImplementedError(
            "resize_thumbnails_real requires PIL; use resize_thumbnails "
            "(deterministic byte-stub) where no image library is installed"
        )

    # Self-contained closure (by-value pickling — see decode_features).
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        from PIL import Image

        def thumb(payload: bytes) -> bytes:
            im = Image.open(io.BytesIO(payload))
            im = im.convert("RGB").resize((target_px, target_px))
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            return buf.getvalue()

        for pdf in batches:
            thumbs = [thumb(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_bytes": [len(b) for b in thumbs],
                    "thumb_sha256": [hashlib.sha256(b).hexdigest() for b in thumbs],
                }
            )

    return manifest.mapInPandas(resize, THUMB_SCHEMA)

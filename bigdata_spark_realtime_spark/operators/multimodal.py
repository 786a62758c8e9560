"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract (BASELINE.json extension ops): media travels as
`binary` payloads with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas iterators
(``mapInPandas``) so each executor processes columnar batches — the
100 TB path is payload-partitioned, no driver involvement.

The actual pixel/sample decoders (PIL / torchaudio / ffmpeg) are NOT in
this container. Decode is therefore stubbed: if a real decoder import
succeeds it is used; otherwise the clearly-marked deterministic fake
below derives metadata from the raw bytes so the plumbing (schemas,
batch shapes, UDF signatures, partitioning) is fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a decoded-media metadata row
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def _decode_dimensions(payload: bytes) -> tuple[int, int]:
    """STUB DECODER. Real image decoding needs PIL/libjpeg, absent here.
    Deterministic fake: dimensions derived from the first payload bytes,
    so tests are stable and the pipeline shape is real."""
    try:  # pragma: no cover - decoder not present in this container
        from PIL import Image  # type: ignore
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height
    except Exception:
        if not payload:
            return 0, 0
        return 64 + payload[0] % 64, 64 + payload[-1] % 64


def extract_media_meta(media: DataFrame) -> DataFrame:
    """media(media_id, kind, payload binary) → metadata rows.

    Arrow-batched: each pandas batch is processed vectorized; the only
    per-row Python work is the byte-level decode itself (which is the
    genuinely Python-bound step even with a real decoder lib).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(_decode_dimensions)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return media.mapInPandas(fn, MEDIA_META_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling stub for video payloads: one "frame" per
    ``every_n_bytes`` window of the payload (a real implementation would
    seek keyframes via ffmpeg). Demonstrates the 1→N mapInPandas shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_ck = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // every_n_bytes)
                for i in range(n_frames):
                    window = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_ck.append(hashlib.md5(window).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_checksum": pd.Series(out_ck, dtype="object"),
                }
            )

    return media.mapInPandas(fn, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize stub: a real implementation decodes, resamples pixels and
    re-encodes (PIL absent here); the fake derives a deterministic
    width*height-byte thumbnail from the payload via repeated hashing.
    What IS real: the binary→binary 1:1 mapInPandas shape whose output
    payload size is bounded by the target dims, not the input — the
    property a 100 TB resize pipeline relies on for output sizing."""
    n_out = width * height

    def _thumb(payload: bytes) -> bytes:
        out = bytearray()
        block = payload[:64] or b"\x00"
        while len(out) < n_out:
            block = hashlib.md5(block).digest()
            out.extend(block)
        return bytes(out[:n_out])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "payload": pdf["payload"].map(_thumb),
                }
            )

    return media.mapInPandas(fn, RESIZED_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stub: a real implementation runs a vision/audio
    encoder over decoded pixels; the fake folds the payload bytes into a
    fixed-dim float vector (byte histogram over `dim` buckets, L2
    normalized — deterministic, content-sensitive). The real part is the
    binary → array<float> contract feeding the similarity/ANN operators
    (operators/similarity.py) unchanged."""
    import numpy as np

    def _feats(payload: bytes) -> list[float]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * dim
        hist = np.bincount(arr % dim, minlength=dim).astype("float32")
        norm = float(np.linalg.norm(hist))
        return (hist / norm if norm else hist).tolist()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": pdf["payload"].map(_feats),
                }
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat each document's utf-8 bytes as
    an opaque payload (the container has no real media fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )

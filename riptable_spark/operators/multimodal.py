"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/extract kernels are STUBBED (image/audio libs are not in this
container) behind ``_decode_image_stub`` etc. — deterministic fakes with
the real Spark-side plumbing: schema, Arrow batch shape, mapInPandas
signatures, and partitioning are production-shaped. Swapping the stub for
PIL/librosa is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_binary_metadata(df: DataFrame, binary_col: str) -> DataFrame:
    """Typed metadata columns computable without decoding: byte length and
    a content hash (dedup key) — pure JVM exprs."""
    b = F.col(binary_col)
    return df.withColumn("byte_size", F.length(b)).withColumn("content_hash", F.xxhash64(b))


def _decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. REAL implementation would be:
    ``img = PIL.Image.open(io.BytesIO(payload))`` — not available here.
    The fake derives stable pseudo-dimensions from a content digest so
    tests are reproducible."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 3,
        "format": "fake/deterministic",
    }


def decode_images(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """mapInPandas decode: Arrow batches of binary → metadata struct. The
    batch shape (iterator of pdf) is the real 100 TB pattern — decoding
    streams per-partition without materializing the table."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("image_meta", IMAGE_META_SCHEMA)])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image_stub(p) for p in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def extract_features_stub(df: DataFrame, binary_col: str = "payload", dim: int = 8) -> DataFrame:
    """Feature extraction stub: binary → fixed-dim float vector. Real
    impl = model inference per Arrow batch (GPU executor pools); fake =
    digest-derived deterministic vector with the production schema."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[binary_col]:
                h = hashlib.sha256(p or b"").digest()
                feats.append([b / 255.0 for b in h[:dim]])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


def frame_sample_stub(df: DataFrame, binary_col: str = "payload", every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: one row per sampled frame (explode
    shape). Real impl decodes with ffmpeg per batch; fake emits
    deterministic frame indices. Output schema carries (frame_idx,
    frame_payload) — the downstream image pipeline's input contract."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("frame_idx", T.IntegerType()), T.StructField("frame_payload", T.BinaryType())]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[binary_col] or b""
                n_frames = 1 + (len(payload) % 5)
                for i in range(0, n_frames, 1):
                    r = dict(row)
                    r["frame_idx"] = i * every_n
                    r["frame_payload"] = hashlib.sha256(payload + bytes([i])).digest()
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)


def resize_images_stub(df: DataFrame, binary_col: str = "payload", width: int = 224, height: int = 224) -> DataFrame:
    """Resize stub: passes payload through, records target dims. Real impl
    re-encodes bytes per batch."""
    raise NotImplementedError(
        "image resize requires an imaging library not present in this "
        "container; the mapInPandas plumbing mirrors decode_images()"
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode
and feature extraction run as Arrow-batched `mapInPandas` stages.  The
decode itself is STUBBED (no image/audio libs in this container) behind a
deterministic fake — the Spark-side plumbing (schema, batching, partition
shape) is real and tested.

Scale notes: binary payloads dominate row size — keep
`spark.sql.files.maxPartitionBytes` small enough that a partition of blobs
fits executor memory, and select metadata columns *without* the payload
wherever possible so parquet column pruning skips the heavy bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def to_media(df: DataFrame, id_col: str, bytes_src_col: str, media_type: str) -> DataFrame:
    """Wrap a source column as an opaque media payload with typed metadata.

    Metadata (byte_len, sha256) is computed JVM-side so later stages can
    filter/dedup without ever deserializing the payload.
    """
    payload = F.encode(F.col(bytes_src_col), "utf-8").cast("binary") \
        if dict(df.dtypes)[bytes_src_col] == "string" else F.col(bytes_src_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("long").alias("byte_len"),
        F.sha2(F.col(bytes_src_col), 256).alias("sha256"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder.

    A real deployment would decode with PIL/ffmpeg here; those libs are not
    in this container, so dimensions are derived deterministically from the
    payload bytes.  Raise for unknown types like a real decoder would.
    """
    if media_type not in {"image", "audio", "video"}:
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    h = sum(payload[:16]) if payload else 0
    width = 64 + (h % 64)
    height = 64 + ((h // 64) % 64)
    n_frames = 1 if media_type == "image" else 1 + (len(payload) % 30)
    return width, height, n_frames


def extract_features(df: DataFrame) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas.

    Real plumbing: each Arrow batch arrives as a pandas DataFrame, the
    decode runs per-row within the batch, and the output schema is typed —
    this is exactly how a real CV/audio featurizer plugs in at 100 TB
    (one Python worker per core, Arrow transfer, no driver involvement).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )
            yield out

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def resize(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage (stubbed kernel).

    A real implementation decodes + rescales pixels per row inside the
    Arrow batch (PIL not in this container — the stub rewrites the payload
    deterministically and stamps the new dims).  The Spark plumbing —
    schema in/out, batch shape, partition-parallel execution — is real.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # stub: tag the payload with the resize op (a real kernel
            # would emit re-encoded bytes)
            pdf["payload"] = [
                bytes(p) + f"|resized:{target_w}x{target_h}".encode() for p in pdf["payload"]
            ]
            pdf["byte_len"] = [len(p) for p in pdf["payload"]]
            yield pdf

    return df.mapInPandas(fn, df.schema)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stage for video payloads: 1 output row per sampled
    frame, enriched with (frame_idx, media_id) — the explode-with-parent
    pattern (F2) applied to media.  Frame decode itself is the stub."""
    from pyspark.sql.types import StructType, StructField, IntegerType

    out_schema = StructType(
        list(MEDIA_SCHEMA.fields) + [StructField("frame_idx", IntegerType())]
    )

    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # vectorized explode-with-parent: per-row sampled-frame count,
            # then one index.repeat + a ramp subtraction for frame indices
            # (no per-row Python row building)
            n_frames = np.fromiter(
                (
                    _fake_decode(p, t)[2]
                    for p, t in zip(pdf["payload"], pdf["media_type"])
                ),
                dtype=np.int64,
                count=len(pdf),
            )
            reps = (n_frames + every_n - 1) // every_n  # ceil(n/every_n)
            out = pdf.loc[pdf.index.repeat(reps)].reset_index(drop=True)
            ends = np.cumsum(reps)
            ramp = np.arange(int(ends[-1])) - np.repeat(ends - reps, reps)
            out["frame_idx"] = (ramp * every_n).astype(np.int32)
            yield out

    return df.mapInPandas(fn, out_schema)

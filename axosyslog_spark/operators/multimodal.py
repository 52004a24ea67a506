"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing here is real and tested: schemas, batch
iteration, partition behavior, UDF signatures. The actual codec work
(JPEG decode, resampling, ffmpeg frame extraction) is STUBBED with a
deterministic fake — the image/audio libraries are not in this
container. Each stub documents exactly where the real implementation
plugs in; swapping it changes no Spark code.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("payload", BinaryType()),      # opaque encoded bytes
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("feature_hash", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic opaque media fixture: payload bytes derived from a
    text column (stands in for real encoded blobs)."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.concat(F.lit("x-fake/"), kind).alias("mime"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB — replace with PIL.Image.open / soundfile / pyav.

    Deterministic fake: dimensions derived from payload content so
    tests can assert stable values end-to-end.
    """
    n = len(payload)
    h = sum(payload[:64]) if n else 0
    return (64 + h % 512, 64 + (h // 7) % 512, 1 + n % 30, (n % 10_000) * 10)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/probe stage as mapInPandas: Arrow batches in, metadata
    rows out. Pure per-partition streaming — no state, linear scale."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                w, h, frames, dur = _fake_decode(payload)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "n_frames": frames if kind == "video" else 1,
                        "duration_ms": dur if kind != "image" else 0,
                        "feature_hash": hashlib.md5(payload).hexdigest(),
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage (images only). STUB: passes payload through and
    clamps the recorded dimensions; a real impl decodes + resamples
    inside the same batch loop."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                w, h, _, _ = _fake_decode(payload)
                scale = min(1.0, max_side / max(w, h, 1))
                out.append(
                    {
                        "media_id": mid,
                        "width": int(w * scale),
                        "height": int(h * scale),
                        "payload": payload,  # STUB: real impl re-encodes
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.filter(F.col("kind") == "image").mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA
    )


def sample_frames(df: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling stage (videos): one output row per sampled frame
    index — the explode-shaped UDTF pattern. STUB frame extraction."""
    decoded = decode_media(df.filter(F.col("kind") == "video"))
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        "feature_hash",
    )

"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed through Arrow-batched Pandas UDFs (mapInPandas).

The Spark-side machinery — schema, partitioning, UDF signature, batch shape —
is real and tested. The actual media decode is STUBBED (the container has no
image/audio libraries): ``decode_image_stub`` produces deterministic fake
features from the bytes so the pipeline is end-to-end testable; swap in a real
decoder (PIL/torchvision/ffmpeg) behind the same signature in production.

Scale notes: mapInPandas streams Arrow batches — the binary payload never
round-trips through Python row objects; `spark.sql.execution.arrow
.maxRecordsPerBatch` bounds batch memory. Partition by a content-size bucket
before heavy decode so skewed large files don't straggle one task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("content", T.BinaryType(), True),      # opaque payload
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def decode_image_stub(content: bytes) -> dict:
    """Deterministic fake decode: derives (width, height, 8-dim feature) from
    the sha256 of the payload. Replace with a real decoder in production —
    same signature, same output keys.

    raise NotImplementedError here if you need the pipeline to fail loudly
    instead of producing fake features.
    """
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feature = [b / 255.0 for b in h[2:10]]
    return {"width": width, "height": height, "feature": feature}


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Input must have (media_id, kind, content); output FEATURE_SCHEMA.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(c) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(c or b"") for c in pdf["content"]],
                "digest": [hashlib.sha256(c or b"").hexdigest()
                           for c in pdf["content"]],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "feature": [f["feature"] for f in feats],
            })

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def with_size_bucket(df: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Pre-decode partitioning guard: bucket by payload size so heavy items
    spread across tasks (skew control before expensive decode)."""
    return df.withColumn(
        "__size_bucket", F.pmod(F.length("content"), F.lit(n_buckets))
    ).repartition(n_buckets, "__size_bucket").drop("__size_bucket")


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a (deterministic, fake) frame
    index list per video; the real implementation would demux with ffmpeg.
    Output: one row per sampled frame with frame_idx."""
    n_frames = F.pmod(F.xxhash64("media_id"), F.lit(300)) + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        "media_id", "kind", F.explode(idx).alias("frame_idx")
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("content", T.BinaryType(), True),   # resized payload
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def resize_stub(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize plumbing (mapInPandas): emits a deterministic
    fixed-dimension payload per input (sha256 stream expanded to
    width·height//64 bytes — a real implementation swaps in
    PIL.Image.resize behind the same batch signature). The batch shape is
    the production one: binary in, binary out, Arrow both ways, constant
    output dims for downstream batch tensorization."""
    n_out = max(1, width * height // 64)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                seed = hashlib.sha256(c or b"").digest()
                reps = (n_out + len(seed) - 1) // len(seed)
                out.append((seed * reps)[:n_out])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "content": out,
                "width": width,
                "height": height,
            })

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("window_idx", T.IntegerType(), False),
    T.StructField("n_windows", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def audio_window_features_stub(
    df: DataFrame, window_bytes: int = 1024
) -> DataFrame:
    """Audio framing plumbing: split each payload into fixed-size windows
    and emit a deterministic 4-dim feature per window (real impl: PCM
    decode + MFCC per frame, same output shape). One output row per
    window — the explode happens INSIDE the pandas iterator so a long
    audio file fans out without a Spark-side explode of the binary."""

    def _win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, feats = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                c = c or b""
                n = max(1, (len(c) + window_bytes - 1) // window_bytes)
                for w in range(n):
                    chunk = c[w * window_bytes:(w + 1) * window_bytes]
                    h = hashlib.sha256(chunk).digest()
                    ids.append(mid)
                    idxs.append(w)
                    totals.append(n)
                    feats.append([b / 255.0 for b in h[:4]])
            yield pd.DataFrame({
                "media_id": ids, "window_idx": idxs,
                "n_windows": totals, "feature": feats,
            })

    return df.mapInPandas(_win, schema=AUDIO_WINDOW_SCHEMA)

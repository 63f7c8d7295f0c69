"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a
``struct`` metadata column (modality, mime, width/height/duration, …).
Transformations are Arrow-batched ``mapInPandas`` passes — the batch
shape, schema handling and partitioning are real and tested; the
*codec* step (actual JPEG/PNG/audio decode) is stubbed behind
``NotImplementedError`` because no image/audio libraries exist in this
environment. Byte-level features (sizes, histograms, entropy) are
computed for real.

Scale notes: payload columns should be the *last* thing read —
metadata-only predicates prune row groups without touching payload
bytes (parquet column pruning); ``maxPartitionBytes`` keeps payload
partitions bounded; feature extraction is embarrassingly parallel with
no shuffle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_METADATA_TYPE",
    "attach_binary_payload",
    "byte_stats",
    "byte_histogram_features",
    "decode_image",
    "sample_video_frames",
]

MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_binary_payload(
    df: DataFrame,
    payload_col: str,
    modality: str,
    mime: str,
    width=None,
    height=None,
    duration_ms=None,
) -> DataFrame:
    """Attach a typed ``media_meta`` struct for an existing binary
    column. ``n_bytes`` is computed; geometry fields may be columns or
    None."""
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime"),
        (width if width is not None else F.lit(None).cast("int")).alias("width"),
        (height if height is not None else F.lit(None).cast("int")).alias("height"),
        (
            duration_ms if duration_ms is not None else F.lit(None).cast("long")
        ).alias("duration_ms"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )
    return df.withColumn("media_meta", meta)


def byte_stats(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Cheap JVM-side payload stats: size + md5 (content addressing)."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_md5"),
    )


_HIST_BUCKETS = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("__id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
    ]
)


def byte_histogram_features(
    df: DataFrame, payload_col: str, id_col: str
) -> DataFrame:
    """Real byte-level feature extraction over Arrow batches:
    16-bucket normalized byte histogram + Shannon entropy per payload.

    ``mapInPandas`` streams record batches; nothing is collected to the
    driver and partitions process independently (the 100 TB shape for
    any per-payload featurizer — swap the body for a real decoder when
    codec libraries are present)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((_id, 0, 0.0, [0.0] * _HIST_BUCKETS))
                    continue
                data = bytes(payload)
                n = len(data)
                counts = [0] * _HIST_BUCKETS
                for byte in data:
                    counts[byte >> 4] += 1
                if n:
                    hist = [round(c / n, 6) for c in counts]
                    entropy = round(
                        -sum(p * math.log2(p) for p in hist if p > 0), 4
                    )
                else:
                    hist = [0.0] * _HIST_BUCKETS
                    entropy = 0.0
                rows.append((_id, n, entropy, hist))
            yield pd.DataFrame(
                rows, columns=["__id", "n_bytes", "entropy", "histogram"]
            )

    out = df.select(
        F.col(id_col).cast("long").alias(id_col), payload_col
    ).mapInPandas(extract, schema=_FEATURE_SCHEMA)
    return out.withColumnRenamed("__id", id_col)


def decode_image(
    df: DataFrame, payload_col: str, resize_to: Optional[tuple[int, int]] = None
) -> DataFrame:
    """Decode an image payload column to pixel arrays (and optionally
    resize).

    STUB: this environment ships no image codec (no PIL/opencv). The
    Spark-side contract is final — binary in, ``array<float>`` pixels +
    width/height out, via ``mapInPandas`` exactly like
    :func:`byte_histogram_features` — but calling it raises until a
    codec library is installed."""
    raise NotImplementedError(
        "image decoding requires an image codec library (PIL/opencv), "
        "not available in this environment; see byte_histogram_features "
        "for the identical mapInPandas plumbing with a real body"
    )


def sample_video_frames(
    df: DataFrame, payload_col: str, every_ms: int = 1000
) -> DataFrame:
    """Sample frames from video payloads every ``every_ms``.

    STUB: no media codec in this environment (see :func:`decode_image`)."""
    raise NotImplementedError(
        "video frame sampling requires a media codec library, "
        "not available in this environment"
    )

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
import sys
from collections.abc import Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The mapInPandas closures below reference module-level helpers (the
# codec swap points), which cloudpickle would ship by reference and so
# require this package on every executor's PYTHONPATH — ship the module
# by value instead (see _shipping.py).
from .._shipping import ship_module_by_value

ship_module_by_value(sys.modules[__name__])

__all__ = [
    "MEDIA_METADATA_TYPE",
    "attach_binary_payload",
    "byte_stats",
    "byte_histogram_features",
    "decode_image",
    "perceptual_hash",
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

def _feature_schema(id_type: T.DataType) -> T.StructType:
    return T.StructType(
    [
        T.StructField("__id", id_type),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
        # raw integer bucket counts alongside the normalized ratios:
        # exact at ANY payload size (reconstructing counts from 6dp
        # ratios via round(p*n) breaks past ~1 MB payloads), and the
        # mergeable form downstream corpus-level aggregation needs
        T.StructField("counts", T.ArrayType(T.LongType())),
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
                    rows.append(
                        (_id, 0, 0.0, [0.0] * _HIST_BUCKETS, [0] * _HIST_BUCKETS)
                    )
                    continue
                data = bytes(payload)
                n = len(data)
                if n:
                    import numpy as np

                    counts = (
                        np.bincount(
                            np.frombuffer(data, np.uint8) >> 4,
                            minlength=_HIST_BUCKETS,
                        )
                        .astype(int)
                        .tolist()
                    )
                else:
                    counts = [0] * _HIST_BUCKETS
                if n:
                    hist = [round(c / n, 6) for c in counts]
                    # entropy from the EXACT counts, not the 6dp-rounded
                    # ratios: per-bucket rounding error accumulated to
                    # ~1e-4, enough to flip the 4th decimal on large
                    # payloads
                    entropy = round(
                        -sum(
                            (c / n) * math.log2(c / n)
                            for c in counts
                            if c
                        ),
                        4,
                    )
                else:
                    hist = [0.0] * _HIST_BUCKETS
                    entropy = 0.0
                rows.append((_id, n, entropy, hist, counts))
            yield pd.DataFrame(
                rows, columns=["__id", "n_bytes", "entropy", "histogram", "counts"]
            )

    out = df.select(
        # the id keeps ITS OWN type: cast('long') silently nulled every
        # string id (crawl corpora routinely key by string doc ids)
        F.col(id_col), payload_col
    ).mapInPandas(extract, schema=_feature_schema(df.schema[id_col].dataType))
    return out.withColumnRenamed("__id", id_col)


def _decode_schema(id_type: T.DataType) -> T.StructType:
    return T.StructType(
    [
        T.StructField("__id", id_type),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ]
)


def _fake_image_codec(data: bytes):
    """Deterministic stand-in for a real image decoder (no PIL/opencv in
    this environment — CODEC SWAP POINT, clearly marked).

    Derives a small grayscale "image" purely from the payload bytes:
    dimensions from the first bytes, pixels by tiling the payload.
    Pure function of the input ⇒ tests can assert exact values."""
    import numpy as np

    if not data:
        raise NotImplementedError("empty payload: nothing to decode")
    w = 4 + (data[0] % 5)
    h = 4 + (data[len(data) // 2] % 5)
    buf = np.frombuffer(data, dtype=np.uint8)
    tiled = np.resize(buf, w * h).astype(np.float32) / 255.0
    return w, h, tiled.reshape(h, w)


def _resize_nearest(img, to_w: int, to_h: int):
    """Nearest-neighbor resize (real logic, codec-independent)."""
    import numpy as np

    h, w = img.shape
    rows = (np.arange(to_h) * h // to_h).clip(0, h - 1)
    cols = (np.arange(to_w) * w // to_w).clip(0, w - 1)
    return img[np.ix_(rows, cols)]


def _pil_image_codec(data: bytes):
    """Real decoder used automatically when Pillow is importable:
    grayscale-converts and returns ``(w, h, float32[h, w] in [0,1])``."""
    import io

    import numpy as np
    from PIL import Image  # noqa: PLC0415 — availability checked by caller

    img = Image.open(io.BytesIO(data)).convert("L")
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return img.width, img.height, arr


def _default_image_codec():
    """Pillow when installed, else the deterministic fake — the swap
    point resolves itself on capable clusters."""
    try:
        import PIL  # noqa: F401

        return _pil_image_codec
    except ImportError:
        return _fake_image_codec


def _resolve_image_codec(codec):
    """Accept a callable, or the names "auto" (default: Pillow when the
    EXECUTOR can import it, else the fake), "pil", "fake".  Resolution
    is deferred to the worker side on purpose: the driver's environment
    proves nothing about where the decode actually runs."""
    if callable(codec):
        return codec
    if codec in (None, "auto"):
        return _default_image_codec()
    if codec == "pil":
        return _pil_image_codec
    if codec == "fake":
        return _fake_image_codec
    raise ValueError(f"codec must be callable or 'auto'/'pil'/'fake', got {codec!r}")


def decode_image(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    resize_to: Optional[tuple[int, int]] = None,
    codec=None,
) -> DataFrame:
    """Decode an image payload column to pixel arrays, optionally
    resized — full ``mapInPandas`` plumbing (schema, Arrow batching,
    partition independence) with a pluggable codec.

    ``codec`` is a callable ``bytes -> (width, height, ndarray[h, w])``
    or one of ``"auto"`` (default: Pillow grayscale decode when the
    EXECUTOR can import it, else the deterministic fake —
    :func:`_fake_image_codec`; no image library ships in this test
    environment; CODEC SWAP POINT), ``"pil"``, ``"fake"``.  Name
    resolution happens inside the worker so a driver/executor
    environment mismatch cannot pick the wrong decoder.  Output:
    ``(id, width, height, pixels: array<float>)`` row-major."""
    _resolve_image_codec(codec)  # validate names eagerly on the driver
    if resize_to is not None and (resize_to[0] < 1 or resize_to[1] < 1):
        # a zero/negative dimension silently emits empty pixel arrays
        raise ValueError(
            f"decode_image: resize_to must be positive, got {resize_to}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _resolve_image_codec(codec)
        rows = []
        for pdf in batches:
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                w, h, img = decode(bytes(payload))
                if resize_to is not None:
                    w, h = resize_to
                    img = _resize_nearest(img, w, h)
                rows.append((_id, w, h, [float(p) for p in img.ravel()]))
            yield pd.DataFrame(rows, columns=["__id", "width", "height", "pixels"])
            rows = []

    out = df.select(
        F.col(id_col), payload_col
    ).mapInPandas(run, schema=_decode_schema(df.schema[id_col].dataType))
    return out.withColumnRenamed("__id", id_col)


def _phash_schema(id_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("__id", id_type),
            T.StructField("phash", T.LongType()),
        ]
    )


def perceptual_hash(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    codec=None,
    grid: tuple[int, int] = (7, 8),
    on_undecodable: str = "fail",
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image payload:
    decode -> nearest-resize to ``grid`` (h, w) -> threshold each cell
    against the grid mean -> pack the bits into ONE bigint.  Feed the
    output straight to :func:`~.dedup.hamming_pairs` for image
    near-duplicate detection — visually identical images (recompressed,
    slightly edited) land within a few bits, the classic
    pHash-dedup layout for multimodal corpora.

    The default 7x8 grid gives a 56-bit hash — inside the <= 60-bit
    positive-BIGINT signature contract :func:`~.dedup.simhash` and
    ``hamming_pairs`` share (bit k of the hash is cell ``k`` row-major,
    set iff its level is >= the grid mean).

    The threshold runs on INTEGER levels (``round(pixel * 255)``) with
    the mean comparison as ``level * n_cells >= sum(levels)`` — pure
    integer arithmetic, so the hash is bit-identical across engines
    and codecs that agree on pixel values (no float-mean tie hazard);
    for byte-derived codecs the level IS the source byte.

    Codec resolution is :func:`decode_image`'s (``"auto"``/``"pil"``/
    ``"fake"``/callable, resolved worker-side — CODEC SWAP POINT).
    NULL payloads are skipped like :func:`decode_image`'s.

    ``on_undecodable`` decides what a codec FAILURE (empty blob,
    truncated JPEG, wrong container) does: ``"fail"`` (default) kills
    the job with the payload's id in the message — the right default
    for curated corpora where corruption means a broken upstream;
    ``"skip"`` drops the row and continues — the right setting for the
    live-crawl ingest filter, where corrupt blobs are routine and one
    must not kill the stream.  Output: ``(id, phash bigint)``.
    """
    gh, gw = grid
    if gh < 1 or gw < 1 or gh * gw > 60:
        raise ValueError(
            f"perceptual_hash: grid cells must be in 1..60 (signature "
            f"fits a positive BIGINT), got {gh}x{gw}={gh * gw}"
        )
    if on_undecodable not in ("fail", "skip"):
        raise ValueError(
            "perceptual_hash: on_undecodable must be 'fail' or 'skip', "
            f"got {on_undecodable!r}"
        )
    _resolve_image_codec(codec)  # validate names eagerly on the driver

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        decode = _resolve_image_codec(codec)
        n_cells = gh * gw
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    _w, _h, img = decode(bytes(payload))
                except Exception as exc:
                    if on_undecodable == "skip":
                        continue
                    raise ValueError(
                        f"perceptual_hash: payload for id {_id!r} failed "
                        f"to decode ({exc}); pass on_undecodable='skip' "
                        "to drop undecodable rows instead"
                    ) from exc
                cells = _resize_nearest(img, gw, gh)
                # integer levels: exact for byte-derived pixels
                # (round(float32(b/255)*255) == b for all 0..255)
                lv = np.floor(
                    cells.astype(np.float64).ravel() * 255.0 + 0.5
                ).astype(np.int64)
                total = int(lv.sum())
                bits = lv * n_cells >= total
                ph = int(
                    (bits.astype(np.int64) << np.arange(n_cells)).sum()
                )
                rows.append((_id, ph))
            yield pd.DataFrame(rows, columns=["__id", "phash"])

    out = df.select(F.col(id_col), payload_col).mapInPandas(
        run, schema=_phash_schema(df.schema[id_col].dataType)
    )
    return out.withColumnRenamed("__id", id_col)


def _frame_schema(id_type: T.DataType) -> T.StructType:
    return T.StructType(
    [
        T.StructField("__id", id_type),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_video_codec(data: bytes):
    """Deterministic stand-in for a video demuxer (CODEC SWAP POINT):
    duration proportional to payload size, each frame a content-derived
    digest. ``codec(bytes) -> (duration_ms, frame_at(ms) -> bytes)``."""
    import hashlib

    duration_ms = max(1, len(data)) * 10

    def frame_at(ms: int) -> bytes:
        return hashlib.md5(data + ms.to_bytes(8, "big")).digest()

    return duration_ms, frame_at


def sample_video_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_ms: int = 1000,
    codec=None,
) -> DataFrame:
    """Sample one frame every ``every_ms`` from each video payload —
    a one-to-many ``mapInPandas`` (each input row yields
    duration/every_ms output rows), the shape a real ffmpeg-backed
    sampler would keep unchanged.

    Output: ``(id, frame_ms, frame: binary)``."""
    if every_ms < 1:
        # 0 dies deep in executors (range() arg 3 must not be zero);
        # negative silently emits zero frames for every video
        raise ValueError(
            f"sample_video_frames: every_ms must be >= 1, got {every_ms}"
        )
    if codec is not None and not callable(codec):
        # the sibling decode_image/perceptual_hash contract validates
        # eagerly on the driver; a name string here would die per-task
        # with "'str' object is not callable"
        raise ValueError(
            "sample_video_frames: codec must be a callable "
            "(payload) -> (duration_ms, frame_at) or None for the "
            "deterministic fake"
        )
    demux = codec or _fake_video_codec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                duration_ms, frame_at = demux(bytes(payload))
                for ms in range(0, duration_ms, every_ms):
                    rows.append((_id, ms, frame_at(ms)))
            yield pd.DataFrame(rows, columns=["__id", "frame_ms", "frame"])

    out = df.select(
        F.col(id_col), payload_col
    ).mapInPandas(run, schema=_frame_schema(df.schema[id_col].dataType))
    return out.withColumnRenamed("__id", id_col)

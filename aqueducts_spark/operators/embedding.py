"""Embedding-column utilities: int8 scalar quantization and exact
per-label centroid aggregation.

These complement ``operators/similarity.py`` (search) with the two
storage/aggregation primitives a 100 TB embedding pipeline needs:

* :func:`quantize_embeddings` — per-vector symmetric int8 quantization
  (the standard 4x storage/IO reduction before ANN indexing). Pure
  map over the corpus: zero shuffles, all arithmetic in built-in
  higher-order functions (JVM codegen, no Python).
* :func:`label_centroids` — mean vector per label. Floating-point sums
  are partition-order dependent, so for reproducibility (and the DuckDB
  oracle) values are folded in **fixed-point micro-units**
  (``floor(x * 1e6)`` as BIGINT): integer sums are exact and
  order-independent, making the result bit-stable under any
  parallelism. One shuffle keyed by (label, dim), map-side combined.

The reference has no embedding operators (it delegates all compute to
DataFusion SQL — aqueducts/core/src/stages/mod.rs:58); these are
beyond-reference training-data primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_embeddings", "label_centroids"]


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization.

    ``scale = max(|x|) / 127`` and ``q_i = floor(x_i / scale + 0.5)``
    clamped to [-127, 127]; an all-zero vector quantizes to zeros with
    scale 0. ``floor(x + 0.5)`` (round-half-up) is used instead of
    ``round`` because its IEEE-double evaluation is identical across
    engines, which keeps the operator oracle-exact.

    Output: ``(id, qvec array<int>, scale double, dim int)``.
    Reconstruction is ``q_i * scale``; max error is ``scale / 2``.
    """
    x = F.col(vec_col)
    scale = (
        F.aggregate(
            x,
            F.lit(0.0),
            lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
        )
        / F.lit(127.0)
    )
    # NULL components stay NULL: Spark's least/greatest SKIP null
    # arguments, so the bare clamp turned a missing component into the
    # strongest positive signal (+127)
    def _q(v):
        return F.when(
            v.isNotNull(),
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(v.cast("double") / F.col("scale") + F.lit(0.5)).cast(
                        "int"
                    ),
                ),
            ),
        )

    qvec = F.when(
        F.col("scale") == 0.0,
        F.transform(x, lambda v: F.when(v.isNotNull(), F.lit(0).cast("int"))),
    ).otherwise(F.transform(x, _q))
    return (
        df.withColumn("scale", scale)
        .select(
            F.col(id_col),
            qvec.alias("qvec"),
            F.col("scale"),
            F.size(x).alias("dim"),
        )
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean vector in long form, exactly reproducible.

    Each component is truncated to micro-units (``floor(x * 1e6)`` as
    BIGINT) before summing, so the aggregation is integer-exact and
    independent of partitioning/order — the property the DuckDB oracle
    and the parallelism-invariance tests rely on. The double
    ``centroid`` column is derived from the exact integers.

    Output: ``(label, dim, n_vectors, sum_micro, centroid)``, one row
    per (label, vector-component). One shuffle on (label, dim) with
    map-side partial aggregation; no Python in the hot path.
    NULL components are excluded from BOTH the sum and the count, so a
    partially-missing vector biases nothing (counting it in the
    denominator but not the numerator used to pull centroids toward 0).
    """
    parts = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "val"),
    ).select(
        "label",
        "dim",
        F.floor(F.col("val").cast("double") * F.lit(1e6)).cast("bigint").alias(
            "micro"
        ),
    )
    agg = parts.groupBy("label", "dim").agg(
        F.count("micro").alias("n_vectors"),
        F.sum("micro").alias("sum_micro"),
    )
    return agg.select(
        "label",
        "dim",
        "n_vectors",
        "sum_micro",
        (
            F.col("sum_micro").cast("double")
            / (F.col("n_vectors").cast("double") * F.lit(1e6))
        ).alias("centroid"),
    )

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

__all__ = [
    "quantize_embeddings",
    "label_centroids",
    "linear_probe_score",
    "projection_matrix",
    "random_projection",
]


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


def linear_probe_score(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float | None = None,
) -> DataFrame:
    """Linear classifier head over an embedding column — the
    model-based quality-filter step of modern curation pipelines
    (FineWeb-Edu-style educational-value scoring: embed every document
    once, then filter with a cheap linear probe trained offline).

    Exactly reproducible fixed-point scoring: components quantize to
    milli-units (``floor(x * 1e3)``), weights quantize once driver-side
    the same way, and the dot product is an integer fold — so
    ``score_micro`` (bigint, micro-units) is bit-identical under any
    partitioning and across engines, the same discipline as
    :func:`label_centroids`. ``score`` is derived from the exact
    integer. NULL COMPONENTS contribute 0 (no evidence, not a poison
    pill) — but a vector whose LENGTH differs from the probe raises
    loudly: that is a wrong-model/wrong-table error, and zero-padding
    it would return a plausible-looking partial dot product. Probability-style consumers can apply
    their own sigmoid; it is deliberately not emitted because
    ``exp()`` is not bit-identical across engines.

    Zero shuffles: the weight vector rides as a literal array in the
    plan (fine for embedding-sized D; for D beyond ~10k switch to a
    broadcast join on ``posexplode`` output). With ``threshold``, a
    boolean ``keep`` column marks rows at or above it (compared in
    exact micro-units).

    Output: ``(id, score_micro bigint, score double[, keep boolean])``.
    """
    if not weights:
        raise ValueError("linear_probe_score: weights must be non-empty")
    import math as _math

    w_milli = [int(_math.floor(float(w) * 1e3)) for w in weights]
    bias_micro = int(_math.floor(float(bias) * 1e6))
    warr = F.array(*[F.lit(w).cast("bigint") for w in w_milli])
    # dimension guard: zip_with NULL-pads the shorter array and the
    # coalesce below would map every padded term to 0 — a 384-d vector
    # scored by a 768-weight probe (wrong model for the table) would
    # return a plausible-looking PARTIAL dot product instead of failing
    x = F.when(
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) != F.lit(len(weights))),
        F.raise_error(
            F.concat(
                F.lit("linear_probe_score: vector dim "),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(f" != probe dim {len(weights)}"),
            )
        ).cast(df.schema[vec_col].dataType),
    ).otherwise(F.col(vec_col))
    terms = F.zip_with(
        x,
        warr,
        lambda xi, wi: F.coalesce(
            F.floor(xi.cast("double") * F.lit(1e3)).cast("bigint") * wi,
            F.lit(0).cast("bigint"),
        ),
    )
    score_micro = (
        F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, v: acc + v)
        + F.lit(bias_micro).cast("bigint")
    )
    out = df.select(
        F.col(id_col),
        score_micro.alias("score_micro"),
    ).withColumn("score", F.col("score_micro").cast("double") / F.lit(1e6))
    if threshold is not None:
        thr_micro = int(_math.floor(float(threshold) * 1e6))
        out = out.withColumn("keep", F.col("score_micro") >= F.lit(thr_micro))
    return out


def projection_matrix(k: int, in_dim: int, seed: str = "jl") -> list[list[int]]:
    """Deterministic ±1 sign matrix (k rows × in_dim columns) for
    :func:`random_projection`: entry ``(j, d)`` is +1 iff the first
    md5 hex digit of ``"{seed}:{j}:{d}"`` is even.  A pure function of
    ``seed`` — no RNG state, replayable on any engine (the gate's
    DuckDB oracle rebuilds the identical matrix)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{j}:{d}".encode()).hexdigest()[0], 16)
            % 2
            == 0
            else -1
            for d in range(in_dim)
        ]
        for j in range(k)
    ]


def random_projection(
    df: DataFrame,
    k: int,
    in_dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
    seed: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``k`` dimensions with
    a dense ±1 sign matrix (Achlioptas 2003's database-friendly
    variant) — the standard cheap dimensionality reduction before
    LSH/ANN indexing or clustering: pairwise distances are preserved
    within ``(1±ε)`` for ``k = O(log n / ε²)``, and the matrix is a
    pure hash function (:func:`projection_matrix`), so the projection
    is reproducible anywhere with no stored model.

    ``out[j] = (Σ_d vec[d] · sign[j][d]) / √k`` — the √k scaling makes
    the projection approximately norm-preserving.  Vectors shorter
    than ``in_dim`` (or with NULL components) produce NULL in every
    output dimension rather than a silently truncated dot product;
    longer vectors use their first ``in_dim`` components.

    Output: ``(id_col, out_col array<double>)``.

    Scale shape: the matrix rides the PLAN as ``k·in_dim`` integer
    literals (bounded: k·in_dim ≤ 65536 enforced) — zero shuffles, no
    Python, no broadcast; each row costs ``k·in_dim`` fused
    multiply-adds in whole-stage codegen, IO-bound at 100 TB.  For
    models too large to inline (k·in_dim beyond ~10⁵), switch to a
    pandas-UDF matmul over a broadcast numpy matrix — this literal
    form doubles as its correctness oracle.
    """
    if k < 1 or in_dim < 1:
        raise ValueError("random_projection: k and in_dim must be >= 1")
    if k * in_dim > 65536:
        raise ValueError(
            f"random_projection: k*in_dim = {k * in_dim} > 65536 — the "
            "sign matrix is inlined into the plan as literals; use a "
            "pandas-UDF matmul with a broadcast matrix at this size"
        )
    signs = projection_matrix(k, in_dim, seed)
    x = F.col(vec_col)
    inv_sqrt_k = 1.0 / (k ** 0.5)
    dims = []
    for j in range(k):
        row = F.array(*[F.lit(float(s)) for s in signs[j]])
        acc = F.aggregate(
            F.zip_with(
                F.slice(x, 1, in_dim).cast("array<double>"),
                row,
                lambda v, s: v * s,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        # a short vector zip_withs against NULL pads -> NULL sum, kept
        dims.append(acc * F.lit(inv_sqrt_k))
    return df.select(F.col(id_col), F.array(*dims).alias(out_col))

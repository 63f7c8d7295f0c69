"""Z-order (Morton) multi-column clustering keys.

``cluster_by`` (destinations/write.py) gives file-level min/max pruning
on ONE leading dimension — a linear sort can only be tight in its first
key.  Z-ordering interleaves the bits of several columns so that rows
close in ANY clustered dimension land close in the one-dimensional sort
order; each output file then covers a small hyper-rectangle and scans
filtering on ANY subset of the z-columns prune whole files.  This is
the same layout Delta Lake's OPTIMIZE ZORDER BY produces; here it is a
plain column expression, so it works with any file destination.

Construction (all integer arithmetic, engine-portable):

1. quantize each column to ``bits``-bit buckets with its global min/max:
   ``bucket = (v - min) * (2^bits - 1) DIV max(1, max - min)`` — the
   min/max pair per column is the only driver-side data (two scalars,
   same metadata scale as IVF centroid training);
2. interleave: bit j of bucket i becomes bit ``j * ncols + i`` of the
   key — shift/AND/OR expressions, fully whole-stage-codegen.

Scale: computing the key is 0 shuffles (the min/max agg is one tiny
job); writing clustered output is the same single range shuffle as
``cluster_by``.  Quantization keeps products inside int64 for column
ranges up to 2^47 at the default 16 bits.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["column_minmax", "zorder_key", "with_zorder_key"]


def column_minmax(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple[int, int]]:
    """Global (min, max) per column — one tiny aggregate job; the two
    scalars per column parameterize the quantization."""
    aggs = []
    for c in cols:
        # backtick-quote (the profile.py convention): a bare name with
        # dots resolves a nested field, not the column named 'a.b'
        qc = F.col("`" + c.replace("`", "``") + "`")
        aggs += [F.min(qc).alias(f"__mn_{c}"), F.max(qc).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if mn is None:
            raise ValueError(f"zorder: column {c} is all-null")
        out[c] = (int(mn), int(mx))
    return out


def zorder_key(
    minmax: dict[str, tuple[int, int]], cols: Sequence[str], bits: int = 16
) -> Column:
    """The interleaved key as a column expression (deterministic given
    the min/max dict; nulls quantize to bucket 0)."""
    if not 1 <= bits <= 20:
        raise ValueError("zorder: bits must be in [1, 20]")
    ncols = len(cols)
    if ncols < 2:
        raise ValueError("zorder: need at least 2 columns (use cluster_by for 1)")
    if bits * ncols > 62:
        raise ValueError(f"zorder: {bits} bits x {ncols} cols exceeds int64")
    maxb = (1 << bits) - 1
    terms = []
    for i, c in enumerate(cols):
        mn, mx = minmax[c]
        rng = max(1, mx - mn)
        if rng > (2**63 - 1) // maxb:
            # (value - min) * maxb overflows int64 mid-job (ANSI aborts,
            # legacy silently wraps to corrupt keys) — fail fast while
            # the min/max are still on the driver.  Epoch-microsecond
            # ranges hit this: quantize to a coarser unit first.
            raise ValueError(
                f"zorder: column {c} spans {rng} (> {(2**63 - 1) // maxb} "
                f"at bits={bits}) — reduce bits or pre-quantize the column"
            )
        # cast BEFORE subtracting: (int32 - int32) spanning > 2^31
        # overflows in the column's native type (ANSI mode throws,
        # legacy wraps to negative buckets).  The DELTA clamps into
        # [0, rng] BEFORE the multiply: with a caller-supplied minmax
        # (e.g. yesterday's stats applied to today's data) an
        # out-of-range value's delta*maxb would overflow int64 itself —
        # ANSI aborts the write, legacy wraps to an arbitrary bucket no
        # post-multiply clamp can fix.  delta<=rng plus the rng guard
        # above makes the product overflow-free, and the bucket lands
        # in [0, maxb] by construction.
        # identifier backtick-quoted before SQL interpolation (the
        # repo-wide convention): a raw 'event-time' parses as a
        # SUBTRACTION, 'a.b' as struct access, 'order' as a keyword
        qc = "`" + c.replace("`", "``") + "`"
        bucket = F.expr(
            f"LEAST({rng}L, GREATEST(0L, "
            f"COALESCE((CAST({qc} AS BIGINT) - CAST({mn} AS BIGINT)), 0)"
            f")) * {maxb} DIV {rng}"
        )
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, j * ncols + i))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zorder_key")


def with_zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16, key_col: str = "zorder_key"
) -> DataFrame:
    """Attach the z-key column (computes min/max first)."""
    mm = column_minmax(df, cols)
    return df.withColumn(key_col, zorder_key(mm, cols, bits))

"""Table profiling: per-column data-quality statistics in one pass.

The pre-flight twin of ``plans.lint_plan`` for *data* instead of plans
— run it (or its declarative ``profile_table`` stage) before a 100 TB
job to catch the usual poisons: null-riddled join keys, constant
columns, unexpected cardinalities, truncated strings.

Scale shape: ONE aggregation job over the table. All per-column
statistics are expressions inside a single global ``agg`` (partial
aggregation map-side, a few hundred scalars per task into the final
reduce) — except exact distinct counts, which Spark plans as an
EXPAND (one duplicated stream per counted column): cost is
columns × rows map-side, still one shuffle of partial states. For
quick looks at very wide tables set ``exact_distinct=False`` to use
HLL sketches (``approx_count_distinct``) with no EXPAND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-form profile: one row per column with
    ``(column, dtype, n_rows, n_nulls, n_distinct, min_repr, max_repr)``.

    min/max are string representations (cast) so heterogeneous column
    types fit one output schema; numeric order is preserved inside the
    aggregation (min/max computed on the native type, cast after).
    """
    dtypes = dict(df.dtypes)
    # explicit [] must NOT mean "everything": a dynamically-filtered
    # empty selection would silently become the most expensive
    # all-columns pass (with exact_distinct, an EXPAND over the table)
    cols = list(dtypes) if columns is None else list(columns)
    if not cols:
        raise ValueError(
            "profile_table: columns is empty — pass None to profile "
            "every column"
        )
    unknown = [c for c in cols if c not in dtypes]
    if unknown:
        raise ValueError(f"profile_table: unknown columns {unknown}")

    # index-based internal aliases + df[c] references: column NAMES
    # never enter parsed SQL text, so names with dots, quotes, hyphens
    # or spaces profile fine (F.col('a.b') would read a nested field,
    # and a raw name inside stack() would be re-parsed as an expression)
    # map-typed columns are unorderable and non-hashable in Spark:
    # min/max/count_distinct on them raise AnalysisException, so those
    # stats emit NULL (null count still profiles)
    from pyspark.sql import types as _T

    def _unorderable(dt) -> bool:
        if isinstance(dt, _T.MapType):
            return True
        if isinstance(dt, _T.ArrayType):
            return _unorderable(dt.elementType)
        if isinstance(dt, _T.StructType):
            return any(_unorderable(f.dataType) for f in dt.fields)
        return False

    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        # backtick-quote the reference: bare F.col('x.y')/df['x.y']
        # would resolve a nested field, not the column named 'x.y'
        col = F.col("`" + c.replace("`", "``") + "`")
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__nulls_{i}"))
        if _unorderable(by_name[c]):
            aggs.append(F.lit(None).cast("long").alias(f"__dist_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__min_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{i}"))
            continue
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"__dist_{i}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__dist_{i}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{i}"))
    wide = df.agg(*aggs)

    # pivot the single wide row to long form with a stack expression —
    # still zero extra passes over the data
    def lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    parts = ", ".join(
        f"{lit(c)}, {lit(dtypes[c])}, __nulls_{i}, __dist_{i}, __min_{i}, __max_{i}"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {parts}) AS "
        "(column, dtype, n_nulls, n_distinct, min_repr, max_repr)",
        "n_rows",
    ).select(
        "column", "dtype", "n_rows",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_repr", "max_repr",
    )

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

__all__ = ["profile_table", "corpus_datacard", "corpus_diff"]


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
        # coalesce: SUM over zero rows is NULL, so an empty table would
        # report n_rows=0 but n_nulls=NULL
        aggs.append(
            F.coalesce(
                F.sum(col.isNull().cast("long")), F.lit(0).cast("long")
            ).alias(f"__nulls_{i}")
        )
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


def corpus_datacard(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Per-source corpus DATACARD — the summary table a training-data
    release publishes (and the first thing to look at before mixing):
    volume, emptiness, token/char mass, length distribution, language
    composition, and exact-duplicate pressure, one row per source.

    Output per ``group_col`` value:

    * ``n_docs, n_null_text, n_empty_text`` — volume and emptiness
      (empty = non-NULL text that trims to ``''``),
    * ``n_tokens, n_chars, avg_doc_tokens`` — whitespace-token and
      character mass (6dp average; NULL text counts 0),
    * ``p50_tokens, p90_tokens`` — linearly interpolated token-length
      quantiles (6dp — identical `percentile`/`quantile_cont`
      semantics in Spark and DuckDB),
    * ``n_langs, top_lang, top_lang_share`` — language composition
      (NULL langs are excluded from both the distinct count and the
      ranking; ties break to the lexicographically smallest lang),
    * ``n_dup_docs, dup_frac`` — documents whose exact text (md5 of
      the raw bytes) appears on >= 1 OTHER document of the same
      source; NULL texts never count as duplicates.

    Scale shape (r9): the corpus is scanned and tokenized ONCE into a
    SLIM per-doc projection — group, null/empty flags, token and char
    counts, the text's md5 fingerprint, lang; NO raw text — which is
    materialized, because its consumers ((1) the main stats on
    ``group_col``, (2) the language ranking on ``(group, lang)`` —
    itself consumed twice, (3) the duplicate count on ``(group, md5)``)
    each re-executed the full scan+tokenize on the write path, where
    AQE reuses nothing.  All aggregates are keyed on bounded
    cardinalities and map-side combined; the per-group results are
    source-cardinality-sized and broadcast-joined; nothing wide ever
    shuffles and the raw text never leaves the scan projection.
    """
    from pyspark.sql.window import Window

    from .dedup import normalized_tokens
    from .materialize import materialize

    text = F.col(text_col)
    toks = F.when(
        text.isNotNull(), F.size(normalized_tokens(text)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    base = materialize(
        df.select(
            F.col(group_col).alias("__g"),
            text.isNull().alias("__tnull"),
            (text.isNotNull() & (F.trim(text) == "")).alias("__tempty"),
            toks.alias("__tok"),
            F.coalesce(F.length(text).cast("long"), F.lit(0)).alias("__ch"),
            F.md5(text).alias("__fp"),  # NULL text -> NULL fingerprint
            *([F.col(lang_col).alias("__lang")] if lang_col else []),
        )
    )
    stats = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count(F.when(F.col("__tnull"), 1)).cast("bigint").alias("n_null_text"),
        F.count(
            F.when(F.col("__tempty"), 1)
        ).cast("bigint").alias("n_empty_text"),
        F.sum("__tok").cast("bigint").alias("n_tokens"),
        F.sum("__ch").cast("bigint").alias("n_chars"),
        F.round(F.avg("__tok"), 6).alias("avg_doc_tokens"),
        F.round(F.expr("percentile(__tok, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(__tok, 0.9)"), 6).alias("p90_tokens"),
    )
    out = stats
    if lang_col:
        lc = base.where(F.col("__lang").isNotNull()).groupBy(
            "__g", "__lang"
        ).agg(F.count(F.lit(1)).alias("__n"))
        w = Window.partitionBy("__g").orderBy(
            F.desc("__n"), F.asc("__lang")
        )
        top = (
            lc.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select("__g", F.col("__lang").alias("top_lang"), F.col("__n"))
        )
        nlang = lc.groupBy("__g").agg(
            F.countDistinct("__lang").cast("bigint").alias("n_langs")
        )
        # eqNullSafe joins (keyed on a RENAMED right column so the drop
        # is unambiguous under broadcast): the NULL group is a
        # legitimate stats row (groupBy keeps it) but a plain column
        # join never matches NULL keys — its language stats silently
        # read 0/NULL
        nlang_r = nlang.withColumnRenamed("__g", "__gr")
        out = out.join(
            F.broadcast(nlang_r),
            F.col("__g").eqNullSafe(F.col("__gr")),
            "left",
        ).drop("__gr")
        top_r = top.withColumnRenamed("__g", "__gr")
        out = (
            out.join(
                F.broadcast(top_r),
                F.col("__g").eqNullSafe(F.col("__gr")),
                "left",
            )
            .drop("__gr")
            .withColumn(
                "top_lang_share",
                F.round(F.col("__n") / F.col("n_docs"), 6),
            )
            .drop("__n")
            .withColumn(
                "n_langs",
                F.coalesce(F.col("n_langs"), F.lit(0).cast("bigint")),
            )
        )
    dups = (
        base.where(F.col("__fp").isNotNull())
        .groupBy("__g", "__fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .groupBy("__g")
        .agg(F.sum("__n").cast("bigint").alias("n_dup_docs"))
    )
    dups_r = dups.withColumnRenamed("__g", "__gr")
    out = (
        # eqNullSafe: the NULL group is a legitimate stats row (groupBy
        # keeps it) but a plain column join never matches NULL keys —
        # its dup counts silently read 0
        out.join(
            F.broadcast(dups_r),
            F.col("__g").eqNullSafe(F.col("__gr")),
            "left",
        )
        .drop("__gr")
        .withColumn(
            "n_dup_docs",
            F.coalesce(F.col("n_dup_docs"), F.lit(0).cast("bigint")),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_docs") / F.col("n_docs"), 6)
        )
    )
    return out.withColumnRenamed("__g", group_col)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
    summary: bool = False,
) -> DataFrame:
    """Snapshot diff between two corpus versions — the dataset-iteration
    primitive ("what changed between v3 and v4 of the training set?").

    Each row of the output is one document id with a ``diff_status``:
    ``added`` (id only in ``new``), ``removed`` (id only in ``old``),
    ``changed`` (id in both, content fingerprint differs), or
    ``unchanged``.  Content identity is the md5 of the
    null-length-prefixed concatenation of ``content_cols`` (default:
    every shared non-id column) — the prefix framing means ``("ab","c")``
    and ``("a","bc")`` never collide, and a NULL is distinct from every
    string (the same framing discipline as dedup's ``_payload_key``).

    ``summary=True`` returns the per-status row counts instead
    (``diff_status, n_docs``) — the version-report shape.

    Contract: ``id_col`` must be unique within each side (a duplicated
    id makes "the document with this id changed" ill-posed) — enforced
    inside the one aggregation the diff already pays, not a second
    pass.  NULL ids are rejected for the same reason.

    Scale shape: ONE shuffle per side (groupBy id computes the
    fingerprint AND the uniqueness check together), then a single
    full-outer shuffle join on the id — co-partitioned with the
    upstream aggregates, so AQE plans it without a third exchange.
    No driver collection at any size.
    """
    if content_cols is None:
        shared = [c for c in old.columns if c in set(new.columns) and c != id_col]
        if not shared:
            raise ValueError(
                "corpus_diff: the two sides share no non-id columns — "
                "pass content_cols explicitly"
            )
        content_cols = shared
    if not content_cols:
        # an explicitly-empty list would otherwise die later in
        # F.concat() with an opaque analysis error
        raise ValueError(
            "corpus_diff: content_cols is empty — pass None to derive "
            "the shared non-id columns"
        )
    for side, df in (("old", old), ("new", new)):
        missing = [c for c in [id_col, *content_cols] if c not in df.columns]
        if missing:
            raise ValueError(
                f"corpus_diff: column(s) {missing!r} missing on the "
                f"{side} side"
            )

    def fingerprint(df: DataFrame, out: str) -> DataFrame:
        parts = []
        for c in content_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.when(s.isNull(), F.lit("\x00N")).otherwise(
                    F.concat(F.lit("\x00S"), F.length(s).cast("string"),
                             F.lit(":"), s)
                )
            )
        guarded_id = F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    "corpus_diff: NULL id — the diff is addressed by id; "
                    "assign ids first"
                )
            ).cast(df.schema[id_col].dataType),
        ).otherwise(F.col(id_col))
        return (
            df.select(
                guarded_id.alias("__id"),
                F.md5(F.concat(*parts)).alias("__h"),
            )
            .groupBy("__id")
            .agg(F.count(F.lit(1)).alias("__n"), F.min("__h").alias(out))
            .select(
                "__id",
                F.when(
                    F.col("__n") > 1,
                    F.raise_error(
                        F.lit(
                            "corpus_diff: duplicated id on one side — "
                            "'changed' is ill-posed for a non-unique id; "
                            "dedup (exact_dedup) first"
                        )
                    ).cast("string"),
                ).otherwise(F.col(out)).alias(out),
            )
        )

    o = fingerprint(old, "__ho")
    n = fingerprint(new, "__hn")
    joined = o.join(n, "__id", "full_outer").select(
        F.col("__id").alias(id_col),
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("diff_status"),
    )
    if summary:
        return joined.groupBy("diff_status").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs")
        )
    return joined

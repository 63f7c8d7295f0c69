"""Plan-quality gates: the scale-critical properties of each headline
plan are asserted, so a change that silently de-optimizes (loses a
pushdown, turns a broadcast join into a shuffle, adds Python to a hot
path) fails here rather than at 100 TB.
"""

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from aqueducts_spark.plans import inspect_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    entrymod._views(spark, SF)


def test_q01_pushdown_and_pruning(spark):
    info = inspect_plan(spark.sql(entrymod.Q01_SPARK))
    # the shipdate predicate must reach the parquet scan
    assert any("l_shipdate" in f for f in info.pushed_filters), info.pushed_filters
    # column pruning: the scan reads only the 7 referenced columns
    cols = info.scan_columns()[0]
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
    assert {"l_quantity", "l_extendedprice", "l_returnflag"} <= cols


def test_q02_broadcasts_dimensions(spark):
    info = inspect_plan(spark.sql(entrymod.Q02_SPARK))
    # both joins against the fact table must be broadcast — the fact
    # side (lineitem) is never shuffled for the join
    assert info.broadcast_joins == 2, info.text[:2000]
    assert info.sort_merge_joins == 0
    # the o_orderstatus filter is pushed into the orders scan
    assert any("o_orderstatus" in f and "F" in f for f in info.pushed_filters)


def test_q20_topk_is_take_ordered(spark):
    info = inspect_plan(spark.sql(entrymod.Q20_SPARK))
    # ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    # partition top-k then merge), never a global sort
    assert "TakeOrderedAndProject" in info.text
    assert "(\n" not in info.text or info.exchanges <= 1


def test_operators_stay_jvm_side(spark):
    """Dedup/text hot paths must contain no Python eval at all; the
    similarity scan kernel is the one sanctioned Arrow boundary — a
    single MapInPandas, never a row-at-a-time BatchEvalPython."""
    from aqueducts_spark.operators import dedup, similarity, text

    docs = spark.table("documents")
    emb = spark.table("embeddings")
    for df in [
        dedup.minhash_candidate_pairs(docs),
        dedup.simhash(docs),
        dedup.exact_dedup(docs, "doc_id", ["text"]),
        text.quality_score(docs),
        text.detect_language(docs),
    ]:
        info = inspect_plan(df)
        assert info.python_evals == 0, info.text[:1500]

    topk = similarity.brute_force_topk(
        emb, emb.limit(3).selectExpr("vec_id AS query_id", "embedding"), k=5
    )
    info = inspect_plan(topk)
    assert "BatchEvalPython" not in info.text, info.text[:1500]
    assert len(re.findall(r"\(\d+\) MapInPandas", info.text)) == 1, info.text[:1500]


def test_minhash_shuffle_budget(spark):
    """The banded-LSH pipeline should need few exchanges: signature
    aggregation, pair join sides, and the final distinct."""
    from aqueducts_spark.operators.dedup import minhash_candidate_pairs

    info = inspect_plan(minhash_candidate_pairs(spark.table("documents")))
    assert info.exchanges <= 6, f"{info.exchanges} exchanges\n{info.text[:2000]}"


def test_brute_force_topk_no_corpus_shuffle(spark):
    """Bounded query sets ride the task closure of ONE Arrow corpus
    scan: no join at all, and the only Exchange is the final per-query
    ranking window over partitions x queries x k candidate rows."""
    from aqueducts_spark.operators import similarity
    from aqueducts_spark.operators.similarity import brute_force_topk

    emb = spark.table("embeddings")
    q = emb.limit(3).selectExpr("vec_id AS query_id", "embedding")
    info = inspect_plan(brute_force_topk(emb, q, k=5))
    joins = (
        info.broadcast_joins + info.nested_loop_joins
        + info.sort_merge_joins + info.shuffle_hash_joins
    )
    assert joins == 0, info.text[:1500]
    assert info.exchanges <= 1, f"{info.exchanges} exchanges\n{info.text[:1500]}"

    # the unbounded/NaN fallback keeps the broadcast-join shape: the
    # corpus side is never shuffled for the join
    old = similarity._FORCE_JOIN_PATHS
    similarity._FORCE_JOIN_PATHS = True
    try:
        info = inspect_plan(brute_force_topk(emb, q, k=5))
    finally:
        similarity._FORCE_JOIN_PATHS = old
    assert info.broadcast_joins + info.nested_loop_joins >= 1, info.text[:1500]
    assert info.sort_merge_joins == 0
    assert info.python_evals == 0, info.text[:1500]


def test_weighted_mix_zero_shuffles(spark):
    """Mix composition is a per-row expression + explode: any Exchange
    in this plan is a regression."""
    from aqueducts_spark.operators.mixing import weighted_mix

    df = weighted_mix(
        spark.table("documents"), "lang", "doc_id", {"en": 2.0, "de": 0.5}
    )
    info = inspect_plan(df)
    assert info.exchanges == 0, f"{info.exchanges} exchanges\n{info.text[:1500]}"
    assert info.python_evals == 0


def test_pack_shards_single_shuffle(spark):
    """Shard packing hash-partitions once; packers never coordinate."""
    from aqueducts_spark.operators.mixing import pack_shards

    df = pack_shards(spark.table("documents"), "n_chars", "doc_id", 20000, parts=8)
    info = inspect_plan(df)
    assert info.exchanges == 1, f"{info.exchanges} exchanges\n{info.text[:1500]}"
    assert info.python_evals == 0


def test_kmv_two_exchanges_and_group_limit(spark):
    """KMV: one full-volume aggregation exchange + the tiny candidate
    window; Spark's WindowGroupLimit must pre-trim before the second."""
    from aqueducts_spark.operators.sketch import kmv_sketch

    df = kmv_sketch(spark.table("events"), ["event_type"], "user_id", 64)
    info = inspect_plan(df)
    assert info.exchanges == 2, f"{info.exchanges} exchanges\n{info.text[:1500]}"
    assert "WindowGroupLimit" in info.text
    assert info.python_evals == 0


def test_bloom_probe_side_zero_shuffle(spark):
    """The probe side tests its bit positions against a bitmap held in
    the task closure — no join, no Exchange.  The md5 path probes in
    exactly ONE Arrow-batched crossing (r11: the interpreted HOF /
    re-hashing expression forms were measured ~4x a plain scan); the
    xxhash64 path stays pure-expression (that hash is Spark-internal,
    not reproducible Python-side)."""
    from aqueducts_spark.operators.sketch import bloom_filter, bloom_sketch

    cust = spark.table("customer").where("c_mktsegment = 'BUILDING'")
    bits = bloom_sketch(cust, "c_custkey", num_bits=8192, num_hashes=4)
    out = bloom_filter(
        spark.table("orders"), "o_custkey", bits, num_bits=8192, num_hashes=4
    )
    info = inspect_plan(out)
    assert info.exchanges == 0, f"{info.exchanges} exchanges\n{info.text[:1500]}"
    assert info.python_evals == 1, info.text[:1500]
    assert "ArrowEvalPython" in info.text, info.text[:1500]

    bits_xx = bloom_sketch(
        cust, "c_custkey", num_bits=8192, num_hashes=4, hash_fn="xxhash64"
    )
    out_xx = bloom_filter(
        spark.table("orders"), "o_custkey", bits_xx,
        num_bits=8192, num_hashes=4, hash_fn="xxhash64",
    )
    info_xx = inspect_plan(out_xx)
    assert info_xx.exchanges == 0, info_xx.text[:1500]
    assert info_xx.python_evals == 0, info_xx.text[:1500]


def test_cms_single_shuffle_with_partial_agg(spark):
    """CMS construction: explode the depth probes map-side, ONE count
    exchange with partial aggregation before it."""
    from aqueducts_spark.operators.sketch import cms_sketch

    info = inspect_plan(spark.table("lineitem").transform(
        lambda df: cms_sketch(df, [], "l_suppkey", width=1024, depth=3)
    ))
    assert info.exchanges == 1, f"{info.exchanges} exchanges\n{info.text[:1500]}"
    assert info.text.count("HashAggregate") >= 2  # partial + final
    assert info.python_evals == 0


def test_dedup_against_broadcasts_corpus(spark):
    """broadcast_corpus=True must plan a broadcast anti-join — the huge
    new-crawl side is never shuffled."""
    from aqueducts_spark.operators.dedup import dedup_against

    docs = spark.table("documents")
    out = dedup_against(
        docs, docs.where("doc_id % 2 = 0"), ["text"], broadcast_corpus=True
    )
    info = inspect_plan(out)
    assert info.broadcast_joins >= 1, info.text[:1500]
    assert info.sort_merge_joins == 0
    assert info.python_evals == 0


def test_no_hard_antipatterns_in_any_gate_plan(spark):
    """Sweep EVERY gate query's physical plan for the two hard scale
    anti-patterns — CartesianProduct and row-at-a-time Python UDFs
    (BatchEvalPython). The documented quadratic verification twins
    (op_embed_neardup, op_jaccard_pairs) plan as bucketed/broadcast
    joins, not cartesians, so no exemptions are needed: any hit is a
    regression.
    """
    import re

    bad: dict[str, list[str]] = {}
    for name, fn in sorted(entrymod.queries().items()):
        text = inspect_plan(fn(spark, SF)).text
        hard = []
        if re.search(r"\(\d+\) CartesianProduct", text):
            hard.append("CartesianProduct")
        if re.search(r"\(\d+\) BatchEvalPython", text):
            hard.append("BatchEvalPython")
        if hard:
            bad[name] = hard
    assert not bad, f"hard anti-patterns in gate plans: {bad}"


def test_lint_flags_cartesian_and_python_udf(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType
    from aqueducts_spark.plans import lint_plan

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    # small sides broadcast into a BNLJ; with broadcast disabled the
    # same query degrades to CartesianProduct — lint flags both
    warnings = lint_plan(a.crossJoin(b))
    assert any("BroadcastNestedLoopJoin" in w or "CartesianProduct" in w for w in warnings)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        warnings = lint_plan(a.crossJoin(b))
        assert any("CartesianProduct" in w for w in warnings)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    slow = F.udf(lambda x: x + 1, LongType())
    warnings = lint_plan(spark.range(10).select(slow("id")))
    assert any("BatchEvalPython" in w for w in warnings)


def test_lint_clean_plan_and_topk_exempt(spark, sf_dir):
    from aqueducts_spark.plans import lint_plan

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    clean = orders.groupBy("o_orderstatus").count()
    assert lint_plan(clean) == []
    # ORDER BY + LIMIT plans as TakeOrderedAndProject — not a global sort
    topk = orders.orderBy("o_totalprice").limit(5)
    assert not any("global sort" in w for w in lint_plan(topk))
    # an unbounded global sort IS flagged
    full_sort = orders.orderBy("o_totalprice")
    assert any("global sort" in w for w in lint_plan(full_sort))


def test_lint_reported_through_stage_explain(spark, sf_dir):
    from aqueducts_spark import CollectingTracker, load_pipeline_str, run_pipeline

    yml = f"""
version: "v2"
sources:
  - type: file
    name: lint_orders
    format: {{type: parquet}}
    location: {sf_dir}/orders.parquet
  - type: file
    name: lint_customer
    format: {{type: parquet}}
    location: {sf_dir}/customer.parquet
stages:
  - - name: lint_cross
      explain: true
      query: SELECT o.o_orderkey, c.c_custkey FROM lint_orders o CROSS JOIN lint_customer c LIMIT 5
"""
    tracker = CollectingTracker()
    run_pipeline(spark, load_pipeline_str(yml), tracker)
    lints = [o for o in tracker.outputs if o[1] == "plan_lint"]
    assert lints and (
        "CartesianProduct" in lints[0][2] or "BroadcastNestedLoopJoin" in lints[0][2]
    )


def test_python_evals_counts_grouped_agg_pandas(spark):
    """UDAF/grouped-map pandas nodes are Python boundaries and must be
    visible to the plan gates (ArrowAggregatePython et al. were missed,
    so a UDAF-bearing plan reported python_evals == 0)."""
    from aqueducts_spark.functions.udafs import register_udafs
    from aqueducts_spark.plans import inspect_plan

    register_udafs(spark)
    df = spark.createDataFrame([("a", 2.0), ("a", 8.0)], "g string, v double")
    df.createOrReplaceTempView("pe_t")
    agg = spark.sql("SELECT g, geometric_mean(v) AS gm FROM pe_t GROUP BY g")
    assert inspect_plan(agg).python_evals >= 1
    spark.catalog.dropTempView("pe_t")


def test_coalesce_lint_fires_on_wide_schemas(spark):
    """The single-task-funnel warning must fire even when the node's
    Input [...] line exceeds any fixed char window."""
    from aqueducts_spark.plans import lint_plan

    wide = spark.range(10).selectExpr(
        *[f"id AS very_long_column_name_number_{i:02d}" for i in range(30)]
    )
    warnings = lint_plan(wide.coalesce(1))
    assert any("single-task funnel" in w for w in warnings), warnings


def test_scan_columns_ignores_nested_fields():
    from aqueducts_spark.plans.inspect import PlanInfo

    pi = PlanInfo(
        text="",
        read_schemas=["struct<a:bigint,meta:struct<ts:bigint,u:string>,id:bigint>"],
    )
    assert pi.scan_columns() == [{"a", "meta", "id"}]


def test_harmonic_mean_mixed_sign_is_null(spark):
    from aqueducts_spark.functions.udafs import register_udafs

    register_udafs(spark)
    df = spark.createDataFrame(
        [("a", 2.0), ("a", -2.0), ("b", 4.0)], "g string, v double"
    )
    df.createOrReplaceTempView("hm_t")
    rows = {
        r.g: r.hm
        for r in spark.sql(
            "SELECT g, harmonic_mean(v) AS hm FROM hm_t GROUP BY g"
        ).collect()
    }
    assert rows["a"] is None  # reciprocals cancel: NULL, not Infinity
    assert abs(rows["b"] - 4.0) < 1e-9
    spark.catalog.dropTempView("hm_t")

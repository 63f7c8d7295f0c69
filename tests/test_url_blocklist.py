"""Domain/keyword URL blocklist filter (operators/web.py::url_blocklist)."""

import pytest

from aqueducts_spark.operators.web import url_blocklist

URLS = [
    (1, "https://www.ads.example.com/banner"),       # host + domain match paths
    (2, "https://example.com/index"),                # registered-domain match
    (3, "http://sub.deep.example.com/page"),         # subdomain -> domain match
    (4, "https://clean.org/article"),                # no match
    (5, "https://casino.clean.org/spin"),            # exact-host entry
    (6, "https://clean.org/photos/casino/night"),    # keyword in path
    (7, None),                                       # NULL url
]

BLOCKED = ["example.com", "casino.clean.org"]


def _bl(spark):
    return spark.createDataFrame([(d,) for d in BLOCKED], "domain string")


def _run(spark, keywords=("/casino/",)):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    return {
        r.doc_id: r
        for r in url_blocklist(
            df, blocked=_bl(spark), keywords=list(keywords)
        ).collect()
    }


def test_domain_and_host_matching(spark):
    rows = _run(spark)
    assert rows[1].blocked_domain      # ads.example.com -> example.com
    assert rows[2].blocked_domain      # exact registered domain
    assert rows[3].blocked_domain      # deep subdomain reduces to example.com
    assert not rows[4].blocked_domain
    assert rows[5].blocked_domain      # exact-host blocklist entry
    assert not rows[6].blocked_domain


def test_keyword_matching_and_url_ok(spark):
    rows = _run(spark)
    assert rows[6].blocked_keyword and not rows[6].url_ok
    assert not rows[4].blocked_keyword and rows[4].url_ok
    for i in (1, 2, 3, 5):
        assert not rows[i].url_ok


def test_null_url_passes(spark):
    rows = _run(spark)
    r = rows[7]
    assert r.host is None and r.domain is None
    assert not r.blocked_domain and not r.blocked_keyword and r.url_ok


def test_host_and_domain_columns_emitted(spark):
    rows = _run(spark)
    assert rows[1].host == "ads.example.com"  # canonical: www. stripped
    assert rows[1].domain == "example.com"
    assert rows[5].host == "casino.clean.org"
    assert rows[5].domain == "clean.org"


def test_no_blocklist_no_keywords_all_ok(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    rows = url_blocklist(df).collect()
    assert all(r.url_ok and not r.blocked_domain for r in rows)


def test_intermediate_suffix_not_matched_documented_tradeoff(spark):
    # the documented limit: an entry deeper than the registered domain
    # matches only exactly, not as a suffix of deeper hosts
    df = spark.createDataFrame(
        [(1, "https://x.a.b.example.com/p")], "doc_id long, url string"
    )
    bl = spark.createDataFrame([("a.b.example.com",)], "domain string")
    assert not url_blocklist(df, blocked=bl).collect()[0].blocked_domain


def test_blocklist_case_folded(spark):
    df = spark.createDataFrame(
        [(1, "https://BAD.SITE.com/x")], "doc_id long, url string"
    )
    bl = spark.createDataFrame([("Bad.Site.COM",)], "domain string")
    assert url_blocklist(df, blocked=bl).collect()[0].blocked_domain


def test_plan_broadcast_only_no_shuffle(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    plan = (
        url_blocklist(df, blocked=_bl(spark), keywords=["x"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    # the corpus side never shuffles: no shuffle-requiring join; the
    # only hash exchanges are blocklist-sized (the dedup under the
    # BroadcastExchanges)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= plan.count(
        "BroadcastExchange"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_blocklist_dedup_computed_once(spark):
    # the two probes (host + registered domain) share ONE blocklist
    # scan + distinct — r9: MATERIALIZED, because exchange reuse only
    # fires under collect()-style actions and the write path (sinks,
    # bench) deduped a UT1-scale blocklist twice.  The write-path plan
    # must show no Aggregate feeding either broadcast build (the one
    # distinct ran eagerly in the materialization).
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    out = url_blocklist(df, blocked=_bl(spark))
    out.write.mode("overwrite").format("noop").save()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert plan.count("Scan ExistingRDD") >= 2, plan  # both builds read blocks
    assert "HashAggregate" not in plan, plan


def test_output_columns_never_clobber_user_data(spark):
    df = spark.createDataFrame(
        [(1, "https://example.com/x", "psl-exact.example.com")],
        "doc_id long, url string, domain string",
    )
    with pytest.raises(ValueError, match="already exist"):
        url_blocklist(df, blocked=_bl(spark))
    out = url_blocklist(df, blocked=_bl(spark), domain_out="rdomain")
    row = out.collect()[0]
    assert row["domain"] == "psl-exact.example.com"  # untouched
    assert row["rdomain"] == "example.com"
    with pytest.raises(ValueError, match="must differ"):
        url_blocklist(df.drop("domain"), host_out="h", domain_out="h")


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(URLS, "doc_id long, url string").createOrReplaceTempView(
        "bl_docs"
    )
    _bl(spark).createOrReplaceTempView("bl_domains")
    out = run_operator(
        spark,
        {
            "type": "url_blocklist",
            "input": "bl_docs",
            "options": {"blocked": "bl_domains", "keywords": ["/casino/"]},
        },
    )
    got = {r.doc_id: r.url_ok for r in out.collect()}
    assert got == {1: False, 2: False, 3: False, 4: True, 5: False,
                   6: False, 7: True}


def test_helper_names_do_not_collide_with_user_columns(spark):
    df = spark.createDataFrame(
        [(1, "https://example.com/x", "keepme")],
        "doc_id long, url string, __host string",
    )
    out = url_blocklist(df, blocked=_bl(spark))
    row = out.collect()[0]
    assert row["__host"] == "keepme"
    assert row.blocked_domain


def test_empty_keyword_rejected(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    with pytest.raises(ValueError, match="empty keyword"):
        url_blocklist(df, keywords=[""])

"""Web-crawl URL operators: canonicalization, host/domain extraction,
URL-level dedup, per-domain caps.

Every web-scale curation pipeline (C4, CCNet, RefinedWeb, FineWeb)
starts by canonicalizing and deduplicating URLs before touching
document text — the same page is crawled under scheme/case/port
variants, with volatile tracking parameters (``utm_*``, ``gclid``,
``fbclid``) and reordered query strings. Beyond the reference's
operator set (no counterpart in the reference repo): this is part of
the training-data surface this engine adds (SURVEY §6).

Scale shape: :func:`canonical_url` and :func:`url_parts` are pure
Catalyst expressions (split / lower / regexp_replace / higher-order
array ops) — zero shuffles, whole-stage codegen, no Python.
:func:`url_dedup` pays the ONE hash shuffle of
:func:`~.dedup.exact_dedup` keyed on the canonical form;
:func:`domain_cap` pays the one shuffle of
:func:`~.sampling.group_cap` keyed on the registered domain (classic
power-law key ⇒ AQE skew split applies; profile with
``key_skew_profile`` and salt if one domain dominates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAMS",
    "canonical_url",
    "registered_domain",
    "registered_domain_psl",
    "url_parts",
    "url_dedup",
    "domain_cap",
    "url_blocklist",
]

# Exact-match tracking parameter names (checked on the lowercased key);
# any key starting with ``utm_`` is also dropped.
TRACKING_PARAMS = (
    "fbclid", "gclid", "dclid", "msclkid", "mc_cid", "mc_eid",
    "igshid", "ref", "ref_src", "spm", "_ga",
)

# Country-code second-level registries where the registered domain is
# three labels (example.co.uk), not two. A deliberate, documented
# heuristic — the full public-suffix list is data, not code; load it
# and use :func:`registered_domain_psl` if exactness matters for your
# TLD mix.
_SECOND_LEVEL = ("co", "com", "net", "org", "gov", "ac", "edu")


def _split1(col: Column, sep: str, index: int) -> Column:
    """element ``index`` (0-based) of a limit-2 split, '' if absent.
    try_element_at: under ANSI mode (Spark 4 default) plain element_at
    raises on a missing second element instead of returning NULL."""
    parts = F.split(col, sep, 2)
    return F.coalesce(F.try_element_at(parts, F.lit(index + 1)), F.lit(""))


def _hostport(rest: Column) -> Column:
    """host[:port] prefix of the post-scheme text: everything before the
    first ``/`` OR ``?`` — a URL can carry a query with no path
    (``example.com?a=1``), and splitting on ``/`` alone would absorb
    that query into the host."""
    return F.regexp_extract(rest, r"^[^/?]*", 0)


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL as one codegen expression tree:

    * fragment dropped;
    * scheme + host lowercased, leading ``www.`` stripped;
    * default ports removed (``:80`` for http, ``:443`` for https);
    * trailing slashes stripped from the path;
    * query parameters with tracking keys (``utm_*`` +
      :data:`TRACKING_PARAMS`) dropped, the rest sorted and rejoined;
    * URLs without a scheme keep their text but get the same
      host/path/query normalization under an assumed ``http``.

    NULL in ⇒ NULL out.
    """
    no_frag = _split1(url, "#", 0)
    has_scheme = F.instr(no_frag, "://") > 0
    scheme = F.when(has_scheme, F.lower(_split1(no_frag, "://", 0))).otherwise(
        F.lit("http")
    )
    rest = F.when(has_scheme, _split1(no_frag, "://", 1)).otherwise(no_frag)

    raw_hostport = _hostport(rest)
    pathq = F.substring(rest, F.length(raw_hostport) + 1, F.lit(2147483647))
    # strip RFC-3986 userinfo (up to the LAST '@' in the authority):
    # 'http://anything@evil.com/' must canonicalize to host evil.com —
    # without this, blocklists keyed on host/domain are trivially
    # bypassed and 'u:p@host' URLs split host='u' at the ':'
    hostport = F.regexp_replace(raw_hostport, r"^.*@", "")

    host = F.regexp_replace(F.lower(_split1(hostport, ":", 0)), r"^www\.", "")
    port = _split1(hostport, ":", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    path = F.regexp_replace(_split1(pathq, r"\?", 0), "/+$", "")
    query = _split1(pathq, r"\?", 1)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(_split1(p, "=", 0)).startswith("utm_")
        & ~F.lower(_split1(p, "=", 0)).isin(*TRACKING_PARAMS),
    )
    canon_query = F.array_join(F.array_sort(params), "&")
    query_part = F.when(
        canon_query != "", F.concat(F.lit("?"), canon_query)
    ).otherwise(F.lit(""))

    return F.when(
        url.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    )


def registered_domain(host: Column) -> Column:
    """Heuristic registered domain of a lowercased host: the last two
    labels, or three when the second-to-last label is a known
    country-code second-level registry under a 2-letter ccTLD
    (``example.co.uk``). See :data:`_SECOND_LEVEL` for the limits."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: ANSI mode errors on out-of-range negative indexes
    # (single-label hosts) even inside an unchosen CASE branch
    second = F.coalesce(F.try_element_at(labels, F.lit(-2)), F.lit(""))
    tld = F.coalesce(F.try_element_at(labels, F.lit(-1)), F.lit(""))
    take3 = (
        (n >= 3)
        & (F.length(tld) == 2)
        & second.isin(*_SECOND_LEVEL)
    )
    tail = F.when(take3, F.slice(labels, n - 2, 3)).otherwise(
        F.when(n >= 2, F.slice(labels, n - 1, 2)).otherwise(labels)
    )
    return F.array_join(tail, ".")


def registered_domain_psl(
    df: DataFrame,
    psl: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    max_labels: int = 5,
) -> DataFrame:
    """Exact registered domain from a public-suffix-list table — the
    precision upgrade over the :func:`registered_domain` heuristic.

    ``psl``'s first column holds rules in publicsuffix.org format
    (lowercase, one per row): plain suffixes (``co.uk``), wildcards
    (``*.kobe.jp``), exceptions (``!city.kobe.jp``).  The full
    algorithm: the prevailing rule is the matching exception if any,
    else the longest match, else the implicit ``*`` default; the
    registered domain is the public suffix plus one label, or NULL when
    the host IS a public suffix.

    Scale shape: the PSL (~10k rows) is grouped by label count and
    broadcast — ``max_labels`` map-side hash joins on the host's
    k-label suffixes, zero shuffles, no Python.  Real-PSL rules top out
    at 5 labels (the default).
    """
    from .sampling import _fresh_name

    rule_col = psl.columns[0]
    rule = F.lower(F.trim(F.col(rule_col)))
    base = (
        F.when(rule.startswith("!"), F.substring(rule, 2, 2147483647))
        .when(rule.startswith("*."), F.substring(rule, 3, 2147483647))
        .otherwise(rule)
    )
    parsed = psl.select(
        base.alias("__base"),
        rule.startswith("!").alias("__e"),
        rule.startswith("*.").alias("__w"),
    ).withColumn("__k", F.size(F.split(F.col("__base"), r"\.")))

    labels = F.split(F.lower(F.col(host_col)), r"\.")
    n = F.size(labels)
    out = df
    helper: list[str] = []
    hit_cols: dict[int, tuple[str, str, str]] = {}
    for k in range(1, max_labels + 1):
        taken = list(out.columns) + helper
        sfx = _fresh_name(f"__sfx{k}", taken)
        exc = _fresh_name(f"__exc{k}", taken)
        wild = _fresh_name(f"__wild{k}", taken)
        plain = _fresh_name(f"__plain{k}", taken)
        pk = (
            parsed.where(F.col("__k") == k)
            .groupBy("__base")
            .agg(
                F.max("__e").alias(exc),
                F.max("__w").alias(wild),
                F.max(~F.col("__e") & ~F.col("__w")).alias(plain),
            )
            .withColumnRenamed("__base", sfx)
        )
        out = out.withColumn(
            sfx,
            F.when(n >= k, F.array_join(F.slice(labels, n - k + 1, k), ".")),
        ).join(F.broadcast(pk), on=sfx, how="left")
        hit_cols[k] = (exc, wild, plain)
        helper += [sfx, exc, wild, plain]

    # exception prevails (public suffix = the exception minus its
    # leftmost label); else the longest match (a wildcard base of k
    # labels makes a k+1-label suffix); else the implicit '*' default
    # rule (1 label)
    exc_len = F.coalesce(
        *[
            F.when(F.col(hit_cols[k][0]), F.lit(k - 1))
            for k in range(max_labels, 0, -1)
        ],
        F.lit(None).cast("int"),
    )
    match_lens = [F.lit(1)]
    for k in range(1, max_labels + 1):
        # a wildcard matches exactly ONE label: '*.sch.uk' does not
        # match the host 'sch.uk' itself (real-PSL wildcards often have
        # no plain base rule), so require a label in the '*' position
        match_lens.append(
            F.when(F.col(hit_cols[k][1]) & (n > k), F.lit(k + 1))
        )
        match_lens.append(F.when(F.col(hit_cols[k][2]), F.lit(k)))
    suffix_len = F.coalesce(exc_len, F.greatest(*match_lens))
    domain = F.when(
        n > suffix_len,
        F.array_join(F.slice(labels, n - suffix_len, suffix_len + 1), "."),
    )
    return out.withColumn(out_col, domain).drop(*helper)


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``canonical_url, scheme, host, domain, path, query`` —
    zero-shuffle projection for downstream grouping/filtering.

    NULL urls yield NULL parts (not empty strings — the
    :func:`url_blocklist` convention: a fake ``''`` domain would lump
    every no-URL document into one group downstream).  Output names
    must not already exist on the input — raises, like url_blocklist.
    """
    out_names = ("canonical_url", "scheme", "host", "domain", "path", "query")
    clashes = [c for c in out_names if c in df.columns]
    if clashes:
        raise ValueError(
            f"url_parts: output column(s) {clashes} already exist on "
            "the input — rename them first"
        )
    url = F.col(url_col)
    canon = canonical_url(url)
    rest = _split1(canon, "://", 1)
    hostport = _hostport(rest)
    host = _split1(hostport, ":", 0)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(2147483647))

    def _n(col):  # NULL url -> NULL part, never ''
        return F.when(canon.isNull(), F.lit(None).cast("string")).otherwise(col)

    return df.select(
        "*",
        canon.alias("canonical_url"),
        _n(_split1(canon, "://", 0)).alias("scheme"),
        _n(host).alias("host"),
        _n(registered_domain(host)).alias("domain"),
        _n(_split1(pathq, r"\?", 0)).alias("path"),
        _n(_split1(pathq, r"\?", 1)).alias("query"),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (min ``id_col``) per canonical URL — the
    crawl-frontier dedup step. One hash shuffle keyed on the canonical
    string (uniform after canonicalization; md5 not needed because the
    key is already a single short column).

    Same plan shape as :func:`~.dedup.exact_dedup` but with different
    NULL semantics, deliberately: a NULL url means "no URL", so NULL
    rows all pass through unchanged — exact_dedup's NULL-sentinel
    payload key would collapse every NULL-url document into one.

    NULL urls ride a PER-ROW-UNIQUE sentinel window key
    (``'\\x00' + id``) instead of an OR'd ``IS NULL`` escape in the
    filter, for two scale reasons verified in the physical plan:

    * a bare ``rn == 1`` predicate is what lets Spark plan the
      map-side ``WindowGroupLimit`` (≤1 row per key leaves each map
      task); an OR'd NULL branch defeats the pushdown and ships every
      duplicate full-width through the shuffle;
    * NULL keys all hash to ONE window partition — a single task would
      process the entire no-URL slice of a crawl (easily 1-10%).
      Unique sentinels spread those rows uniformly.

    ``id_col`` is assumed unique (it is the dedup tiebreak id); for
    NULL ids the sentinel falls back to a content hash over the
    hashable columns (MAP/VARIANT columns are excluded — Spark's hash
    functions reject them), so byte-identical id-less NULL-url rows
    collapse — deterministic under task retry, which a uuid/monotonic
    id would not be."""
    from pyspark.sql.window import Window

    from .dedup import hashable_columns
    from .sampling import _fresh_name

    canon = canonical_url(F.col(url_col))
    hash_cols = hashable_columns(df)
    content = (
        F.xxhash64(*[F.col(c) for c in hash_cols]) if hash_cols else F.lit(0)
    )
    # '\x00' cannot prefix a canonical URL (schemes are alphabetic)
    null_sentinel = F.concat(
        F.lit("\x00"),
        F.coalesce(F.col(id_col).cast("string"), content.cast("string")),
    )
    key_col = _fresh_name("__canon", df.columns)
    rn_col = _fresh_name("__rn", df.columns)
    w = Window.partitionBy(F.col(key_col)).orderBy(
        F.col(id_col).asc_nulls_last()
    )
    return (
        df.withColumn(key_col, F.coalesce(canon, null_sentinel))
        .withColumn(rn_col, F.row_number().over(w))
        .where(F.col(rn_col) == 1)
        .drop(rn_col, key_col)
    )


def domain_cap(
    df: DataFrame,
    n: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Keep at most ``n`` documents per registered domain, chosen by
    deterministic hash rank of ``id_col`` (unbiased within domain) —
    the anti-SEO-farm volume cap of web curation pipelines. One
    shuffle; Spark 4 plans a map-side WindowGroupLimit so only ~n rows
    per domain per task travel."""
    from .sampling import group_cap

    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    v = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00"))
    # md5 hex string ranks are DuckDB-reproducible (same digest, same
    # lexicographic order); xxhash64 is the in-Spark codegen fast path
    rank = F.md5(v) if hash_fn == "md5" else F.xxhash64(v)
    url = F.col(url_col)
    rest = _split1(canonical_url(url), "://", 1)
    host = _split1(_hostport(rest), ":", 0)
    dom = registered_domain(host)
    # rows WITHOUT a domain (NULL url / unparseable host) are not a
    # domain and must not be capped: they ride a PER-ROW-UNIQUE
    # sentinel group (the url_dedup trick) so each is its own window
    # partition — every no-domain row survives AND the no-URL slice of
    # a crawl (1-10%) never piles onto one window task.  (Capping them
    # as one '' pseudo-domain silently discarded all but n of them.)
    dom_key = F.when(
        dom.isNull() | (dom == ""),
        F.concat(F.lit("\x00nodomain\x00"), v),
    ).otherwise(dom)
    with_domain = df.withColumn("__domain", dom_key).withColumn(
        "__rank", rank
    )
    capped = group_cap(
        with_domain,
        group_cols=["__domain"],
        order_col="__rank",
        n=n,
        descending=False,
        tiebreak_col=id_col,
    )
    return capped.drop("__domain", "__rank")


def url_blocklist(
    df: DataFrame,
    blocked: DataFrame | None = None,
    keywords: tuple[str, ...] | list[str] = (),
    url_col: str = "url",
    domain_col: str = "domain",
    host_out: str = "host",
    domain_out: str = "domain",
) -> DataFrame:
    """Mark each row against a domain blocklist and a URL-substring
    keyword list — the adult/spam/fraud domain filter every web
    curation pipeline applies up front (C4 §2.2's "bad words" page
    drop has a URL-level sibling; RefinedWeb and FineWeb both filter
    against the public UT1 blocklist categories by domain).

    ``blocked`` is a DataFrame with one lowercased domain per row in
    ``domain_col`` — blocklists are DATA (millions of rows for UT1),
    not code, so they arrive as a table, not a Python list.  A row is
    ``blocked_domain`` when its canonical host OR its registered
    domain equals a blocklist entry.  Those are the two match points:
    an entry ``example.com`` blocks every subdomain (hosts reduce to
    their registered domain), an entry ``ads.example.com`` blocks that
    exact host.  Intermediate-suffix entries deeper than the
    registered domain (``a.b.example.com`` matching host
    ``x.a.b.example.com``) are NOT matched — real blocklists publish
    registered domains or exact hosts; the documented trade buys the
    zero-shuffle plan below.

    ``keywords`` is a bounded list of lowercase substrings matched
    against the canonical URL (``blocked_keyword`` — the UT1-style
    path/keyword filter, e.g. ``"/casino/"``).  ``url_ok`` is the
    conjunction of neither firing; NULL urls have NULL host/domain,
    match nothing, and come out ``url_ok``.

    Output columns: ``host_out`` / ``domain_out`` (rename them when
    composing after an operator that already emitted ``host`` or
    ``domain`` — e.g. :func:`registered_domain_psl`'s exact PSL
    ``domain``, which this operator's heuristic must not silently
    overwrite) plus ``blocked_domain``, ``blocked_keyword``,
    ``url_ok``.  Any output name already present on ``df`` raises
    rather than clobbering user data.

    Scale shape (100 TB): host + registered domain are codegen
    expressions; the blocklist probe is TWO broadcast LEFT joins on a
    single string key each — no explode, no re-aggregation, ZERO
    shuffles of the corpus (plan-asserted in tests).  The blocklist is
    scanned, lowercased, and dedup-aggregated ONCE — the second join's
    build is a pure rename of the first's, so its distinct shuffle
    plans as a ReusedExchange (plan-asserted; only the broadcast of
    the already-deduped rows repeats), which matters when the build is
    a UT1-scale table.  A blocklist too large to broadcast (>~8 GB) would switch
    to a shuffle semi-join by dropping the hint — at UT1's ~4M rows
    the broadcast is ~tens of MB, the right call.
    """
    from .sampling import _fresh_name

    for k in keywords:
        if not k:
            raise ValueError(
                "url_blocklist: empty keyword matches every URL — remove "
                "it or pass a real substring"
            )
    out_names = [
        host_out, domain_out, "blocked_domain", "blocked_keyword", "url_ok"
    ]
    if host_out == domain_out:
        raise ValueError(
            f"url_blocklist: host_out and domain_out are both "
            f"{host_out!r} — they must differ"
        )
    clashes = [c for c in out_names if c in df.columns]
    if clashes:
        raise ValueError(
            f"url_blocklist: output column(s) {clashes} already exist on "
            "the input — rename them upstream or pass host_out/domain_out "
            "(silently overwriting them would corrupt user data, e.g. a "
            "registered_domain_psl 'domain')"
        )
    url = F.col(url_col)
    # canonicalization is a large expression tree — stage it ONCE in a
    # named column so the host derivation and the keyword match reuse
    # one evaluation instead of inlining the tree twice per row
    canon_col = _fresh_name("__canon", df.columns)
    host_col = _fresh_name("__host", df.columns)
    dom_col = _fresh_name("__rdomain", df.columns)
    with_host = (
        df.withColumn(canon_col, canonical_url(url))
        .withColumn(
            host_col,
            F.when(
                url.isNotNull(),
                _split1(
                    _hostport(_split1(F.col(canon_col), "://", 1)), ":", 0
                ),
            ),
        )
        .withColumn(
            dom_col,
            F.when(url.isNotNull(), registered_domain(F.col(host_col))),
        )
    )
    out = with_host
    if blocked is not None:
        hostm = _fresh_name("__host_hit", df.columns)
        domm = _fresh_name("__dom_hit", df.columns)
        hkey = _fresh_name("__bl_host_key", df.columns)
        dkey = _fresh_name("__bl_dom_key", df.columns)
        # ONE blocklist scan + distinct, probed by both joins —
        # MATERIALIZED (r9): the second join's build is a pure rename
        # of the first's and the broadcast exchanges canonicalize
        # equal, but that reuse only fires under collect()-style
        # actions; on the write path the UT1-scale distinct would run
        # twice.  Blocklist-sized blocks, trivially cheap.
        from .materialize import materialize

        bl = materialize(
            blocked.select(F.lower(F.col(domain_col)).alias(hkey))
            .distinct()
            .withColumn(hostm, F.lit(True))
        )
        bl_dom = bl.select(
            F.col(hkey).alias(dkey), F.col(hostm).alias(domm)
        )
        out = (
            out.join(
                F.broadcast(bl), F.col(host_col) == F.col(hkey), "left"
            )
            .drop(hkey)
            .join(
                F.broadcast(bl_dom), F.col(dom_col) == F.col(dkey), "left"
            )
            .drop(dkey)
            .withColumn(
                "blocked_domain",
                F.coalesce(F.col(hostm), F.col(domm), F.lit(False)),
            )
            .drop(hostm, domm)
        )
    else:
        out = out.withColumn("blocked_domain", F.lit(False))
    low_url = F.lower(F.col(canon_col))
    if keywords:
        kw = F.array(*[F.lit(k.lower()) for k in keywords])
        out = out.withColumn(
            "blocked_keyword",
            F.coalesce(
                F.exists(kw, lambda k: low_url.contains(k)), F.lit(False)
            ),
        )
    else:
        out = out.withColumn("blocked_keyword", F.lit(False))
    return (
        out.withColumn(host_out, F.col(host_col))
        .withColumn(domain_out, F.col(dom_col))
        .drop(canon_col, host_col, dom_col)
        .withColumn(
            "url_ok", ~F.col("blocked_domain") & ~F.col("blocked_keyword")
        )
    )

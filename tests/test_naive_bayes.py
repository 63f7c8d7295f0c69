"""nb_fit / nb_classify (operators/selection.py): on-cluster naive-Bayes
seed classifier — one-aggregation training, micro-nat-exact scoring."""

import math

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.selection import nb_classify, nb_fit

SEED = [
    (1, "en", "the cat sat on the mat and the dog barked"),
    (2, "en", "a quick brown fox jumps over the lazy dog"),
    (3, "en", "english text with the usual english words here"),
    (4, "fr", "le chat est sur le tapis et le chien aboie"),
    (5, "fr", "un renard brun saute par dessus le chien"),
]
NEW = [
    (10, "the dog and the cat are on the mat"),
    (11, "le chien et le chat sont sur le tapis"),
    (12, ""),
]
SEED_SCHEMA = "doc_id long, label string, text string"
NEW_SCHEMA = "doc_id long, text string"
B = 512


@pytest.fixture(scope="module")
def model(spark):
    return nb_fit(
        spark.createDataFrame(SEED, SEED_SCHEMA), buckets=B
    )


def test_model_shape(spark, model):
    rows = model.collect()
    priors = {r.label: r.c for r in rows if r.bucket == -1}
    assert priors == {"en": 3, "fr": 2}
    assert all(r.bucket >= -2 for r in rows)
    # self-contained: the metadata row carries the build bucket count
    meta = [r for r in rows if r.bucket == -2]
    assert len(meta) == 1 and meta[0].c == B and meta[0].label is None
    # token totals = gram counts of each class's docs
    en_total = sum(r.c for r in rows if r.label == "en" and r.bucket >= 0)
    assert en_total > 0


def test_buckets_read_from_model_and_mismatch_rejected(spark, model):
    new = spark.createDataFrame(NEW, NEW_SCHEMA)
    # default: read from the metadata row — same result as explicit B
    a = sorted(map(tuple, nb_classify(new, model).collect()))
    b = sorted(map(tuple, nb_classify(new, model, buckets=B).collect()))
    assert a == b
    # a contradicting explicit value would misalign every hash cell
    with pytest.raises(ValueError, match="contradicts"):
        nb_classify(new, model, buckets=B * 2)
    # a metadata-less (externally built) model needs explicit buckets
    bare = model.where("bucket >= -1")
    with pytest.raises(ValueError, match="no bucket-count metadata"):
        nb_classify(new, bare)
    got = nb_classify(new, bare, buckets=B).collect()
    assert sorted(map(tuple, got)) == a


def test_classify_separates_languages(spark, model):
    got = {
        r.doc_id: r.label
        for r in nb_classify(
            spark.createDataFrame(NEW, NEW_SCHEMA), model, buckets=B
        ).collect()
    }
    assert got[10] == "en" and got[11] == "fr"
    assert got[12] in ("en", "fr")  # empty doc: priors + '' gram decide


def test_matches_python_reference(spark, model):
    """Exact micro-nat replay: grams (unigrams + bigrams, '' sentinel
    for empty docs), hashed buckets, Laplace lambdas quantized BEFORE
    the sum — bit-identical scores."""
    import hashlib

    def grams(text):
        toks = [t for t in (text or "").lower().strip().split() if t]
        gs = list(toks)
        if len(toks) == 0:
            gs.append("")
        elif len(toks) == 1:
            gs.append(toks[0])
        else:
            gs += [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B for g in gs
        ]

    counts: dict = {}
    priors: dict = {}
    for _, lab, text in SEED:
        priors[lab] = priors.get(lab, 0) + 1
        for b in grams(text):
            counts[(lab, b)] = counts.get((lab, b), 0) + 1
    tot = {
        lab: sum(c for (l, _), c in counts.items() if l == lab)
        for lab in priors
    }
    nd = sum(priors.values())

    def lam(lab, b):
        return math.floor(
            math.log((counts.get((lab, b), 0) + 1.0) / (tot[lab] + 1.0 * B))
            * 1e6
            + 0.5
        )

    def score(text, lab):
        p = math.floor(math.log(priors[lab] / nd) * 1e6 + 0.5)
        return p + sum(lam(lab, b) for b in grams(text))

    expect = {}
    for i, text in NEW:
        best = sorted(
            priors, key=lambda lab: (-score(text, lab), lab)
        )[0]
        expect[i] = (best, score(text, best))
    got = {
        r.doc_id: (r.label, r.score_micro)
        for r in nb_classify(
            spark.createDataFrame(NEW, NEW_SCHEMA), model, buckets=B
        ).collect()
    }
    assert got == expect


def test_all_scores_long_form(spark, model):
    rows = nb_classify(
        spark.createDataFrame(NEW, NEW_SCHEMA),
        model,
        buckets=B,
        all_scores=True,
    ).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, set()).add(r.label)
    assert all(v == {"en", "fr"} for v in per_doc.values())


def test_validation_and_guards(spark, model):
    new = spark.createDataFrame(NEW, NEW_SCHEMA)
    with pytest.raises(ValueError, match="smoothing"):
        nb_classify(new, model, smoothing=0.0)
    with pytest.raises(ValueError, match="max_grid"):
        nb_classify(new, model, buckets=B, max_grid=10)
    with pytest.raises(ValueError, match="missing column"):
        nb_classify(new, model.drop("c"))
    with pytest.raises(ValueError, match="no prior rows"):
        nb_classify(new, model.where("bucket >= 0"), buckets=B)
    bad_seed = spark.createDataFrame(
        [(1, None, "text")], SEED_SCHEMA
    )
    with pytest.raises(Exception) as exc:
        nb_fit(bad_seed).collect()
    assert "NULL label" in str(exc.value)
    bad_new = spark.createDataFrame([(None, "x")], NEW_SCHEMA)
    with pytest.raises(Exception) as exc:
        nb_classify(bad_new, model, buckets=B).collect()
    assert "NULL id" in str(exc.value)


def test_partitioning_independent(spark, model):
    new = spark.createDataFrame(NEW, NEW_SCHEMA)
    a = sorted(
        map(tuple, nb_classify(new, model, buckets=B).collect())
    )
    b = sorted(
        map(tuple, nb_classify(new.repartition(7), model, buckets=B).collect())
    )
    assert a == b


def test_registry_stages(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(SEED, SEED_SCHEMA).createOrReplaceTempView("nb_seed")
    spark.createDataFrame(NEW, NEW_SCHEMA).createOrReplaceTempView("nb_new")
    model = run_operator(
        spark,
        {"type": "nb_fit", "input": "nb_seed", "options": {"buckets": B}},
    )
    model.createOrReplaceTempView("nb_model")
    out = run_operator(
        spark,
        {
            "type": "nb_classify",
            "input": "nb_new",
            "options": {"model": "nb_model", "buckets": B},
        },
    )
    got = {r.doc_id: r.label for r in out.collect()}
    assert got[10] == "en" and got[11] == "fr"
    for v in ("nb_seed", "nb_new", "nb_model"):
        spark.catalog.dropTempView(v)


def test_oversized_model_buckets_raise_lazily(spark, model):
    # strip metadata (a foreign model) and classify with a SMALLER
    # explicit bucket count: out-of-range cells must raise, not be
    # silently dropped from the grid join and totals
    bare = model.where("bucket >= -1")
    new = spark.createDataFrame(NEW, NEW_SCHEMA)
    with pytest.raises(Exception) as exc:
        nb_classify(new, bare, buckets=B // 4).collect()
    assert "fit with more buckets" in str(exc.value)


def test_merge_law(spark):
    """nb_fit(A ⊎ B) == merge(nb_fit(A), nb_fit(B)) EXACTLY (relation
    equality), so per-shard fits roll up without re-reading text."""
    from aqueducts_spark.operators.selection import merge_nb_models

    df = spark.createDataFrame(SEED, SEED_SCHEMA)
    whole = nb_fit(df, buckets=B)
    merged = merge_nb_models(
        [
            nb_fit(df.where("doc_id <= 2"), buckets=B),
            nb_fit(df.where("doc_id > 2"), buckets=B),
        ]
    )
    # the metadata row's NULL label needs a None-safe sort key
    key = lambda t: (t[0] is None, t[0], t[1], t[2])  # noqa: E731
    assert sorted(map(tuple, whole.collect()), key=key) == sorted(
        map(tuple, merged.collect()), key=key
    )
    # and classification through the merged model is identical
    new = spark.createDataFrame(NEW, NEW_SCHEMA)
    a = sorted(map(tuple, nb_classify(new, whole).collect()))
    b = sorted(map(tuple, nb_classify(new, merged).collect()))
    assert a == b


def test_merge_mixed_buckets_rejected_downstream(spark):
    from aqueducts_spark.operators.selection import merge_nb_models

    df = spark.createDataFrame(SEED, SEED_SCHEMA)
    merged = merge_nb_models(
        [nb_fit(df, buckets=B), nb_fit(df, buckets=B * 2)]
    )
    new = spark.createDataFrame(NEW, NEW_SCHEMA)
    with pytest.raises(ValueError, match="conflicting bucket-count"):
        nb_classify(new, merged)


def test_prior_only_label_scores_on_smoothing_alone(spark):
    # hand-built model: label "emptyish" has a prior row but NO
    # bucket>=0 feature rows (possible via hand assembly or a bad
    # merge).  It must stay in the grid scored on smoothing alone,
    # not silently vanish from every argmax.
    from aqueducts_spark.operators.selection import (
        DEFAULT_BUCKET,
        _NB_META_BUCKET,
    )

    rows = (
        # features for "en" only
        [("en", b, 3) for b in range(4)]
        # priors: both classes, "emptyish" heavily favored
        + [("en", DEFAULT_BUCKET, 1), ("emptyish", DEFAULT_BUCKET, 99)]
        # metadata row carrying buckets
        + [(None, _NB_META_BUCKET, B)]
    )
    model = spark.createDataFrame(rows, "label string, bucket long, c long")
    out = nb_classify(
        spark.createDataFrame(NEW, NEW_SCHEMA),
        model,
        all_scores=True,
    )
    labels = {r.label for r in out.collect()}
    assert "emptyish" in labels  # did not vanish from scoring


def test_unpersisted_fit_lineage_executes_once(spark):
    # verdict r6 "what's wrong #2": nb_classify on an unpersisted
    # nb_fit model used to execute the fit lineage twice (metadata
    # action + scoring job).  A row-counting accumulator in the seed
    # lineage proves the model is now cached before the first action.
    acc = spark.sparkContext.accumulator(0)

    def tap(s):
        acc.add(1)
        return s

    tap_udf = F.udf(tap, "string")
    seed = spark.createDataFrame(SEED, SEED_SCHEMA).withColumn(
        "text", tap_udf("text")
    )
    model = nb_fit(seed, buckets=B)
    out = nb_classify(
        spark.createDataFrame(NEW, NEW_SCHEMA), model
    ).collect()
    assert len(out) == len(NEW)
    # the seed rows passed through the fit exactly once, not twice
    assert acc.value == len(SEED)
    model.unpersist()


def test_merge_nb_models_input_validation(spark):
    from aqueducts_spark.operators.selection import merge_nb_models

    with pytest.raises(ValueError, match="non-empty"):
        merge_nb_models([])
    bad = spark.createDataFrame([(1,)], ["label"])
    with pytest.raises(ValueError, match="missing column"):
        merge_nb_models([bad])


def test_rowfan_path_matches_vectorized(spark, monkeypatch):
    """Above _NB_VEC_MAX_CLASSES nb_classify switches from the
    K-column vectorized plan to the row-fan + min(struct) argmax shape
    — same integer arithmetic, so scores, labels AND tie-breaks must be
    bit-identical to the vectorized path."""
    import aqueducts_spark.operators.selection as sel
    from aqueducts_spark.operators.selection import nb_classify, nb_fit

    rows = [
        (i, ["en", "fr", "de", "es"][i % 4], f"word{i % 7} text {i % 3} doc")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    model = nb_fit(df, label_col="lang", buckets=64).localCheckpoint()
    probe = df.select("doc_id", "text")

    vec = sorted(map(tuple, nb_classify(probe, model, buckets=64).collect()))
    vec_all = sorted(
        map(tuple, nb_classify(probe, model, buckets=64, all_scores=True).collect())
    )
    monkeypatch.setattr(sel, "_NB_VEC_MAX_CLASSES", 2)
    row = sorted(map(tuple, nb_classify(probe, model, buckets=64).collect()))
    row_all = sorted(
        map(tuple, nb_classify(probe, model, buckets=64, all_scores=True).collect())
    )
    assert vec == row
    assert vec_all == row_all

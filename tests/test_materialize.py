"""materialize(): localCheckpoint vs reliable checkpoint_dir parity.

The reliable form exists for cluster-scale fault tolerance
(VERDICT r7 #2): localCheckpoint blocks die with their executor and the
truncated lineage cannot recompute them; checkpoint() to a durable dir
survives.  Both forms must return bit-identical rows, and the operators
that thread ``checkpoint_dir`` through (connected_components, the KN
family) must produce identical results on either path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aqueducts_spark.operators.materialize import materialize


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_materialize_paths_bit_identical(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )
    local = materialize(df)
    reliable = materialize(df, str(tmp_path / "ckpt"))
    assert _rows(local) == _rows(reliable)
    # the reliable path wrote real checkpoint data under the dir
    assert any((tmp_path / "ckpt").iterdir())


def test_materialize_truncates_lineage(spark):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    out = materialize(df)
    # a checkpointed frame's logical plan no longer contains the Range
    # source — reading it back is a scan of materialized blocks
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan


def test_connected_components_checkpoint_dir_parity(spark, tmp_path):
    from aqueducts_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
        "id_a bigint, id_b bigint",
    )
    a = _rows(connected_components(edges))
    b = _rows(connected_components(edges, checkpoint_dir=str(tmp_path / "cc")))
    assert a == b
    assert a  # non-empty sanity


def test_kn_checkpoint_dir_parity(spark, sf_dir, tmp_path):
    from aqueducts_spark.operators.text import kn_bigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    a = _rows(kn_bigram_logprob(docs))
    b = _rows(kn_bigram_logprob(docs, checkpoint_dir=str(tmp_path / "kn")))
    c = _rows(kn_bigram_logprob(docs, cache_stats=False))
    assert a == b == c
    assert a


def test_cluster_dedup_forwards_checkpoint_dir(spark, tmp_path):
    from aqueducts_spark.operators.cluster import cluster_dedup

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 7)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5)], "id_a bigint, id_b bigint"
    )
    a = _rows(cluster_dedup(df, pairs))
    b = _rows(
        cluster_dedup(df, pairs, checkpoint_dir=str(tmp_path / "cd"))
    )
    assert a == b
    kept = {r[0] for r in a}
    assert kept == {1, 3, 4, 6}


def test_checkpoint_dir_is_session_global_not_clobbered(spark, tmp_path):
    """setCheckpointDir is session-global: a second materialize with a
    DIFFERENT dir must not silently re-point the session (two
    concurrent operators would race and one's checkpoints would land
    under the other's directory) — it warns and keeps the first."""
    import warnings

    from aqueducts_spark.operators.materialize import materialize

    df = spark.range(5)
    d1, d2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    # the shared test session may already carry a dir from an earlier
    # test (exactly the session-global nature under test) — pin the
    # in-force dir deterministically
    sc = spark.sparkContext
    sc.setCheckpointDir(d1)
    sc._aq_checkpoint_dir = d1
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _rows(materialize(df, checkpoint_dir=d2)) == _rows(df)
    assert any("checkpoint dir" in str(x.message) for x in w)
    assert "ck1" in spark.sparkContext.getCheckpointDir()
    # same dir again: no warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        materialize(df, checkpoint_dir=d1).count()
    assert not [x for x in w if "checkpoint dir" in str(x.message)]


def test_externally_set_checkpoint_dir_detected(spark, tmp_path):
    """A dir set OUTSIDE materialize (plain sc.setCheckpointDir) must
    still trip the differing-dir warning — and a matching external dir
    must be adopted silently (the r9 ADVICE case: without parsing the
    UUID-suffixed resolved form, a differing checkpoint_dir argument
    was silently ignored with neither warning nor override)."""
    import warnings

    from aqueducts_spark.operators.materialize import materialize

    df = spark.range(3)
    ext = str(tmp_path / "ext_ck")
    sc = spark.sparkContext
    sc.setCheckpointDir(ext)
    if hasattr(sc, "_aq_checkpoint_dir"):
        del sc._aq_checkpoint_dir  # simulate: set outside materialize
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        materialize(df, checkpoint_dir=str(tmp_path / "other_ck")).count()
    assert any("checkpoint dir" in str(x.message) for x in w)
    # same dir spelled as the user passed it: adopted, no warning
    if hasattr(sc, "_aq_checkpoint_dir"):
        del sc._aq_checkpoint_dir
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        materialize(df, checkpoint_dir=ext).count()
    assert not [x for x in w if "checkpoint dir" in str(x.message)]
    assert sc._aq_checkpoint_dir == ext

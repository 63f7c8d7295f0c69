"""ANN parameter auto-sizing regression across TWO corpus scales
(VERDICT r7 #6): the sqrt-sized IVF/IVFPQ parameters
(resolve_ivf_params — n_list ~ sqrt(n), nprobe ~ sqrt(n_list), FAISS
training floor) must hold their recall targets at BOTH probe sizes, so
a change to the auto-sizing cannot silently trade recall for speed at
the larger scale.  The sf0.01 and sf0.1 embeddings tables (500 and
2000 vectors) give a 4x scale step — the same step
tools/scale_probe.py measures its scaling exponents over.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    ivfpq_topk,
    resolve_ivf_params,
)

SCALES = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# recall@10 floors for sqrt-auto parameters on the SYNTHETIC
# embeddings (near-uniform on the sphere, so cluster structure is weak
# and recall ~ scanned fraction + the self hit: measured 0.51/0.62 IVF
# and 0.50/0.39 IVFPQ at the two scales) — floors pin the auto-sizing
# against regressions, not against the data's ceiling
IVF_TARGET = 0.45
IVFPQ_TARGET = 0.3


def _recall(approx_rows, exact):
    hits = total = 0
    approx: dict = {}
    for r in approx_rows:
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    for qid, truth in exact.items():
        total += len(truth)
        hits += len(truth & approx.get(qid, set()))
    return hits / total


def _fixtures(spark, sf):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact: dict = {}
    for r in brute_force_topk(emb, queries, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    return emb, queries, exact


def test_resolve_ivf_params_grows_with_scale():
    nc_small, np_small, _ = resolve_ivf_params(500)
    nc_large, np_large, _ = resolve_ivf_params(2000)
    assert nc_large > nc_small  # sqrt sizing: 23 -> 45 lists
    assert np_large >= np_small
    # per-list size grows ~sqrt(n) (4x corpus -> ~2x list size), NOT
    # linearly as it would with a fixed list count — so per-query scan
    # volume (nprobe * n / n_list) stays sublinear in n
    assert 2000 / nc_large <= 2.2 * (500 / nc_small)
    assert 2000 / nc_large < 2000 / nc_small  # beats fixed-count sizing


@pytest.mark.parametrize("sf", SCALES)
def test_ivf_auto_recall_holds_at_scale(spark, sf):
    emb, queries, exact = _fixtures(spark, sf)
    rows = ivf_topk(
        emb, queries, k=10, n_centroids="auto", nprobe="auto"
    ).collect()
    assert _recall(rows, exact) >= IVF_TARGET


@pytest.mark.parametrize("sf", SCALES)
def test_ivfpq_auto_recall_holds_at_scale(spark, sf):
    emb, queries, exact = _fixtures(spark, sf)
    rows = ivfpq_topk(
        emb,
        queries,
        k=10,
        n_centroids="auto",
        nprobe="auto",
        rerank=50,
        by_residual=True,
    ).collect()
    assert _recall(rows, exact) >= IVFPQ_TARGET

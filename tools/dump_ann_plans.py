"""Dump operator-level .explain("formatted") for the ANN kernels.

The sim_* bench gates localCheckpoint their result (per-call
materialization so bench repeats pay the index compute), which makes
the gate-level plan an opaque `Scan ExistingRDD`.  This tool captures
the plan of the operator OUTPUT itself — brute_force_topk, ivf_topk,
pq_topk (rerank), ivfpq_topk (residual rerank) — in both forms:

* ``_join`` suffix: the legacy broadcast-join/expression path
  (``similarity._FORCE_JOIN_PATHS = True``), i.e. the r9 shape;
* ``_scan`` suffix: the single-scan Arrow kernel path (default).

Usage: python tools/dump_ann_plans.py  (writes plans/$SPARK_GRAFT_PLAN_TAG/ann_*.txt, default r10)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_TAG", "r10"),
    )
    from pyspark.sql import functions as F

    from aqueducts_spark.operators import similarity as sim
    from aqueducts_spark.session import session_builder

    spark = (
        session_builder("ann-plan-dump", master="local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    entrymod._views(spark, sf_dir)
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = sim.train_pq(emb, n_subspaces=16, n_centroids=16)

    def build():
        return {
            "ann_bruteforce": lambda: sim.brute_force_topk(emb, queries, k=10),
            "ann_ivf": lambda: sim.ivf_topk(
                emb, queries, k=10, n_centroids=8, nprobe=4
            ),
            "ann_pq_rerank": lambda: sim.pq_topk(
                emb, queries, books, k=10, rerank=100
            ),
            "ann_ivfpq_rerank": lambda: sim.ivfpq_topk(
                emb,
                queries,
                k=10,
                n_centroids=8,
                nprobe=4,
                n_subspaces=16,
                n_pq_centroids=16,
                rerank=50,
                by_residual=True,
            ),
        }

    import contextlib
    import io

    for forced, suffix in ((True, "join"), (False, "scan")):
        sim._FORCE_JOIN_PATHS = forced
        for name, fn in build().items():
            df = fn()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
    sim._FORCE_JOIN_PATHS = False
    spark.stop()


if __name__ == "__main__":
    main()

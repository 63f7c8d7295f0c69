"""Declarative IVF index destination: a pipeline writes the
centroid-partitioned ANN layout (`ivf_persist`), queryable afterwards
with `ivf_topk_persisted` partition-pruned probes."""

from pyspark.sql import functions as F

from aqueducts_spark import load_pipeline_str, run_pipeline


def test_ivf_index_destination(spark, sf_dir, tmp_path):
    out = tmp_path / "ann_index"
    yml = f"""
version: "v2"
sources:
  - type: file
    name: ivf_emb
    format: {{type: parquet}}
    location: {sf_dir}/embeddings.parquet
stages:
  - - name: ivf_filtered
      query: SELECT vec_id, embedding FROM ivf_emb WHERE vec_id >= 0
destination:
  type: ivf_index
  name: ann
  location: {out}
  n_centroids: 8
"""
    run_pipeline(spark, load_pipeline_str(yml))

    # layout on disk: corpus partitioned by centroid_id + centroid parquet
    import glob

    parts = glob.glob(f"{out}/corpus/centroid_id=*")
    assert len(parts) == 8
    cents = spark.read.parquet(f"{out}/centroids")
    assert cents.count() == 8

    # index answers queries; full probe => self is always top-1
    from aqueducts_spark.operators.similarity import ivf_topk_persisted

    queries = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    rows = ivf_topk_persisted(spark, str(out), queries, k=5, nprobe=8).collect()
    tops = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    assert tops and all(tops[q] == q for q in tops)
    spark.catalog.dropTempView("ivf_emb")
    spark.catalog.dropTempView("ivf_filtered")


def test_pq_index_destination(spark, sf_dir, tmp_path):
    out = tmp_path / "pq_index"
    yml = f"""
version: "v2"
sources:
  - type: file
    name: pq_emb
    format: {{type: parquet}}
    location: {sf_dir}/embeddings.parquet
stages:
  - - name: pq_filtered
      query: SELECT vec_id, embedding FROM pq_emb WHERE vec_id >= 0
destination:
  type: pq_index
  name: pq_ann
  location: {out}
  n_centroids: 8
  n_subspaces: 16
"""
    run_pipeline(spark, load_pipeline_str(yml))

    # layout on disk: codes partitioned by centroid_id + centroids +
    # codebooks + the floats refine store
    import glob

    parts = glob.glob(f"{out}/codes/centroid_id=*")
    assert len(parts) == 8
    assert spark.read.parquet(f"{out}/centroids").count() == 8
    assert spark.read.parquet(f"{out}/codebooks").count() == 16 * 16
    assert spark.read.parquet(f"{out}/floats").columns == ["vec_id", "embedding"]

    # with the refine tier and a full probe, self is always top-1
    from aqueducts_spark.operators.similarity import ivfpq_topk_persisted

    queries = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    rows = ivfpq_topk_persisted(
        spark, str(out), queries, k=5, nprobe=8, rerank=20
    ).collect()
    tops = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    assert tops and all(tops[q] == q for q in tops)
    spark.catalog.dropTempView("pq_emb")
    spark.catalog.dropTempView("pq_filtered")

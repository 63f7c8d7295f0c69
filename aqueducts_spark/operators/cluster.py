"""Near-duplicate cluster resolution: connected components + canonical
representative selection.

The pairwise dedup operators (minhash_candidate_pairs, jaccard_pairs,
embedding_near_duplicates) emit an edge list of near-duplicate *pairs*.
A training pipeline must then keep ONE document per duplicate
*cluster* — the transitive closure of those pairs. That closure is
connected components over the similarity graph.

Implementation: distributed min-label propagation. Every node starts
labeled with its own id; each round, a node takes the minimum label
among itself and its neighbors. Converges in O(graph diameter) rounds —
near-dup graphs are overwhelmingly tiny cliques and chains, so a
handful of rounds suffices. Each round is one join + one min-aggregate
(2 shuffles), all on the node id; ``localCheckpoint`` truncates the
lineage so plans do not grow with iterations. The only driver-side
values are per-round change *counts* (convergence test), never data.

At web scale (billions of edges, high-diameter components) swap the
propagation loop for the large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond") — same external
contract, fewer rounds; the simple loop is the right tool for near-dup
graphs.

The result is exact and engine-independent, so the correctness gate can
verify it against a DuckDB recursive-CTE transitive closure.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "cluster_dedup"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: Optional[str] = None,
    driver_edges: int = 1_000_000,
) -> DataFrame:
    """Resolve components of an undirected edge list.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id reachable from ``node`` (a stable, deterministic cluster
    id). Isolated nodes (absent from ``edges``) are the caller's
    concern: they are their own component and need no resolution.

    Bounded edge lists (``driver_edges``, default 1M symmetric-distinct
    edges — near-dup graphs are duplication volume, not corpus volume)
    resolve with a DRIVER-SIDE union-find over one collect of the slim
    (u, v) relation (r11, guide §1.2 — the distributed algorithm first:
    the propagation loop pays 2 jobs per round plus a label
    materialization, all to converge a graph that fits in one task;
    union-find with min-label roots emits the identical (node, min
    reachable id) rows in one pass, string ids included — UTF-8 binary
    order equals code-point order, so Python ``min`` agrees with
    Spark's).  Past the bound — or when any node id is NULL — the
    distributed min-label propagation below runs unchanged; set
    ``driver_edges=0`` to force it.

    Raises (loop path) if label propagation has not converged after
    ``max_iter`` rounds (a component with graph diameter > max_iter):
    silently returning split components would make cluster_dedup keep
    several "canonical" copies of one duplicate cluster.  Convergence
    needs ~diameter rounds; raise ``max_iter`` for long chain-shaped
    graphs (diameter never limits the union-find path).

    ``checkpoint_dir``: the per-round materializations default to
    ``localCheckpoint`` (executor-local blocks — an executor lost
    mid-iteration fails the job unrecoverably, acceptable on local[N]
    or short jobs); pass a durable path to switch them to reliable
    ``checkpoint()`` for long runs on preemptible fleets.
    """
    # the edge list is materialized ONCE: without the checkpoint every
    # round's join would re-execute the edge list's full upstream
    # lineage (for fuzzy_dedup that is the whole MinHash-LSH candidate
    # pipeline, once per round).  Edges are near-dup volume, not corpus
    # volume, so the materialization is small at any scale.
    from .materialize import materialize

    sym = materialize(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct(),
        checkpoint_dir,
    )
    if driver_edges and driver_edges > 0:
        # the +1 overflow row turns "fits" into one cheap limit over
        # checkpointed blocks instead of a count job plus a collect
        rows = sym.limit(driver_edges + 1).collect()
        if len(rows) <= driver_edges and all(
            r["u"] is not None and r["v"] is not None for r in rows
        ):
            return _driver_union_find(edges.sparkSession, rows, sym)
    labels = materialize(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node")),
        checkpoint_dir,
    )
    id_type = dict(labels.dtypes)["component"]
    # max_iter + 1: a component of diameter exactly max_iter applies
    # its last label change in round max_iter; only a further round
    # with changed == 0 can CONFIRM convergence, so grant it before
    # declaring failure (previously a fully-converged result was
    # discarded with the error below)
    for i in range(max_iter + 1):
        neighbor = (
            sym.join(labels.withColumnRenamed("node", "v2"), sym.v == F.col("v2"))
            .select(
                F.col("u").alias("node"),
                F.col("component"),
                F.lit(None).cast(id_type).alias("__old"),
            )
        )
        # carry each node's previous label through the aggregation so
        # convergence is a filter over the checkpointed output — not a
        # second join+shuffle of new vs old labels per round
        new_labels = materialize(
            labels.select(
                "node", "component", F.col("component").alias("__old")
            )
            .unionByName(neighbor)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min("__old").alias("__old"),
            ),
            checkpoint_dir,
        )
        changed = new_labels.filter(F.col("component") < F.col("__old")).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
        if i == max_iter:
            raise RuntimeError(
                f"connected_components: labels still changing after "
                f"max_iter={max_iter} rounds — a component's diameter "
                "exceeds max_iter; raise max_iter to at least the "
                "component diameter + 1 (the extra round confirms "
                "convergence)"
            )
    return labels


def _driver_union_find(spark, rows, sym: DataFrame) -> DataFrame:
    """Union-find with min-label roots over a collected (u, v) edge
    list — merging always reparents the LARGER root under the smaller,
    so each set's root IS its minimum member and ``find(node)`` equals
    the propagation loop's "minimum reachable id" exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        # path compression
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for r in rows:
        u, v = r["u"], r["v"]
        nodes.add(u)
        nodes.add(v)
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru

    from pyspark.sql.types import StructField, StructType

    utype = sym.schema["u"].dataType
    out_schema = StructType(
        [StructField("node", utype), StructField("component", utype)]
    )
    return spark.createDataFrame(
        [(n, find(n)) for n in nodes], out_schema
    )


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    keep_by: Optional[str] = None,
    descending: bool = True,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Drop every near-duplicate except one representative per
    connected cluster of ``pairs``.

    The default representative is the minimum id (the classic
    deterministic choice — free, since each component is already
    labeled by its minimum member).  Pass ``keep_by=<column of df>``
    to instead keep the member with the best score — e.g. a
    ``quality_score`` column, the real curation policy when duplicates
    differ in cleanliness; ``descending=False`` keeps the lowest.
    Ties (and NULL scores, which sort last) break to the minimum id,
    so the choice stays deterministic.  One extra slim join + one
    per-component window over cluster MEMBERS only (never the corpus).

    Anti-join against the non-kept members: rows not in any pair pass
    through untouched.
    """
    if keep_by is not None and keep_by not in df.columns:
        # validate BEFORE connected_components runs its eager per-round
        # jobs — a typo must not cost a full component computation
        raise ValueError(
            f"cluster_dedup: keep_by column {keep_by!r} not in df"
        )
    cc = connected_components(
        pairs, src=src, dst=dst, checkpoint_dir=checkpoint_dir
    )
    if keep_by is None:
        # representative = minimum id AMONG MEMBERS PRESENT IN df: the
        # component label (global min id) may have been filtered out
        # upstream, and anti-joining on "node != component" would then
        # drop the ENTIRE cluster instead of keeping one survivor (the
        # keep_by branch already ranks present members only)
        from pyspark.sql.window import Window

        # distinct BEFORE ranking: duplicate rows of the kept id would
        # otherwise rank as separate members and put the keeper itself
        # into the drop set
        present = (
            df.select(F.col(id_col).alias("node"))
            .distinct()
            .join(cc, "node", "inner")
        )
        w = Window.partitionBy("component").orderBy(F.col("node").asc())
        non_canonical = (
            present.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > 1)
            .select("node")
        )
        return df.join(
            non_canonical, df[id_col] == non_canonical.node, "left_anti"
        )
    from pyspark.sql.window import Window

    # aggregate the score to ONE row per id before ranking: the
    # anti-join keeps or drops all rows of an id together, so an id
    # with duplicate rows must rank once (by its best/worst score),
    # not once per row — otherwise the winner id's second row lands in
    # the drop set and deletes the whole cluster
    score = (F.max if descending else F.min)(F.col("__kb")).alias("__kb")
    member = (
        cc.join(
            df.select(
                F.col(id_col).alias("node"), F.col(keep_by).alias("__kb")
            ),
            "node",
        )
        .groupBy("component", "node")
        .agg(score)
    )
    order = (
        F.col("__kb").desc_nulls_last()
        if descending
        else F.col("__kb").asc_nulls_last()
    )
    rk = F.row_number().over(
        Window.partitionBy("component").orderBy(order, F.col("node").asc())
    )
    drop = member.withColumn("__rk", rk).where(F.col("__rk") > 1).select("node")
    return df.join(drop, df[id_col] == drop.node, "left_anti")

"""Scale-up probe: measure how the headline operators ACTUALLY scale.

The bench (bench.py) gives one reading at one scale factor; the scale
arguments in SCALE.md are plan-shape arguments.  This tool turns them
into measurements: it materializes k-times-larger variants of the
sf0.1 tables (id-shifted, text-perturbed copies so the DUPLICATE RATE
and join fan-outs stay constant — a naive k-fold copy would create
k-sized exact-duplicate groups and quadratic candidate volume that is
a property of the data, not the plan) and times a probe set of queries
at 1x/3x/10x, reporting each query's empirical scaling exponent
``log(t_10/t_1)/log(10)``: ~1.0 = linear, <1 = fixed-cost dominated,
>1.3 = superlinear (a scale smell worth a plan audit).

Usage:
    python tools/scale_probe.py build  [--src /root/testdata/sf0.1]
                                       [--out /tmp/scaleprobe] [--copies 1 3 10]
    python tools/scale_probe.py run    [--out /tmp/scaleprobe] [--copies 1 3 10]
                                       [--queries op_fuzzy_dedup ...]

Copy construction (per copy k>0; k=0 is the original rows):
* documents: doc_id += k*10_000; text gets a per-copy suffix token
  `" cpK"` so near-duplicate groups never span copies (duplicate rate
  preserved); n_chars adjusted to match.
* embeddings: vec_id += k*10_000; the vector is rotated by k positions
  (norms identical, geometry decorrelated across copies).
* orders/lineitem/customer: order/cust keys += k*1_000_000 (copies are
  self-contained join shards); part/supp FKs untouched — the dimension
  tables stay single-copy, exactly how a 100 TB fact table shares its
  dimensions.
* events: event_id += k*1_000_000, user_id += k*100_000 (per-user
  event density constant), ts unchanged.
* region/nation/part/supplier: single copy (dimensions).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOC_SHIFT = 10_000
VEC_SHIFT = 10_000
OKEY_SHIFT = 1_000_000
CUST_SHIFT = 1_000_000
EVT_SHIFT = 1_000_000
USER_SHIFT = 100_000

SINGLE_COPY = ["region", "nation", "part", "supplier"]

# default probe set: the heavy / shuffle-bearing headliners plus two
# known-linear controls (q01 scan-agg, op_quality_score map-only)
DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q02_top_revenue_join",
    "op_quality_score",
    "op_minhash_pairs",
    "op_fuzzy_dedup",
    "op_line_dedup",
    "op_span_dedup",
    "op_bigram_nll",
    "op_dsir_weights",
    "op_embed_neardup_lsh",
    "sim_ivf_topk",
    "sim_pq_topk",
    "op_hll_distinct",
    "op_cms_freq",
    "op_decontam",
    "op_fuzzy_decontam",
    "op_bpe_ids",
    "op_simhash_neardup",
    "op_nb_classify",
    "op_fuzzy_filter",
    "op_kn_nll",
]


def _copy_sql(table: str, src: str, copies: int) -> str:
    """UNION ALL of `copies` shifted/perturbed copies of one table."""
    f = f"'{src}/{table}.parquet'"
    parts = []
    for k in range(copies):
        if table == "documents":
            if k == 0:
                sel = f"SELECT * FROM {f}"
            else:
                sel = (
                    f"SELECT doc_id + {k * DOC_SHIFT} AS doc_id, "
                    f"text || ' cp{k}' AS text, lang, source, "
                    f"n_chars + {len(f' cp{k}')} AS n_chars FROM {f}"
                )
        elif table == "embeddings":
            rot = k % 64
            if rot == 0 and k == 0:
                sel = f"SELECT * FROM {f}"
            else:
                emb = (
                    "embedding"
                    if rot == 0
                    else f"list_concat(embedding[{rot + 1}:], embedding[1:{rot}])"
                )
                sel = (
                    f"SELECT vec_id + {k * VEC_SHIFT} AS vec_id, "
                    f"{emb} AS embedding, label FROM {f}"
                )
        elif table == "orders":
            sel = (
                f"SELECT o_orderkey + {k * OKEY_SHIFT} AS o_orderkey, "
                f"o_custkey + {k * CUST_SHIFT} AS o_custkey, "
                f"* EXCLUDE (o_orderkey, o_custkey) FROM {f}"
            )
        elif table == "lineitem":
            sel = (
                f"SELECT l_orderkey + {k * OKEY_SHIFT} AS l_orderkey, "
                f"* EXCLUDE (l_orderkey) FROM {f}"
            )
        elif table == "customer":
            sel = (
                f"SELECT c_custkey + {k * CUST_SHIFT} AS c_custkey, "
                f"* EXCLUDE (c_custkey) FROM {f}"
            )
        elif table == "events":
            sel = (
                f"SELECT event_id + {k * EVT_SHIFT} AS event_id, "
                f"user_id + {k * USER_SHIFT} AS user_id, "
                f"* EXCLUDE (event_id, user_id) FROM {f}"
            )
        else:
            sel = f"SELECT * FROM {f}"
        parts.append(sel)
    return " UNION ALL ".join(parts)


def build(src: str, out: str, copies: list[int]) -> None:
    import duckdb

    con = duckdb.connect()
    for c in copies:
        d = os.path.join(out, f"x{c}")
        os.makedirs(d, exist_ok=True)
        for t in SINGLE_COPY:
            con.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{d}/{t}.parquet' (FORMAT PARQUET)"
            )
        for t in ["documents", "embeddings", "orders", "lineitem", "customer", "events"]:
            con.sql(
                f"COPY ({_copy_sql(t, src, c)}) TO '{d}/{t}.parquet' "
                f"(FORMAT PARQUET)"
            )
        n = con.sql(f"SELECT COUNT(*) FROM '{d}/lineitem.parquet'").fetchone()[0]
        print(f"built {d}: lineitem={n}", file=sys.stderr)


def run(out: str, copies: list[int], names: list[str], repeats: int) -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)).strip()
    shuffle_parts = cpus if cpus.isdigit() else str(os.cpu_count() or 8)
    from aqueducts_spark.session import session_builder

    spark = (
        session_builder("aqueducts-scale-probe", master=f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=2g -XX:-UseCodeCacheFlushing",
        )
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    results: dict[str, dict[int, float]] = {n: {} for n in names}
    errors: dict[str, str] = {}
    for c in copies:
        sf_dir = os.path.join(out, f"x{c}")
        entrymod._views(spark, sf_dir)
        spark.table("region").count()
        for n in names:
            try:
                best = float("inf")
                for _ in range(repeats):
                    t0 = time.monotonic()
                    qs[n](spark, sf_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    best = min(best, time.monotonic() - t0)
                results[n][c] = round(best, 3)
                print(f"x{c} {n}: {best:.3f}s", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 — probe must survive
                errors[f"x{c}:{n}"] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"x{c} {n}: FAILED {exc}", file=sys.stderr)

    lo, hi = min(copies), max(copies)
    report = {}
    for n in names:
        r = results[n]
        exp = None
        if lo in r and hi in r and r[lo] > 0 and lo != hi:
            exp = round(math.log(r[hi] / r[lo]) / math.log(hi / lo), 2)
        report[n] = {"times": {f"x{c}": r.get(c) for c in copies}, "exponent": exp}
    out_obj = {"copies": copies, "queries": report}
    if errors:
        out_obj["errors"] = errors
    print(json.dumps(out_obj))
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["build", "run"])
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--out", default="/tmp/scaleprobe")
    p.add_argument("--copies", nargs="+", type=int, default=[1, 3, 10])
    p.add_argument("--queries", nargs="+", default=DEFAULT_QUERIES)
    p.add_argument("--repeats", type=int, default=2)
    a = p.parse_args()
    if a.cmd == "build":
        build(a.src, a.out, a.copies)
    else:
        run(a.out, a.copies, a.queries, a.repeats)


if __name__ == "__main__":
    main()

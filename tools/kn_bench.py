"""Isolated timing for the KN gate family vs their DuckDB oracles.

Usage: python tools/kn_bench.py [gate ...]   (default: all three)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = sys.argv[1:] or ["op_kn_nll", "op_kn3_nll", "op_kn3_score"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from aqueducts_spark.session import session_builder

    spark = (
        session_builder("kn-bench", master="local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=2g -XX:-UseCodeCacheFlushing",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    entrymod._views(spark, SF_DIR)
    spark.table("region").count()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    for name in GATES:
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.monotonic() - t0)
        obest = float("inf")
        if name in oracles:
            for _ in range(3):
                t0 = time.monotonic()
                con.execute(oracles[name]).fetchall()
                obest = min(obest, time.monotonic() - t0)
        ratio = best / obest if obest > 0 else float("nan")
        print(
            f"{name}: spark={best:.2f}s duck={obest:.2f}s ratio={ratio:.1f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Driver-style correctness check: run queries() vs oracle_sql() at a
given SF dir and compare row count, schema (column names), and exact
values (sorted rows, columns ordered by name).

Usage: python tools/oracle_check.py [--sf DIR] [gate ...]   (default: all)
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.10g}"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    from aqueducts_spark.session import session_builder

    spark = (
        session_builder("oracle-check", master="local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    entrymod._views(spark, sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    gates = args or [k for k in qs if k in oracles]

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name in gates:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ok_schema = sorted(scols) == sorted(ocols)
            ok_rows = len(srows) == len(orows)
            ok_vals = canon(srows, scols) == canon(orows, ocols)
            if ok_schema and ok_rows and ok_vals:
                n_pass += 1
                print(f"{name}: PASS ({len(srows)} rows)")
            else:
                n_fail += 1
                print(
                    f"{name}: FAIL schema={ok_schema} rows={ok_rows}"
                    f"({len(srows)}/{len(orows)}) vals={ok_vals}"
                )
                if not ok_vals and ok_rows and ok_schema:
                    a = canon(srows, scols)
                    b = canon(orows, ocols)
                    for x, y in zip(a, b):
                        if x != y:
                            print(f"  spark={x}\n  duck ={y}")
                            break
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(f"{name}: ERR {type(exc).__name__}: {str(exc)[:200]}")
    print(f"== {n_pass} passed, {n_fail} failed ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

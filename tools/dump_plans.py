"""Dump .explain("formatted") for gates to plans/<tag>/<gate>_<suffix>.txt.

Usage: python tools/dump_plans.py --tag r10 --suffix before [gate ...]
Default gate set: every BENCH_QUERIES entry.  Plans are captured
lazily (no execution) at $SPARK_GRAFT_SF_DIR (default sf0.1).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    tag = "r10"
    suffix = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from aqueducts_spark.session import session_builder

    names = args or list(bench.BENCH_QUERIES)

    spark = (
        session_builder("plan-dump", master="local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    entrymod._views(spark, sf_dir)
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            import contextlib
            import io

            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

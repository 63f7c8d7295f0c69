"""Command-line runner: ``python -m aqueducts_spark.cli run -f p.yml -p k=v``.

Mirrors the reference CLI surface (aqueducts-cli/src/main.rs:120-144):
``run`` executes a pipeline file with ``--param`` substitutions. Remote
execution (the reference's websocket executor) is out of scope here —
on Spark the equivalent deployment is ``spark-submit`` / Spark Connect
against a cluster, which this entry point supports unchanged because it
only asks for a ``SparkSession``.
"""

from __future__ import annotations

import argparse
import sys


def _parse_params(pairs: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"--param must be key=value, got: {pair}")
        k, v = pair.split("=", 1)
        out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="aqueducts-spark")
    sub = parser.add_subparsers(dest="command", required=True)
    run_p = sub.add_parser("run", help="execute a pipeline file")
    run_p.add_argument("--file", "-f", required=True, help="pipeline YAML/JSON/TOML")
    run_p.add_argument(
        "--param", "-p", action="append", default=[], help="template param key=value"
    )
    run_p.add_argument("--master", default=None, help="Spark master (default local[*])")
    run_p.add_argument(
        "--show-result", action="store_true", help="print the final stage result"
    )
    args = parser.parse_args(argv)

    if args.command == "run":
        from . import load_pipeline, run_pipeline
        from .progress import LoggingTracker
        from .session import get_spark

        import logging

        logging.basicConfig(level=logging.INFO, format="%(message)s")
        pipeline = load_pipeline(args.file, _parse_params(args.param))
        spark = get_spark("aqueducts-spark-cli", master=args.master)
        try:
            result = run_pipeline(spark, pipeline, LoggingTracker())
            if args.show_result and result.result is not None:
                result.result.show(50, truncate=False)
        finally:
            spark.stop()
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())

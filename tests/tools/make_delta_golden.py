"""One-time generator for tests/data/delta_golden (run from repo root).

Produces a small frozen Delta table used by tests/test_delta_interop.py
for (a) log-format stability regression and (b) cross-parsing by the
independent clean-room reader in tests/_delta_reader.py.  See
tests/data/delta_golden/PROVENANCE.md for why this fixture exists and
what limits its evidentiary value.

Usage:  python tests/tools/make_delta_golden.py
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

OUT = Path(__file__).resolve().parents[1] / "data" / "delta_golden"


def main() -> None:
    from aqueducts_spark import get_spark
    from aqueducts_spark.delta.protocol import DeltaProtocolTable
    from aqueducts_spark.types import Field

    spark = get_spark("make-delta-golden", master="local[2]")
    if OUT.exists():
        shutil.rmtree(OUT)

    fields = [
        Field(name="id", data_type="int64", nullable=False),
        Field(name="category", data_type="string", nullable=True),
        Field(name="name", data_type="string", nullable=True),
        Field(name="score", data_type="float64", nullable=True),
    ]
    t = DeltaProtocolTable(spark, str(OUT))
    t.create_if_absent(fields, ["category"], {"golden": "v1"}, {})

    def df(rows):
        return spark.createDataFrame(
            rows, "id long, category string, name string, score double"
        ).coalesce(1)

    # v1: append two partitions
    t.append(df([(1, "x", "alpha", 1.5), (2, "x", "beta", 2.5), (3, "y", "gamma", None)]))
    # v2: append more
    t.append(df([(4, "y", "delta", 4.0)]))
    # v3: upsert -> produces remove tombstones
    t.upsert(df([(2, "x", "BETA", 20.0), (5, "z", "epsilon", 5.0)]), keys=["id"])
    print("wrote", OUT)
    for p in sorted(OUT.rglob("*")):
        if p.is_file():
            print("  ", p.relative_to(OUT), p.stat().st_size)


if __name__ == "__main__":
    main()

"""One-time generator for tests/data/delta_golden_features (run from
repo root): a frozen FEATURE-TABLE fixture — protocol v7 with
changeDataFeed + checkConstraints, a cdc-bearing MERGE commit, and an
enforced CHECK constraint — pinning the on-disk dialect of everything
round 3 added to the Delta writer.  Companion to
tests/data/delta_golden (the plain writer-v2 fixture); same provenance
caveats, see that fixture's PROVENANCE.md.

Usage:  python tests/tools/make_delta_golden_features.py
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

OUT = Path(__file__).resolve().parents[1] / "data" / "delta_golden_features"


def main() -> None:
    from aqueducts_spark import get_spark
    from aqueducts_spark.delta.protocol import DeltaProtocolTable
    from aqueducts_spark.types import Field

    spark = get_spark("make-delta-golden-features", master="local[2]")
    if OUT.exists():
        shutil.rmtree(OUT)

    fields = [
        Field(name="id", data_type="int64", nullable=False),
        Field(name="name", data_type="string", nullable=True),
        Field(name="score", data_type="float64", nullable=True),
    ]
    t = DeltaProtocolTable(spark, str(OUT))
    t.create_if_absent(
        fields,
        [],
        {
            "delta.enableChangeDataFeed": "true",
            "delta.constraints.nonneg": "score >= 0",
        },
        {},
    )

    def df(rows):
        return spark.createDataFrame(
            rows, "id long, name string, score double"
        ).coalesce(1)

    # v1: append
    t.append(df([(1, "alpha", 1.5), (2, "beta", 2.5)]))
    # v2: upsert -> cdc actions under _change_data/
    t.upsert(df([(2, "BETA", 20.0), (3, "gamma", 3.0)]), keys=["id"])
    print("wrote", OUT)
    for p in sorted(OUT.rglob("*")):
        if p.is_file():
            print("  ", p.relative_to(OUT), p.stat().st_size)


if __name__ == "__main__":
    main()

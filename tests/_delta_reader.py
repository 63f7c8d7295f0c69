"""An INDEPENDENT, from-scratch Delta Lake log reader for interop tests.

This module deliberately imports NOTHING from ``aqueducts_spark``: it is
a clean-room second implementation of the open Delta protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) built only
on the stdlib and pyarrow.  The interop tests parse tables written by
``aqueducts_spark.delta.protocol`` with THIS reader (and vice versa), so
a bug in the product's log writer cannot be masked by a matching bug in
the product's log reader — the closest possible stand-in for a real
second engine in an environment without delta-rs / delta-spark.

Covered (the subset the tests exercise):

* ``_delta_log/{version:020d}.json`` commit replay in version order;
* classic parquet checkpoints + ``_last_checkpoint`` (replay starts at
  the newest checkpoint <= the requested version);
* add/remove reconciliation with URL-decoded paths;
* stringly-typed ``partitionValues`` materialized back into columns per
  the metaData ``schemaString`` (spec: data files of partitioned tables
  may omit the partition columns);
* version time travel.
"""

from __future__ import annotations

import json
from datetime import date, datetime
from pathlib import Path
from urllib.parse import unquote

import pyarrow as pa
import pyarrow.parquet as pq

LOG = "_delta_log"


class IndependentDeltaError(Exception):
    pass


def _commit_versions(log_dir: Path) -> list[int]:
    out = []
    for p in log_dir.glob("*.json"):
        stem = p.name[: -len(".json")]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _checkpoint_versions(log_dir: Path) -> list[int]:
    out = []
    for p in log_dir.glob("*.checkpoint.parquet"):
        stem = p.name.split(".", 1)[0]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _checkpoint_actions(path: Path):
    table = pq.read_table(path)
    for row in table.to_pylist():
        for key in ("protocol", "metaData", "add", "remove", "txn"):
            val = row.get(key)
            if val is not None:
                yield {key: val}


def _replay(log_dir: Path, version: int | None):
    commits = _commit_versions(log_dir)
    checkpoints = _checkpoint_versions(log_dir)
    if not commits and not checkpoints:
        raise IndependentDeltaError(f"no delta log at {log_dir}")
    latest = max(commits + checkpoints)
    if version is None:
        version = latest
    if version > latest:
        raise IndependentDeltaError(f"version {version} > latest {latest}")

    state = {"metaData": None, "protocol": None, "files": {}, "removed": {}}

    def apply(action: dict) -> None:
        if "metaData" in action:
            state["metaData"] = action["metaData"]
        elif "protocol" in action:
            state["protocol"] = action["protocol"]
        elif "add" in action:
            add = action["add"]
            p = unquote(add["path"])
            state["files"][p] = add
            state["removed"].pop(p, None)
        elif "remove" in action:
            p = unquote(action["remove"]["path"])
            state["files"].pop(p, None)
            state["removed"][p] = action["remove"]

    start = 0
    usable = [c for c in checkpoints if c <= version]
    if usable:
        cp = usable[-1]
        for action in _checkpoint_actions(log_dir / f"{cp:020d}.checkpoint.parquet"):
            apply(action)
        start = cp + 1
    expected = [v for v in range(start, version + 1)]
    have = [v for v in commits if start <= v <= version]
    if have != expected:
        raise IndependentDeltaError(
            f"missing commits {sorted(set(expected) - set(have))}"
        )
    for v in have:
        for line in (log_dir / f"{v:020d}.json").read_text().splitlines():
            if line.strip():
                apply(json.loads(line))
    if state["metaData"] is None:
        raise IndependentDeltaError("no metaData action in log")
    return state


_PRIMITIVES = {
    "string": pa.string(),
    "long": pa.int64(),
    "integer": pa.int32(),
    "short": pa.int16(),
    "byte": pa.int8(),
    "float": pa.float32(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us", tz="UTC"),
    "timestamp_ntz": pa.timestamp("us"),
}


def _partition_value(raw: str | None, delta_type: str):
    """Decode one spec 'Partition Value Serialization' string."""
    if raw is None or raw == "":
        return None
    if delta_type in ("long", "integer", "short", "byte"):
        return int(raw)
    if delta_type in ("float", "double"):
        return float(raw)
    if delta_type == "boolean":
        return raw == "true"
    if delta_type == "date":
        return date.fromisoformat(raw)
    if delta_type in ("timestamp", "timestamp_ntz"):
        return datetime.fromisoformat(raw)
    return raw  # string and anything stringly


def _physical_name(field: dict) -> str:
    """Column-mapping physical name of a schemaString field (PROTOCOL.md
    "Column Mapping") — the parquet/partitionValues key; falls back to
    the logical name for unmapped tables."""
    return (field.get("metadata") or {}).get(
        "delta.columnMapping.physicalName", field["name"]
    )


def _logical_value(v, tjson):
    """Recursively rename a physically-keyed python value back to
    logical field names per the schemaString type json."""
    if v is None or not isinstance(tjson, dict):
        return v
    t = tjson.get("type")
    if t == "struct":
        return {
            f["name"]: _logical_value(v.get(_physical_name(f)), f["type"])
            for f in tjson["fields"]
        }
    if t == "array":
        return [_logical_value(x, tjson["elementType"]) for x in v]
    if t == "map":
        items = v.items() if isinstance(v, dict) else v
        return {
            k: _logical_value(val, tjson["valueType"]) for k, val in items
        }
    return v


def read_delta_table(
    root: str | Path, version: int | None = None
) -> tuple[list[tuple[str, str]], list[dict]]:
    """Read a Delta table from scratch.

    Returns ``(schema, rows)`` where ``schema`` is
    ``[(column_name, delta_type_name), ...]`` in declared order and
    ``rows`` is a list of per-row dicts (python values).
    """
    root = Path(root)
    state = _replay(root / LOG, version)
    meta = state["metaData"]
    schema_json = json.loads(meta["schemaString"])
    fields = schema_json["fields"]
    columns = [(f["name"], f["type"]) for f in fields]
    part_cols = list(meta.get("partitionColumns") or [])
    types = dict(columns)
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode not in ("none", "name", "id"):
        raise IndependentDeltaError(f"unknown columnMapping mode {mode!r}")
    phys_of = {f["name"]: _physical_name(f) for f in fields}

    rows: list[dict] = []
    for path, add in sorted(state["files"].items()):
        fpath = root / path
        if not fpath.is_file():
            raise IndependentDeltaError(f"add action points at missing file {path}")
        table = pq.read_table(fpath)
        file_rows = table.to_pylist()
        pv = add.get("partitionValues") or {}
        # partitionValues of mapped tables are keyed physically
        fills = {
            c: _partition_value(pv.get(phys_of[c]), str(types.get(c)))
            for c in part_cols
            if phys_of[c] not in table.column_names
        }
        for r in file_rows:
            out = {}
            for f in fields:
                name, phys = f["name"], phys_of[f["name"]]
                if phys in r:
                    out[name] = _logical_value(r[phys], f["type"])
                else:
                    out[name] = fills.get(name)
            rows.append(out)
    return columns, rows

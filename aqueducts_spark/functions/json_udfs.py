"""SQL-callable function pack.

* ``unnest_json_array(str) -> array<string>`` — exact port of the
  reference UDF (aqueducts/core/src/custom_udfs.rs:14-58): parse a JSON
  array and return each element's compact-JSON text (strings keep their
  quotes, objects serialize compactly); null in -> null out; non-array
  input raises.
* DataFusion JSON function shims (the reference registers
  ``datafusion-functions-json`` wholesale, custom_udfs.rs:60-70):
  ``json_get_str/int/float/bool``, ``json_as_text``, ``json_contains``,
  ``json_length``. These make reference stage queries run unmodified.

Implementation notes (scale): all are Arrow-batched pandas UDFs, not
row-at-a-time Python UDFs. They are still the Python slow path — for
hot paths prefer Spark natives (``get_json_object``, ``from_json``),
which these shims deliberately do not replace.
"""

from __future__ import annotations

import json
import sys

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .._shipping import ship_module_by_value

# the UDF bodies reference module-level helpers (_lookup & co) — ship
# them by value so executors never need this package importable
ship_module_by_value(sys.modules[__name__])

_COMPACT = {"separators": (",", ":"), "ensure_ascii": False}


class JsonUdfError(ValueError):
    pass


def _unnest_json_array_batch(col: pd.Series) -> pd.Series:
    out = []
    for txt in col:
        if txt is None:
            out.append(None)
            continue
        value = json.loads(txt)
        if not isinstance(value, list):
            raise JsonUdfError(
                f"unnest_json_array: expected JSON array, got {json.dumps(value, **_COMPACT)}"
            )
        out.append([json.dumps(elem, **_COMPACT) for elem in value])
    return pd.Series(out, dtype=object)


def _lookup(txt, path):
    """Walk a dotted path of object keys / array indices; None when absent."""
    if txt is None or path is None:
        return None
    try:
        value = json.loads(txt)
    except (ValueError, TypeError):
        return None
    for part in str(path).split("."):
        if isinstance(value, dict):
            if part not in value:
                return None
            value = value[part]
        elif isinstance(value, list):
            try:
                value = value[int(part)]
            except (ValueError, IndexError):
                return None
        else:
            return None
    return value


def _series_map(f):
    def inner(jsons: pd.Series, paths: pd.Series) -> pd.Series:
        return pd.Series(
            [f(j, p) for j, p in zip(jsons, paths)], dtype=object
        )

    return inner


def register_udfs(spark: SparkSession) -> None:
    """Register the function pack on a session (idempotent)."""
    spark.udf.register(
        "unnest_json_array",
        pandas_udf(_unnest_json_array_batch, T.ArrayType(T.StringType())),
    )

    def get_str(j, p):
        v = _lookup(j, p)
        if v is None:
            return None
        return v if isinstance(v, str) else json.dumps(v, **_COMPACT)

    def get_int(j, p):
        v = _lookup(j, p)
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            return v
        if isinstance(v, float) and v.is_integer():
            return int(v)
        return None

    def get_float(j, p):
        v = _lookup(j, p)
        if isinstance(v, bool):
            return None
        return float(v) if isinstance(v, (int, float)) else None

    def get_bool(j, p):
        v = _lookup(j, p)
        return v if isinstance(v, bool) else None

    def as_text(j, p):
        v = _lookup(j, p)
        if v is None:
            return None
        return v if isinstance(v, str) else json.dumps(v, **_COMPACT)

    def contains(j, p):
        if j is None:
            return None
        return _lookup(j, p) is not None or _path_exists(j, p)

    def length(j, p=None):
        v = _lookup(j, p) if p else _safe_load(j)
        if isinstance(v, (list, dict)):
            return len(v)
        return None

    spark.udf.register(
        "json_get_str", pandas_udf(_series_map(get_str), T.StringType())
    )
    spark.udf.register(
        "json_get_int", pandas_udf(_series_map(get_int), T.LongType())
    )
    spark.udf.register(
        "json_get_float", pandas_udf(_series_map(get_float), T.DoubleType())
    )
    spark.udf.register(
        "json_get_bool", pandas_udf(_series_map(get_bool), T.BooleanType())
    )
    spark.udf.register(
        "json_as_text", pandas_udf(_series_map(as_text), T.StringType())
    )
    spark.udf.register(
        "json_contains", pandas_udf(_series_map(contains), T.BooleanType())
    )
    spark.udf.register(
        "json_length", pandas_udf(_series_map(length), T.LongType())
    )


def _safe_load(j):
    try:
        return json.loads(j) if j is not None else None
    except (ValueError, TypeError):
        return None


def _path_exists(j, p) -> bool:
    """Distinguish a stored JSON null from an absent key."""
    value = _safe_load(j)
    if value is None:
        return False
    for part in str(p).split("."):
        if isinstance(value, dict) and part in value:
            value = value[part]
        elif isinstance(value, list):
            try:
                value = value[int(part)]
            except (ValueError, IndexError):
                return False
        else:
            return False
    return True

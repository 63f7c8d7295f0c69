"""Universal type-string grammar -> PySpark types.

Re-implements the reference's backend-neutral type grammar
(reference: aqueducts/schemas/src/data_types.rs:295-507) as a Python
parser that emits ``pyspark.sql.types`` objects.  The grammar is the
same one users write in pipeline YAML:

    string | utf8 | large_string | large_utf8
    bool | boolean
    int8 int16 int32|int|integer int64|long
    uint8 uint16 uint32 uint64
    float32|float float64|double
    binary | large_binary | fixed_binary<n>
    date32|date date64
    timestamp<unit[,tz]>   time32<unit> time64<unit> duration<unit>
    interval<year_month|day_time|month_day_nano>
    decimal<p,s> decimal256<p,s>
    list<T> large_list<T> fixed_list<T,n>
    struct<name:T,...>  map<K,V>

Spark gaps are widened or rejected per SURVEY.md §1.5:

* unsigned ints widen (uint8->short, uint16->int, uint32->long,
  uint64->decimal(20,0));
* Large* variants are Arrow offset details -> same Spark type;
* time32/time64 have no Spark type-of-day -> LongType (documented);
* decimal256 with precision > 38 is rejected;
* union is rejected (unused by any reference example/test);
* dictionary<K,V> maps to the value type (physical encoding detail).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import pyspark.sql.types as T

__all__ = ["Field", "parse_data_type", "parse_fields", "fields_to_struct"]

_TIME_UNITS = {
    "second": "second",
    "s": "second",
    "millisecond": "millisecond",
    "ms": "millisecond",
    "microsecond": "microsecond",
    "us": "microsecond",
    "nanosecond": "nanosecond",
    "ns": "nanosecond",
}

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    # Spark has no unsigned types: widen to the next signed type that
    # holds the full range (uint64 -> decimal(20,0)).
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float32": T.FloatType(),
    "float": T.FloatType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "utf8": T.StringType(),
    "large_string": T.StringType(),
    "large_utf8": T.StringType(),
    "binary": T.BinaryType(),
    "large_binary": T.BinaryType(),
    "date32": T.DateType(),
    "date": T.DateType(),
    # date64 is ms-since-epoch in Arrow -> closest lossless Spark type
    "date64": T.TimestampType(),
}


class TypeParseError(ValueError):
    """Raised when a type string does not conform to the grammar."""


def _parse_time_unit(s: str) -> str:
    unit = _TIME_UNITS.get(s.strip())
    if unit is None:
        raise TypeParseError(f"Unknown time unit: {s}")
    return unit


def _split_params(s: str) -> list[str]:
    """Split a comma-separated parameter list honouring nested <> brackets."""
    parts: list[str] = []
    depth = 0
    current: list[str] = []
    for ch in s:
        if ch == "<":
            depth += 1
            current.append(ch)
        elif ch == ">":
            depth -= 1
            if depth < 0:
                raise TypeParseError(f"Unbalanced brackets in type parameters: {s}")
            current.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(current).strip())
            current = []
        else:
            current.append(ch)
    if depth != 0:
        raise TypeParseError(f"Unbalanced brackets in type parameters: {s}")
    if current or parts:
        parts.append("".join(current).strip())
    return parts


def _parameterized(s: str) -> Optional[tuple[str, list[str]]]:
    lt = s.find("<")
    if lt == -1:
        return None
    if not s.endswith(">"):
        raise TypeParseError(f"Malformed parameterized type: {s}")
    name = s[:lt].strip().lower()
    inner = s[lt + 1 : -1]
    return name, _split_params(inner)


def parse_data_type(s: str) -> T.DataType:
    """Parse one type string from the universal grammar into a Spark type."""
    s = s.strip()
    simple = _SIMPLE_TYPES.get(s.lower())
    if simple is not None:
        return simple

    parsed = _parameterized(s)
    if parsed is None:
        raise TypeParseError(f"Unknown data type: {s}")
    name, params = parsed

    def need(n: int) -> None:
        if len(params) != n:
            raise TypeParseError(
                f"{name} type requires exactly {n} parameter(s), got {len(params)}"
            )

    if name in ("list", "large_list"):
        need(1)
        return T.ArrayType(parse_data_type(params[0]), containsNull=True)
    if name == "fixed_list":
        need(2)
        elem = parse_data_type(params[0])
        _int_param(params[1], "size for fixed_list")
        # Spark has no fixed-size arrays; length is enforced at write
        # validation time (see destinations), not in the type.
        return T.ArrayType(elem, containsNull=True)
    if name == "fixed_binary":
        need(1)
        _int_param(params[0], "size for fixed_binary")
        return T.BinaryType()
    if name == "decimal":
        need(2)
        p = _int_param(params[0], "precision for decimal")
        sc = _int_param(params[1], "scale for decimal")
        if not (1 <= p <= 38):
            raise TypeParseError(f"decimal precision out of Spark range 1..38: {p}")
        if not (0 <= sc <= p):
            # Spark/Arrow reject these deep inside schema-apply with an
            # opaque JVM error; name the bad type string instead
            raise TypeParseError(
                f"decimal scale must be in 0..precision ({p}), got {sc}"
            )
        return T.DecimalType(p, sc)
    if name == "decimal256":
        need(2)
        p = _int_param(params[0], "precision for decimal256")
        sc = _int_param(params[1], "scale for decimal256")
        if not (1 <= p <= 38):
            raise TypeParseError(
                f"decimal256 precision out of Spark's supported range 1..38: {p}"
            )
        if not (0 <= sc <= p):
            raise TypeParseError(
                f"decimal256 scale must be in 0..precision ({p}), got {sc}"
            )
        return T.DecimalType(p, sc)
    if name == "timestamp":
        if not params or len(params) > 2:
            raise TypeParseError(
                f"timestamp type requires 1 or 2 parameters, got {len(params)}"
            )
        _parse_time_unit(params[0])  # unit normalized away: Spark is µs-based
        if len(params) == 2 and params[1]:
            return T.TimestampType()  # tz-aware, session-normalized
        return T.TimestampNTZType()
    if name == "time32":
        need(1)
        unit = _parse_time_unit(params[0])
        if unit not in ("second", "millisecond"):
            raise TypeParseError("time32 only supports second and millisecond units")
        return T.LongType()  # Spark has no time-of-day type
    if name == "time64":
        need(1)
        unit = _parse_time_unit(params[0])
        if unit not in ("microsecond", "nanosecond"):
            raise TypeParseError("time64 only supports microsecond and nanosecond units")
        return T.LongType()
    if name == "duration":
        need(1)
        _parse_time_unit(params[0])
        return T.DayTimeIntervalType()
    if name == "interval":
        need(1)
        unit = params[0].strip().lower()
        if unit == "year_month":
            return T.YearMonthIntervalType()
        if unit == "day_time":
            return T.DayTimeIntervalType()
        if unit == "month_day_nano":
            raise TypeParseError(
                "interval<month_day_nano> has no readable Spark column type"
            )
        raise TypeParseError(f"Unknown interval unit: {unit}")
    if name == "struct":
        if not params:
            raise TypeParseError("struct type requires at least one field")
        fields = []
        for p in params:
            colon = _top_level_colon(p)
            if colon == -1:
                raise TypeParseError(f"struct field missing ':' separator: {p}")
            fname = p[:colon].strip()
            ftype = parse_data_type(p[colon + 1 :])
            fields.append(T.StructField(fname, ftype, nullable=True))
        return T.StructType(fields)
    if name == "map":
        need(2)
        return T.MapType(
            parse_data_type(params[0]), parse_data_type(params[1]), valueContainsNull=True
        )
    if name == "dictionary":
        need(2)
        # dictionary encoding is a physical detail: logical type is the value
        return parse_data_type(params[1])
    if name == "union":
        raise TypeParseError("union types are not supported on the Spark backend")
    raise TypeParseError(f"Unknown parameterized type: {name}")


def _top_level_colon(s: str) -> int:
    depth = 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == ":" and depth == 0:
            return i
    return -1


def _int_param(s: str, what: str) -> int:
    try:
        return int(s.strip())
    except ValueError:
        raise TypeParseError(f"Invalid {what}: {s}") from None


@dataclass
class Field:
    """A named, typed column (reference: data_types.rs:40-65)."""

    name: str
    data_type: str
    nullable: bool = True
    description: Optional[str] = None
    spark_type: T.DataType = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self.spark_type = parse_data_type(self.data_type)

    def to_struct_field(self) -> T.StructField:
        metadata = {"description": self.description} if self.description else {}
        return T.StructField(self.name, self.spark_type, self.nullable, metadata)


def _require_name(item: dict) -> str:
    if "name" not in item:
        raise TypeParseError(
            f"schema field entry is missing 'name': {item!r}"
        )
    return item["name"]


def parse_fields(raw: list) -> list[Field]:
    """Parse a YAML-shaped list of field dicts into Field objects."""
    out: list[Field] = []
    for item in raw:
        if isinstance(item, Field):
            out.append(item)
            continue
        if not isinstance(item, dict):
            raise TypeParseError(f"Field entry must be a mapping, got: {item!r}")
        # old-format field dicts say "type" instead of "data_type" (and
        # carry an ignored "metadata" map) — reference keeps the alias
        dtype = item.get("data_type", item.get("type"))
        if dtype is None:
            raise TypeParseError(f"Field entry missing data_type: {item!r}")
        out.append(
            Field(
                name=_require_name(item),
                data_type=str(dtype),
                nullable=bool(item.get("nullable", True)),
                description=item.get("description"),
            )
        )
    return out


def fields_to_struct(fields: list[Field]) -> T.StructType:
    return T.StructType([f.to_struct_field() for f in fields])

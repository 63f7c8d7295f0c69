"""Property-based tests for the type-string grammar (hypothesis)."""

import pyspark.sql.types as T
from hypothesis import given, settings
from hypothesis import strategies as st

from aqueducts_spark.types import TypeParseError, parse_data_type

SIMPLE = [
    "bool", "boolean", "int8", "int16", "int32", "int", "integer", "int64",
    "long", "uint8", "uint16", "uint32", "uint64", "float32", "float",
    "float64", "double", "string", "utf8", "large_string", "large_utf8",
    "binary", "large_binary", "date32", "date", "date64",
]

simple_types = st.sampled_from(SIMPLE)


@st.composite
def type_strings(draw, depth=0):
    if depth >= 3:
        return draw(simple_types)
    choice = draw(st.integers(0, 6 if depth < 2 else 0))
    if choice == 0:
        return draw(simple_types)
    if choice == 1:
        return f"list<{draw(type_strings(depth + 1))}>"
    if choice == 2:
        p = draw(st.integers(1, 38))
        s = draw(st.integers(0, min(p, 18)))
        return f"decimal<{p},{s}>"
    if choice == 3:
        n = draw(st.integers(1, 3))
        fields = ",".join(
            f"f{i}:{draw(type_strings(depth + 1))}" for i in range(n)
        )
        return f"struct<{fields}>"
    if choice == 4:
        return f"map<{draw(simple_types)},{draw(type_strings(depth + 1))}>"
    if choice == 5:
        return f"fixed_list<{draw(type_strings(depth + 1))},{draw(st.integers(1, 10))}>"
    return f"large_list<{draw(type_strings(depth + 1))}>"


@given(type_strings())
@settings(max_examples=200, deadline=None)
def test_every_generated_type_parses_to_spark_type(s):
    t = parse_data_type(s)
    assert isinstance(t, T.DataType)


@given(type_strings().filter(lambda s: "struct" not in s))
@settings(max_examples=100, deadline=None)
def test_parsing_is_deterministic_and_case_insensitive(s):
    # type KEYWORDS are case-insensitive; struct field names are data
    # and correctly preserve case, so structs are excluded here
    assert parse_data_type(s) == parse_data_type(s.upper())


@given(st.text(min_size=1, max_size=30).filter(lambda s: "<" not in s and ">" not in s))
@settings(max_examples=200, deadline=None)
def test_garbage_never_crashes_only_raises(s):
    if s.strip().lower() in SIMPLE:
        parse_data_type(s)
        return
    try:
        parse_data_type(s)
    except TypeParseError:
        pass  # the only acceptable failure mode


@given(type_strings())
@settings(max_examples=50, deadline=None)
def test_nested_in_list_roundtrip(s):
    outer = parse_data_type(f"list<{s}>")
    assert isinstance(outer, T.ArrayType)
    assert outer.elementType == parse_data_type(s)

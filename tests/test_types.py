import pyspark.sql.types as T
import pytest

from aqueducts_spark.types import Field, TypeParseError, parse_data_type


@pytest.mark.parametrize(
    "s,expected",
    [
        ("string", T.StringType()),
        ("utf8", T.StringType()),
        ("large_utf8", T.StringType()),
        ("bool", T.BooleanType()),
        ("int8", T.ByteType()),
        ("int16", T.ShortType()),
        ("int", T.IntegerType()),
        ("integer", T.IntegerType()),
        ("int32", T.IntegerType()),
        ("long", T.LongType()),
        ("int64", T.LongType()),
        ("uint8", T.ShortType()),
        ("uint32", T.LongType()),
        ("uint64", T.DecimalType(20, 0)),
        ("float", T.FloatType()),
        ("float32", T.FloatType()),
        ("double", T.DoubleType()),
        ("float64", T.DoubleType()),
        ("binary", T.BinaryType()),
        ("fixed_binary<16>", T.BinaryType()),
        ("date", T.DateType()),
        ("date32", T.DateType()),
        ("decimal<10,2>", T.DecimalType(10, 2)),
        ("timestamp<millisecond,UTC>", T.TimestampType()),
        ("timestamp<ms>", T.TimestampNTZType()),
        ("time32<ms>", T.LongType()),
        ("time64<ns>", T.LongType()),
        ("duration<ms>", T.DayTimeIntervalType()),
        ("interval<year_month>", T.YearMonthIntervalType()),
        ("list<string>", T.ArrayType(T.StringType())),
        ("large_list<int32>", T.ArrayType(T.IntegerType())),
        ("fixed_list<int32,3>", T.ArrayType(T.IntegerType())),
        ("list<list<int>>", T.ArrayType(T.ArrayType(T.IntegerType()))),
        ("map<string,int32>", T.MapType(T.StringType(), T.IntegerType())),
        ("dictionary<int32,string>", T.StringType()),
        (
            "struct<name:string,age:int32>",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("age", T.IntegerType()),
                ]
            ),
        ),
        (
            "struct<point:struct<x:double,y:double>,tags:list<string>>",
            T.StructType(
                [
                    T.StructField(
                        "point",
                        T.StructType(
                            [
                                T.StructField("x", T.DoubleType()),
                                T.StructField("y", T.DoubleType()),
                            ]
                        ),
                    ),
                    T.StructField("tags", T.ArrayType(T.StringType())),
                ]
            ),
        ),
    ],
)
def test_parse_ok(s, expected):
    assert parse_data_type(s) == expected


@pytest.mark.parametrize(
    "s",
    [
        "nope",
        "list<>",
        "list<string,int>",
        "decimal<10>",
        "decimal<39,2>",
        "decimal256<76,2>",
        "time32<ns>",
        "time64<ms>",
        "timestamp<>",
        "union<int,string>",
        "struct<name>",
        "map<string>",
        "list<string",
    ],
)
def test_parse_errors(s):
    with pytest.raises(TypeParseError):
        parse_data_type(s)


def test_case_insensitive_and_whitespace():
    assert parse_data_type(" STRING ") == T.StringType()
    assert parse_data_type("List< String >") == T.ArrayType(T.StringType())


def test_field_roundtrip():
    f = Field(name="a", data_type="list<int32>", nullable=False)
    sf = f.to_struct_field()
    assert sf.name == "a"
    assert sf.dataType == T.ArrayType(T.IntegerType())
    assert sf.nullable is False

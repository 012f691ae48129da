"""Pipeline algebra tests, mirroring the reference's operator suites:
ChainingOperationsTest.scala:9-49 (F9), TypeMappingTest.scala (F8),
ReadmeTest.scala:54-70 (F1). Fixture shapes from FIXTURES.md.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from kafka_streams_plumber_spark import Pipeline
from kafka_streams_plumber_spark.operators.pipeline import from_kv, to_kv


def kv_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_filter_keeps_and_drops(spark):
    df = kv_df(spark, [("a", 1), ("b", 2), ("c", 3)], "key string, value int")
    out = Pipeline().filter(lambda k, v: v >= 2)(df)
    assert sorted(r.key for r in out.collect()) == ["b", "c"]


def test_map_values_key_unchanged(spark):
    df = kv_df(spark, [("a", 1), ("b", 2)], "key string, value int")
    out = Pipeline().map_values(lambda v: v * 10)(df)
    assert sorted((r.key, r.value) for r in out.collect()) == [("a", 10), ("b", 20)]


def test_map_reshapes_both(spark):
    # F8 long/long: (111,222) -> (333,444)
    df = kv_df(spark, [(111, 222)], "key long, value long")
    out = Pipeline().map(lambda k, v: (k + 222, v + 222))(df)
    assert out.collect() == [Row(key=333, value=444)]


def test_map_must_return_pair(spark):
    df = kv_df(spark, [("a", 1)], "key string, value int")
    with pytest.raises(ValueError, match="exactly"):
        Pipeline().map(lambda k, v: k)(df)


def test_chaining_f9(spark):
    """6-step chain with every drop path (ChainingOperationsTest.scala:16-49):
    mapValues(i*2) -> filter(>=16) -> mapValues(rename i->j) -> filter(<=32)
    -> filter(len(key)==5 or key null) -> map(upper(key)) -> filter(last byte == 'O')
    """
    rows = [
        ("hello", Row(i=8)),    # -> ("HELLO", {16})
        ("hellooo", Row(i=8)),  # dropped: len != 5
        ("hellp", Row(i=8)),    # dropped: last byte P
        ("hello", Row(i=7)),    # dropped: 14 < 16
        ("hello", Row(i=17)),   # dropped: 34 > 32
    ]
    df = kv_df(spark, rows, "key string, value struct<i:int>")
    p = (
        Pipeline()
        .map_values(lambda v: F.struct((v["i"] * 2).alias("i")))
        .filter(lambda k, v: v["i"] >= 16)
        .map_values(lambda v: F.struct(v["i"].alias("j")))
        .filter(lambda k, v: v["j"] <= 32)
        .filter(lambda k, v: k.isNull() | (F.length(k) == 5))
        .map(lambda k, v: (F.upper(k), v))
        .filter(lambda k, v: F.substring(k, -1, 1) == "O")
    )
    out = p(df).collect()
    assert out == [Row(key="HELLO", value=Row(j=16))]


def test_readme_demo_f1(spark):
    """README transform (ReadmeTest.scala:54-70): nested record in,
    restructured record out — valid = not notValid, name = lower(person.name),
    fingers = lh + rh."""
    rows = [
        (None, Row(redundantField=7, notValid=True, fingers_lh=7, fingers_rh=7,
                   person=Row(name="roEl", species="human"))),
        (None, Row(redundantField=127, notValid=False, fingers_lh=1, fingers_rh=3,
                   person=Row(name="ROELLL", species="homo sapiens"))),
    ]
    schema = (
        "key string, value struct<redundantField:long, notValid:boolean, "
        "fingers_lh:long, fingers_rh:long, "
        "person:struct<name:string, species:string>>"
    )
    df = kv_df(spark, rows, schema)
    p = Pipeline().map_values(
        lambda v: F.struct(
            (~v["notValid"]).alias("valid"),
            F.lower(v["person"]["name"]).alias("name"),
            (v["fingers_lh"] + v["fingers_rh"]).alias("fingers"),
        )
    )
    out = {r.value.name: r.value for r in p(df).collect()}
    assert out["roel"] == Row(valid=False, name="roel", fingers=14)
    assert out["roelll"] == Row(valid=True, name="roelll", fingers=4)


def test_void_key_passthrough(spark):
    # F8 void key: input without key column flows with NULL key
    df = spark.createDataFrame([(Row(l=12345),)], "value struct<l:long>")
    out = Pipeline().map_values(lambda v: F.lit(0x1337C0DE).cast("long"))(df)
    assert out.collect() == [Row(key=None, value=0x1337C0DE)]


def test_flat_map_values_explode(spark):
    df = kv_df(spark, [("a", 2), ("b", 0)], "key string, value int")
    out = Pipeline().flat_map_values(
        lambda v: F.array_repeat(v, v)
    )(df)
    assert sorted((r.key, r.value) for r in out.collect()) == [("a", 2), ("a", 2)]


def test_python_udf_steps(spark):
    df = kv_df(spark, [("k", "v"), ("x", "drop")], "key string, value string")
    p = (
        Pipeline()
        .filter_py(lambda k, v: v != "drop")
        .map_py(lambda k, v: ("o" + k, "o" + v), "string", "string")
    )
    assert p(df).collect() == [Row(key="ok", value="ov")]


def test_to_kv_from_kv_roundtrip(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, x double")
    kv = to_kv(df, key="id")
    assert kv.columns == ["key", "value"]
    back = from_kv(kv)
    row = back.collect()[0]
    assert (row.key, row.name, row.x) == (1, "a", 2.0)


def test_filter_sql_string(spark):
    df = kv_df(spark, [("a", 1), ("b", 5)], "key string, value int")
    out = Pipeline().filter("value > 3")(df)
    assert out.collect() == [Row(key="b", value=5)]


def test_pandas_step_matches_row_python_step(spark):
    df = spark.createDataFrame(
        [(i, f"name-{i}") for i in range(100)], "key long, value string"
    )
    vec = Pipeline().map_values_pandas(lambda s: s.str.upper(), "string")
    row = Pipeline().map_values_py(lambda v: v.upper(), "string")
    assert sorted(map(tuple, vec(df).collect())) == sorted(map(tuple, row(df).collect()))

"""CSV lines -> structured Avro records (reference:
examples/csv/example.lua). The Lua pattern
``^(%P+),([^,]+),([^,]*),(%d+)$`` becomes one regexp gate + split:
rows that don't match the 4-field shape are dropped, an empty third
column becomes NULL, and the numeric fourth column is cast to long."""

import pyspark.sql.functions as F

from kafka_streams_plumber_spark import Pipeline

# login (no punctuation beyond word chars/dash), created_at, optional
# blog, digit repo count — mirrors the Lua pattern's character classes.
LINE_RE = r"^([\w\-]+),([^,]+),([^,]*),(\d+)$"


def pipeline():
    return (
        Pipeline()
        .filter(lambda k, v: v.rlike(LINE_RE))
        .map_values(lambda v: F.split(v, ",", -1))
        .map_values(
            lambda cols: F.struct(
                cols[0].alias("login"),
                cols[1].alias("created_at"),
                F.nullif(cols[2], F.lit("")).alias("blog"),
                cols[3].cast("long").alias("public_repos"),
            )
        )
    )

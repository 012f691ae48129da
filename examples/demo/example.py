"""The README/demo transform (reference: examples/demo/example.lua):
restructure an 'undesired' record into the desired shape — negate a
flag, lowercase a nested name, add two counts. Expressed as native
Column expressions (no UDF)."""

import pyspark.sql.functions as F

from kafka_streams_plumber_spark import Pipeline


def pipeline():
    return Pipeline().map_values(
        lambda v: F.struct(
            (~v["notValid"]).alias("valid"),
            F.lower(v["person"]["name"]).alias("name"),
            (v["fingers_lh"] + v["fingers_rh"]).alias("fingers"),
        )
    )

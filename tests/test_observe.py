"""Pipeline ledger (plans/observe.py): metrics ride the existing job."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_plumber_spark.plans.observe import (
    PipelineLedger,
    observed_counts,
)


def test_ledger_counts_each_stage_in_one_job(spark):
    ledger = PipelineLedger()
    df = spark.range(100).withColumn("v", F.col("id") % 10)
    df = ledger.checkpoint(df, "raw", extra={"v_sum": F.sum("v")})
    df = df.filter(F.col("v") < 5)
    df = ledger.checkpoint(df, "filtered")
    df.write.format("noop").mode("overwrite").save()

    rep = ledger.report()
    assert rep["raw"]["rows"] == 100
    assert rep["raw"]["v_sum"] == sum(i % 10 for i in range(100))
    assert rep["filtered"]["rows"] == 50


def test_ledger_rejects_duplicate_stage_names(spark):
    import pytest

    ledger = PipelineLedger()
    df = ledger.checkpoint(spark.range(5), "a")
    with pytest.raises(ValueError):
        ledger.checkpoint(df, "a")


def test_observed_counts_one_off(spark):
    df, obs = observed_counts(spark.range(42), "n")
    df.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == 42


def test_ledger_persist_guards_multi_scan_consumers(spark):
    """A consumer that scans the observed frame twice (self-join) would
    double-count a bare observation; persist=True materializes the
    metrics node once, so the ledger stays exact."""
    ledger = PipelineLedger()
    df = ledger.checkpoint(spark.range(100), "src", persist=True)
    joined = df.alias("a").join(
        df.alias("b"), F.col("a.id") == (99 - F.col("b.id"))
    )
    joined.write.format("noop").mode("overwrite").save()
    assert ledger.report()["src"]["rows"] == 100
    df.unpersist()

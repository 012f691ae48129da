"""The flagship streaming workflow, end to end and broker-free: the
examples/demo transform run through the FULL PlumberJob lifecycle —
golden-fixture verification gate -> streaming source -> transform ->
conform to the output schema -> sink -> graceful stop — exactly the
path the reference's `examples/demo` exercises against Kafka
(Plumber.scala:26-86), with the transport swapped for a file-JSON
source and a memory sink via PlumberJob's source_factory/sink_factory
hooks. Everything that defines the job (the refuse-to-start gate, the
pipeline, conform, the streaming machinery) is the production code
path.

Run: ``bash examples/streaming/example.sh`` (also driven in CI by
tests/test_example_streaming.py).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from kafka_streams_plumber_spark import Pipeline
from kafka_streams_plumber_spark.sources.serde import parse_type, spark_type_of
from kafka_streams_plumber_spark.streaming.runner import PlumberJob

DEMO_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "demo")
IN_AVSC = os.path.abspath(os.path.join(DEMO_DIR, "example.undesired.avsc"))
OUT_AVSC = os.path.abspath(os.path.join(DEMO_DIR, "example.desired.avsc"))


def pipeline() -> Pipeline:
    """Same transform as examples/demo/example.py (reference:
    examples/demo/example.lua)."""
    return Pipeline().map_values(
        lambda v: F.struct(
            (~v["notValid"]).alias("valid"),
            F.lower(v["person"]["name"]).alias("name"),
            (v["fingers_lh"] + v["fingers_rh"]).alias("fingers"),
        )
    )


def fixtures():
    return [
        (None, {
            "redundantField": 7,
            "notValid": True,
            "person": {"name": "roEl", "species": "human"},
            "fingers_lh": 7,
            "fingers_rh": 7,
        }),
        (None, {
            "redundantField": 127,
            "notValid": False,
            "person": {"name": "ROELLL", "species": "homo sapiens"},
            "fingers_lh": 1,
            "fingers_rh": 3,
        }),
    ]


def expectations():
    return [
        (None, {"valid": False, "name": "roel", "fingers": 14}),
        (None, {"valid": True, "name": "roelll", "fingers": 4}),
    ]


def run(spark: SparkSession, *, query_name: str = "demo_stream_out"):
    """Build the job, pass the golden gate, stream the fixture records
    from a file-JSON source into a memory sink, and return the sink
    rows (list of (valid, name, fingers) Rows)."""
    in_value = parse_type(f"avro={IN_AVSC}")
    out_value = parse_type(f"avro={OUT_AVSC}")
    value_schema = spark_type_of(in_value)

    workdir = tempfile.mkdtemp(prefix="ksps-streaming-example-")
    in_dir = os.path.join(workdir, "in")
    os.makedirs(in_dir)
    # the "topic": one JSON file per producer batch, records = fixture
    # values (keys are void, exactly like the demo's Kafka run)
    with open(os.path.join(in_dir, "batch-0.json"), "w") as f:
        for _k, v in fixtures():
            f.write(json.dumps(v) + "\n")

    def source_factory(sp: SparkSession):
        raw = (
            sp.readStream.schema(value_schema)
            .option("maxFilesPerTrigger", "1")
            .json(in_dir)
        )
        # same typed (key, value) contract kafka_source decodes to
        return raw.select(
            F.lit(None).cast("string").alias("key"),
            F.struct(*[F.col(c) for c in raw.columns]).alias("value"),
        )

    def sink_factory(out):
        return (
            out.writeStream.format("memory")
            .queryName(query_name)
            .option(
                "checkpointLocation", os.path.join(workdir, "checkpoint")
            )
            .start()
        )

    job = PlumberJob(
        spark=spark,
        pipeline=pipeline(),
        brokers="",  # transport is the factory pair — no broker
        source_topic="example-in",
        sink_topic="example-out",
        input_key=parse_type("void"),
        input_value=in_value,
        output_key=parse_type("void"),
        output_value=out_value,
        checkpoint=os.path.join(workdir, "checkpoint"),
        fixtures=fixtures(),
        expectations=expectations(),
        source_factory=source_factory,
        sink_factory=sink_factory,
    )
    # run() executes the golden gate first (preflight: fixtures through
    # the production transform; VerificationError refuses to stream)
    query = job.run(await_termination=False)
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    rows = spark.sql(
        f"SELECT value.* FROM {query_name} ORDER BY value.name"
    ).collect()
    shutil.rmtree(workdir, ignore_errors=True)
    return rows


def main() -> None:
    from kafka_streams_plumber_spark.plans.session import get_spark

    spark = get_spark(
        "streaming-example", master="local[4]", shuffle_partitions=4
    )
    rows = run(spark)
    print("== streamed output (memory sink) ==")
    for r in rows:
        print(dict(r.asDict()))
    want = sorted(
        (e["name"], e["valid"], e["fingers"]) for _k, e in expectations()
    )
    got = sorted((r["name"], r["valid"], r["fingers"]) for r in rows)
    assert got == want, (got, want)
    print("streamed output matches the golden expectations")
    spark.stop()


if __name__ == "__main__":
    main()

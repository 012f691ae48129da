"""CLI mirroring the reference's flags (Plumber.scala:88-145):

    -i/--source-topic  -o/--sink-topic  -d/--source-types
    -s/--sink-types    -l/--script      -p/--properties
    -t/--test-script   -D/--dry-run

The script is a Python module (the Lua analog) that must define
``pipeline() -> Pipeline``; a test script additionally defines
``fixtures() -> list[(k, v)]`` and ``expectations() -> list[(k, v)]``
(pb.forInputs / pb.expectOutputs parity).

Type specs are comma-separated key,value pairs like the reference:
``-d string,avro=in.avsc -s void,long`` (TypeConversions.scala:42-51).

Usage:
    python -m kafka_streams_plumber_spark.cli \
        -i in-topic -o out-topic -d string,string -s string,string \
        -l my_pipeline.py -t my_pipeline_test.py -D
"""

from __future__ import annotations

import argparse
import importlib.util
import sys

from kafka_streams_plumber_spark.plans.session import get_spark
from kafka_streams_plumber_spark.sources.serde import parse_type
from kafka_streams_plumber_spark.streaming.runner import PlumberJob
from kafka_streams_plumber_spark.testing.verify import VerificationError


def _load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    if spec is None or spec.loader is None:
        raise SystemExit(f"cannot load script {path}")
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except FileNotFoundError:
        raise SystemExit(f"script not found: {path}") from None
    return mod


def _parse_kv_types(spec: str):
    """``key,value`` pair, or a bare value type with an implicit void key
    (TypeConversions.scala:42-51: ``VPattern(v) => (VoidType, v)``)."""
    parts = spec.split(",", 1)
    if len(parts) == 1:
        return parse_type("void"), parse_type(parts[0])
    return parse_type(parts[0]), parse_type(parts[1])


def _load_properties(path: str) -> dict[str, str]:
    """Java-style .properties (PropertiesHelpers.scala:9-40)."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            if "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = v.strip()
    return out


#: Spark connector options that legitimately CONTAIN dots — without
#: this allowlist the dotted-keys-are-client-configs rule would give
#: them a ``kafka.`` prefix and the connector would silently drop them
#: as unknown client configs.
_DOTTED_CONNECTOR_OPTIONS = frozenset(
    {
        "fetchOffset.numRetries",
        "fetchOffset.retryIntervalMs",
        "kafkaConsumer.pollTimeoutMs",
    }
)

#: Kafka CLIENT configs that are dot-free — without this allowlist the
#: dot-free-keys-are-connector-options rule would pass them un-prefixed
#: and the Spark source/sink would silently ignore them.
_DOTFREE_CLIENT_CONFIGS = frozenset({"acks", "retries"})


def _kafka_options(props: dict[str, str]) -> dict[str, str]:
    """Map reference-style .properties entries to Spark Kafka
    DataSource options.

    The reference hands its whole properties file to the Kafka clients
    (PropertiesHelpers.scala:9-40; Plumber.scala:62-74), so users write
    plain client configs (``security.protocol``, ``fetch.min.bytes``).
    Spark's connector namespaces client configs under a ``kafka.``
    prefix and keeps its own camelCase options un-prefixed — an
    UN-prefixed client config is silently ignored by the connector.
    Rule: ``bootstrap.servers`` / ``schema.registry.url`` are consumed
    by the CLI itself; keys already ``kafka.``-prefixed pass through
    untouched; the known DOTTED connector options
    (``fetchOffset.*``, ``kafkaConsumer.pollTimeoutMs``) pass as-is;
    the known dot-free CLIENT configs (``acks``, ``retries``) gain the
    ``kafka.`` prefix; other dotted keys are java-client configs and
    gain the ``kafka.`` prefix; other dot-free keys
    (``maxOffsetsPerTrigger``, ``minPartitions``, ...) are connector
    options and pass as-is. A key this table can't classify the way
    you meant can always be written with an explicit ``kafka.``
    prefix (client config) or its exact connector spelling — both
    pass through verbatim."""
    out: dict[str, str] = {}
    for k, v in props.items():
        if k in ("bootstrap.servers", "schema.registry.url"):
            continue
        if k in _DOTFREE_CLIENT_CONFIGS:
            out[f"kafka.{k}"] = v
        elif (
            k.startswith("kafka.")
            or k in _DOTTED_CONNECTOR_OPTIONS
            or "." not in k
        ):
            out[k] = v
        else:
            out[f"kafka.{k}"] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="plumber-spark",
        description="Stateless Kafka->Kafka pipeline runner (PySpark)",
    )
    ap.add_argument("-i", "--source-topic", required=True)
    ap.add_argument("-o", "--sink-topic", required=True)
    ap.add_argument("-d", "--source-types", required=True, help="key,value e.g. string,avro=in.avsc")
    ap.add_argument("-s", "--sink-types", required=True, help="key,value e.g. void,long")
    ap.add_argument("-l", "--script", required=True, help="python module defining pipeline()")
    ap.add_argument("-p", "--properties", default=None, help="java properties file (bootstrap.servers etc.)")
    ap.add_argument("-t", "--test-script", default=None, help="module defining fixtures()/expectations()")
    ap.add_argument("-D", "--dry-run", action="store_true", help="verify then exit without streaming")
    ap.add_argument("--brokers", default=None, help="override bootstrap servers")
    ap.add_argument("--checkpoint", default="/tmp/ksps-checkpoint")
    ap.add_argument(
        "--starting-offsets",
        default="earliest",
        help="Kafka startingOffsets (earliest/latest/JSON) — a "
        ".properties entry of that name is rejected, this flag owns it",
    )
    ap.add_argument("--confluent-framing", action="store_true")
    ap.add_argument(
        "--schema-registry",
        default=None,
        help="Schema Registry URL for plain `avro` types "
        "(or schema.registry.url in -p properties)",
    )
    args = ap.parse_args(argv)

    props = _load_properties(args.properties) if args.properties else {}
    brokers = args.brokers or props.get("bootstrap.servers", "localhost:9092")
    registry_url = args.schema_registry or props.get("schema.registry.url")
    registry = None
    if registry_url:
        from kafka_streams_plumber_spark.sources.registry import (
            HttpSchemaRegistryClient,
        )

        registry = HttpSchemaRegistryClient(registry_url)

    ik, iv = _parse_kv_types(args.source_types)
    ok, ov = _parse_kv_types(args.sink_types)

    mod = _load_module(args.script, "ksps_user_pipeline")
    if not hasattr(mod, "pipeline"):
        raise SystemExit(f"{args.script} must define pipeline() -> Pipeline")
    pipe = mod.pipeline()

    fixtures, expectations = [], []
    if args.test_script:
        tmod = _load_module(args.test_script, "ksps_user_test")
        fixtures = list(tmod.fixtures())
        expectations = list(tmod.expectations())

    spark = get_spark("plumber-spark")
    job = PlumberJob(
        spark=spark,
        pipeline=pipe,
        brokers=brokers,
        source_topic=args.source_topic,
        sink_topic=args.sink_topic,
        input_key=ik,
        input_value=iv,
        output_key=ok,
        output_value=ov,
        checkpoint=args.checkpoint,
        starting_offsets=args.starting_offsets,
        confluent_framing=args.confluent_framing,
        fixtures=fixtures,
        expectations=expectations,
        kafka_options=_kafka_options(props),
        registry=registry,
    )
    try:
        job.run(dry_run=args.dry_run)
    except VerificationError as e:
        # refuse to start on golden mismatch (Plumber.scala:43-46, exit 1)
        print(f"verification failed:\n{e}", file=sys.stderr)
        return 1
    if args.dry_run:
        print("verification passed; dry run — not starting streaming job")
    return 0


if __name__ == "__main__":
    sys.exit(main())

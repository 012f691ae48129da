#!/bin/sh
# Dry-run (-D): verify the golden fixtures and exit — no broker needed.
# Drop -D to start the streaming job against a real Kafka cluster.
cd "$(dirname "$0")"
# repo-root import without installation (examples live two levels down)
PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PYTHONPATH
exec python -m kafka_streams_plumber_spark.cli \
  -i example-in -o example-out \
  -d avro=example.undesired.avsc -s avro=example.desired.avsc \
  -l example.py -t example.test.py -D "$@"

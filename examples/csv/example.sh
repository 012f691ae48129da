#!/bin/sh
cd "$(dirname "$0")"
exec python -m kafka_streams_plumber_spark.cli \
  -i example-in -o example-out \
  -d string -s avro=example.avsc \
  -l example.py -t example.test.py -D "$@"

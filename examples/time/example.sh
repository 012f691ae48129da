#!/bin/sh
cd "$(dirname "$0")"
exec python -m kafka_streams_plumber_spark.cli \
  -i example-in -o example-out \
  -d string,string -s long,long \
  -l example.py -t example.test.py -D "$@"

#!/bin/sh
cd "$(dirname "$0")"
# repo-root import without installation (examples live two levels down)
PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PYTHONPATH
exec python -m kafka_streams_plumber_spark.cli \
  -i example-in -o example-out \
  -d string,string -s long,long \
  -l example.py -t example.test.py -D "$@"

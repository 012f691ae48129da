#!/bin/sh
# Full PlumberJob lifecycle without a broker: golden-fixture gate ->
# file-JSON streaming source -> transform -> conform -> memory sink ->
# assert against the expectations. Same production code path as the
# Kafka run; only the transport is swapped via source_factory/sink_factory.
cd "$(dirname "$0")"
PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PYTHONPATH
exec python example.py "$@"

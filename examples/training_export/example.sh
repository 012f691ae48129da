#!/bin/sh
# Exports packed, ordered, manifested training shards from sf0.001.
cd "$(dirname "$0")/../.."
exec env PYTHONPATH=. python examples/training_export/example.py "$@"

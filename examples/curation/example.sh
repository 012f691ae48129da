#!/bin/sh
# Runs the curation pipeline over the smallest test scale factor.
cd "$(dirname "$0")/../.."
exec env PYTHONPATH=. python examples/curation/example.py "$@"

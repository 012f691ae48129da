#!/bin/sh
# Runs the crawl curation pipeline (self-synthesized WARC by default).
cd "$(dirname "$0")/../.."
exec env PYTHONPATH=. python examples/crawl/example.py "$@"

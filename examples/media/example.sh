#!/bin/sh
# Runs the multimodal curation pipeline (self-synthesized corpus).
cd "$(dirname "$0")/../.."
exec env PYTHONPATH=. python examples/media/example.py "$@"

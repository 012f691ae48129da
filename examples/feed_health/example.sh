#!/bin/sh
# One-screen feed-health panel over the synthetic events feed.
exec python "$(dirname "$0")/example.py" "${1:-/root/testdata/sf0.001}"

#!/bin/sh
# One-screen feed-drift monitor over the driver-generated parquet tables.
exec python "$(dirname "$0")/example.py" "${1:-/root/testdata/sf0.001}"

#!/usr/bin/env bash
# Corpus-scale correctness gate, regenerated at HEAD in one command:
#   tools/verify_sf.sh target/testdata/sf1 CORRECTNESS_sf1.json
#   tools/verify_sf.sh target/testdata/sf3 CORRECTNESS_sf3.json
# Runs the full 190-op Verify dump at the given SF dir, then the DuckDB
# compare, writing the driver-schema per-op artifact. Exit 0 = all green.
set -euo pipefail
SF=${1:?usage: verify_sf.sh <sf-dir> <artifact.json>}
OUT=${2:?usage: verify_sf.sh <sf-dir> <artifact.json>}
DUMP=$(mktemp -d /tmp/graft_verify_sf.XXXXXX)
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  sbt -batch "runMain graft.Verify $SF $DUMP"
python3 "$(dirname "$0")/compare.py" "$SF" "$DUMP" --json="$OUT"

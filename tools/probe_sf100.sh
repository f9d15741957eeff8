#!/bin/bash
# Solo sf100 decade probe: ONE query per JVM (sf100 points are only
# comparable solo — a bundle member inherits its predecessor's
# un-reclaimed checkpoint blocks, measured round 12), 64 g heap, tmpfs
# shuffle scratch cleared first (killed JVMs strand tens of GB there).
# Evidence lands in probes_r14.jsonl BY THE RUNNER (graft.Probe appends
# one JSON line per pass + a summary line) — PLANS.md cites that file.
#
# Usage: tools/probe_sf100.sh <query> [passes=2] [sfdir=/tmp/sf100]
set -euo pipefail
q="$1"; passes="${2:-2}"; sfdir="${3:-/tmp/sf100}"
rm -rf /dev/shm/spark-local 2>/dev/null || true
cd "$(dirname "$0")/.."
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR="$sfdir" \
  SPARK_GRAFT_PROBE_OUT=probes_r14.jsonl SPARK_GRAFT_PROBE_PASSES="$passes" \
  sbt -batch "runMain graft.Probe $q"

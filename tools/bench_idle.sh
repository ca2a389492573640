#!/bin/bash
# Launcher for idle-baseline bench runs: sample /proc/loadavg BEFORE
# any JVM spins up and stamp it through the env, so Bench's <0.2 idle
# gate reflects background host state rather than sbt's own startup
# burst (which keeps the 1-min average elevated on most attempts —
# round-7 notes). Dev-only tool, not part of the Scala library.
set -euo pipefail
cd "$(dirname "$0")/.."
SPARK_GRAFT_LOADAVG_LAUNCHER=$(cut -d' ' -f1-3 /proc/loadavg | tr ' ' ',')
export SPARK_GRAFT_LOADAVG_LAUNCHER
echo "launcher loadavg: $SPARK_GRAFT_LOADAVG_LAUNCHER"
exec sbt -batch "runMain graft.Bench" "$@"

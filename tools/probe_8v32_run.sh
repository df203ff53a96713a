#!/bin/bash
# Interleaved 8v32 probe driver (VERDICT r13 #7): alternates one-repeat
# probe processes between 32 and 8 cores so the host's multi-x slow
# phases land on both arms; per-arm MIN over the rounds is the
# phase-robust estimator (noise here is one-sided).
# Usage: bash tools/probe_8v32_run.sh [rounds] >> /tmp/probe_8v32.log
cd "$(dirname "$0")/.."
ROUNDS=${1:-4}
for r in $(seq 1 "$ROUNDS"); do
  for c in 32 8; do
    echo "=== round $r cpus $c ==="
    SPARK_GRAFT_CPUS=$c PYTHONPATH=. python tools/probe_8v32_sf1.py --repeats 1 2>/dev/null
  done
done

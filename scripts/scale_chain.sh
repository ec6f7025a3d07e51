#!/bin/bash
# Run the three phase-isolated scale-bench probes serially on the TPU,
# one process each (an axon fault wedges a process, not the chip), and
# log one JSON line per phase to $LOG.  See scripts/scale_probe.py.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export CALIBR8_X64=0
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
N=${1:-64}
REFS=${2:-3}
LOG=${LOG:-/tmp/scale_chain.log}
: > "$LOG"
for phase in assembly newton adjoint; do
  echo "=== phase $phase n=$N refs=$REFS $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 3600 python scripts/scale_probe.py "$phase" "$N" "$REFS" \
    >> "$LOG" 2> "/tmp/scale_${phase}.err"
  rc=$?
  echo "=== rc=$rc" >> "$LOG"
done
echo "=== DONE $(date -u +%H:%M:%S)" >> "$LOG"

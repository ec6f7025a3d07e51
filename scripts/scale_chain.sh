#!/bin/bash
# Seize the next tunnel up-window for the scale record: poll until the
# TPU answers, then run the three phase-isolated scale probes (one
# process each — an axon fault wedges a process, not the chip), with a
# lean-restart retry when newton/adjoint fail (the 1.1M-DOF MG runs sit
# right at the 16 GB HBM edge), merge the row into .bench_results, and
# finish with a full cache-warming bench run.  See scripts/scale_probe.py.
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
note() { echo "=== $* $(date -u +%H:%M:%S)" >> "$LOG"; }

while ! timeout 120 python -c "import jax; assert jax.devices()" \
    >/dev/null 2>&1; do
  note "tunnel down"
  sleep 90
done
note "tunnel up"

run_phase() { # phase n refs [ENV=VAL...]
  local phase=$1 n=$2 refs=$3
  shift 3
  note "phase $phase n=$n refs=$refs $*"
  timeout 3600 env "$@" python scripts/scale_probe.py "$phase" "$n" \
    "$refs" >> "$LOG" 2> "/tmp/scale_${phase}.err"
  local rc=$?
  note "rc=$rc"
  return $rc
}

run_phase assembly "$N" "$REFS"
run_phase newton "$N" "$REFS" \
  || run_phase newton "$N" "$REFS" CALIBR8_BENCH_RESTART=30 \
  || run_phase newton 48 "$REFS"   # size bisect: chunked path still on
run_phase adjoint "$N" "$REFS" \
  || run_phase adjoint "$N" "$REFS" CALIBR8_BENCH_RESTART=30
python scripts/merge_scale_row.py "$N" "$LOG" >> "$LOG" 2>&1 \
  || note "merge failed"
note "launching full bench warm run"
timeout 14400 env CALIBR8_BENCH_DEADLINE=13500 python /root/repo/bench.py \
  > /tmp/bench_r3_full.log 2>&1
note "bench rc=$?"
note DONE

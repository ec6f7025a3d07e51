#!/bin/bash
# Consolidated TPU chain runner (round 5).  ONE entry point for every
# on-chip campaign; stages run strictly serially (ONE TPU process at a
# time — two at once produce UNAVAILABLE device errors).
#
# Usage:  scripts/tpu_chain.sh <stage> [stage ...]
#   LAUNCH VIA A COPY:  cp scripts/tpu_chain.sh /tmp/chain_run.sh &&
#   nohup /tmp/chain_run.sh <stages> &   — bash re-reads the script
#   file DURING execution, so editing the in-repo copy while a chain
#   runs corrupts the running shell (hit in round 5).
# Stages:
#   ab196     stencil-vs-gather A/B at ~196k elems (n=32, refs=2):
#             newton + adjoint each under CALIBR8_ELL_STENCIL=1/0.
#             Fast-turnaround root-cause bed for the r4j UNAVAILABLE.
#   profile32 V-cycle cost attribution at n=32 refs=2 (profile_mg).
#   profile64 V-cycle cost attribution at the scale mesh (n=64 refs=3).
#   scale64   1.1M-DOF newton + adjoint probes (restart=100, stall
#             recovery) -> merge_scale_row -> .bench_results/.
#   bench     full bench.py headline refresh (extended deadline).
#
# Conventions learned rounds 2-4 (CLAUDE.md):
#   * every stage runs scale_probe/profile in its OWN subprocess — an
#     axon kernel fault wedges the client for the rest of the process;
#   * retry once on failure after re-checking tunnel health;
#   * a missing gate log counts as done (the box restart wipes /tmp);
#   * phase JSON accumulates in $PHASELOG for merge_scale_row.
set -u
log=/tmp/r5_chain.log
PHASELOG=/tmp/scale_chain.log
exec >>"$log" 2>&1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo || exit 1

ts() { date +%H:%M:%S; }

wait_tpu() {
  local tries=0
  while ! timeout 240 python -c "import jax; assert jax.devices()" 2>/dev/null; do
    tries=$((tries + 1))
    echo "$(ts) tunnel down (try $tries)"
    sleep 90
  done
}

# run_probe <timeout_s> <logfile> <errfile> -- env assignments + cmd...
run_probe() {
  local to=$1 out=$2 err=$3 rc
  shift 3
  for attempt in 1 2; do
    wait_tpu
    echo "$(ts) run [$attempt]: $*"
    timeout "$to" env "$@" >> "$out" 2> "$err"
    rc=$?
    echo "$(ts) rc=$rc"
    [ $rc -eq 0 ] && return 0
    tail -2 "$err" | sed 's/^/    err: /'
    sleep 30
  done
  return 1
}

stage_ab196() {
  echo "$(ts) === stage ab196 ==="
  local ab=/tmp/ab196.log
  for sten in 1 0; do
    run_probe 5400 $ab /tmp/ab196_newton_s$sten.err \
      CALIBR8_X64=0 CALIBR8_ELL_STENCIL=$sten \
      python scripts/scale_probe.py newton 32 2
    run_probe 5400 $ab /tmp/ab196_adjoint_s$sten.err \
      CALIBR8_X64=0 CALIBR8_ELL_STENCIL=$sten CALIBR8_BENCH_RESTART=100 \
      python scripts/scale_probe.py adjoint 32 2
  done
  cp $ab /root/repo/.bench_results/ab196_r5.log
  echo "$(ts) ab196 done"
}

stage_profile32() {
  echo "$(ts) === stage profile32 ==="
  run_probe 7200 /tmp/profile_mg_n32.log /tmp/profile_mg_n32.err \
    CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=2 python scripts/profile_mg.py 32 2
  cp /tmp/profile_mg_n32.log /root/repo/.bench_results/profile_mg_n32.log
}

stage_profile64() {
  echo "$(ts) === stage profile64 ==="
  run_probe 10800 /tmp/profile_mg_n64.log /tmp/profile_mg_n64.err \
    CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=2 python scripts/profile_mg.py 64 3
  cp /tmp/profile_mg_n64.log /root/repo/.bench_results/profile_mg_n64.log
}

stage_scale64() {
  echo "$(ts) === stage scale64 ==="
  # seed the phase log from the committed copy after a /tmp wipe so
  # merge_scale_row still sees completed phases from earlier sessions
  if [ ! -f $PHASELOG ]; then
    cp /root/repo/.bench_results/scale_chain_r4.log $PHASELOG 2>/dev/null || true
  fi
  run_probe 10800 $PHASELOG /tmp/scale_newton_r5.err \
    CALIBR8_X64=0 CALIBR8_ELL_STENCIL=${SCALE_STENCIL:-1} \
    python scripts/scale_probe.py newton 64 3
  # restart=50 + host-orchestrated cycles: one cycle per dispatch
  # stays under the ~50-60 s axon dispatch ceiling; restart=100 in a
  # single dispatch is what killed every earlier scale adjoint rerun
  # CALIBR8_IR=1: mixed-precision refinement (f64 true residual +
  # f64 accumulator + shallow f32 correction solves) — the f32
  # relres floor for the transposed system (~1.7e-4) sits above the
  # 1e-4 tol
  run_probe 14400 $PHASELOG /tmp/scale_adjoint_r5.err \
    CALIBR8_X64=0 CALIBR8_IR=1 CALIBR8_ELL_STENCIL=${SCALE_STENCIL:-1} \
    python scripts/scale_probe.py adjoint 64 3 || {
      echo "$(ts) adjoint stencil failed twice; gather fallback"
      run_probe 14400 $PHASELOG /tmp/scale_adjoint_r5_gather.err \
        CALIBR8_X64=0 CALIBR8_IR=1 CALIBR8_ELL_STENCIL=0 \
        python scripts/scale_probe.py adjoint 64 3
    }
  python scripts/merge_scale_row.py 64 $PHASELOG \
    && cp $PHASELOG /root/repo/.bench_results/scale_chain_r4.log
  echo "$(ts) merge rc=$?"
}

stage_lvlprobe() {
  echo "$(ts) === stage lvlprobe ==="
  run_probe 7200 /tmp/probe_lvl_n64.log /tmp/probe_lvl_n64.err \
    CALIBR8_X64=0 python scripts/probe_level_matvec.py 64 3
  run_probe 3600 /tmp/probe_lvl_n64.log /tmp/probe_lvl_n64.err \
    CALIBR8_X64=0 CALIBR8_ELL_STENCIL=0 python scripts/probe_level_matvec.py 64 3
  cp /tmp/probe_lvl_n64.log /root/repo/.bench_results/probe_lvl_n64.log
}

stage_bench() {
  echo "$(ts) === stage bench ==="
  wait_tpu
  timeout 14400 env CALIBR8_BENCH_DEADLINE=13200 \
    python bench.py > /tmp/bench_r5_full.log 2>&1
  echo "$(ts) bench rc=$?"
  tail -1 /tmp/bench_r5_full.log
}

for stage in "$@"; do
  "stage_$stage" || echo "$(ts) STAGE $stage FAILED"
done
echo "$(ts) chain done: $*"

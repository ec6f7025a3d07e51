#!/bin/bash
# Round-4 TPU chain, stage 2 (run AFTER chain_r4.sh completes):
#   5. degree-sweep compile probe: is generated code still Chebyshev-
#      degree-dependent (i.e. is the constant-trip unroll defeated)?
#   6. profile_mg at n=64: make-vs-apply split for the >=10 s/step gap
#   7. full bench warm run (f64 MG rows, dist_overhead, 22k-elem
#      calibration, twins refresh) -> .bench_results/
log=/tmp/tpu_chain_r4b.log
exec >>"$log" 2>&1
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo || exit 1

ts() { date +%H:%M:%S; }

while true; do
  if timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "$(ts) TPU up — stage 2"

    echo "$(ts) [5] degree-sweep compile probe"
    for d in 2 6; do
      timeout 4800 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$d \
        python scripts/ablate_code_size.py 64 3 restart10 > /tmp/degsweep_d$d.log 2>&1
      echo "$(ts) deg=$d rc=$? $(grep '"tag"' /tmp/degsweep_d$d.log | tail -1)"
    done

    echo "$(ts) [6] profile_mg n=64"
    timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=4 \
      python scripts/profile_mg.py 64 3 > /tmp/profile_mg_r4.log 2>&1
    echo "$(ts) profile_mg rc=$?"
    tail -5 /tmp/profile_mg_r4.log

    echo "$(ts) [7] full bench warm run"
    timeout 14400 env CALIBR8_BENCH_DEADLINE=13500 \
      python bench.py > /tmp/bench_r4_full.log 2>&1
    echo "$(ts) bench rc=$?"
    tail -1 /tmp/bench_r4_full.log | head -c 600

    echo "$(ts) stage 2 done"
    break
  else
    echo "$(ts) tunnel down"
    sleep 90
  fi
done

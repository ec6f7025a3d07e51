#!/bin/bash
# Round-4 TPU chain, stage d (queue after chain_r4c):
#   - newton + adjoint at refs=4 (base mesh 4^3 -> the Newton-Schulz
#     coarse inverse collapses from an 8.7k-DOF dense NS to 1.5k, and
#     L=4 measured HALF the Krylov iterations of L=3 at f32 tol 1e-4)
#   - profile_mg make-vs-apply split at both chain depths
#   - merge the scale row, then the full bench warm run
log=/tmp/tpu_chain_r4d.log
exec >>"$log" 2>&1
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo || exit 1

ts() { date +%H:%M:%S; }

# wait for chain_r4c to finish (it breaks out of its loop when done)
while [ -z "$(grep 'stage 1c done' /tmp/tpu_chain_r4c.log 2>/dev/null)" ]; do
  sleep 60
done

while true; do
  if timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "$(ts) TPU up — stage d"

    echo "$(ts) newton refs=4 deg=4"
    timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=4 CALIBR8_BENCH_SCALE_REFINE=4 \
      python scripts/scale_probe.py newton 64 4 >> /tmp/scale_chain.log 2> /tmp/newton_r4d.err
    echo "$(ts) newton refs=4 rc=$?"

    for try in 1 2; do
      echo "$(ts) adjoint refs=4 deg=4 try=$try"
      timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=4 CALIBR8_BENCH_RESTART=40 \
        python scripts/scale_probe.py adjoint 64 4 >> /tmp/scale_chain.log 2> /tmp/adjoint_r4d_t$try.err
      rc=$?
      echo "$(ts) adjoint refs=4 rc=$rc"
      [ $rc -eq 0 ] && break
      sleep 120
    done

    python scripts/merge_scale_row.py 64 && cp /tmp/scale_chain.log /root/repo/.bench_results/scale_chain_r4.log
    echo "$(ts) merge rc=$?"

    echo "$(ts) profile_mg refs=3"
    timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=4 \
      python scripts/profile_mg.py 64 3 > /tmp/profile_mg_r4_L3.log 2>&1
    echo "$(ts) profile_mg L3 rc=$? :: $(grep -h '{' /tmp/profile_mg_r4_L3.log | tail -1 | head -c 300)"

    echo "$(ts) full bench warm run"
    timeout 14400 env CALIBR8_BENCH_DEADLINE=13500 \
      python bench.py > /tmp/bench_r4_full.log 2>&1
    echo "$(ts) bench rc=$?"

    echo "$(ts) stage d done"
    break
  else
    echo "$(ts) tunnel down"
    sleep 90
  fi
done

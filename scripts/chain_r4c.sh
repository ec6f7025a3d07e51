#!/bin/bash
# Round-4 TPU chain, stage 1c: capture a CONVERGED 1.1M-DOF newton +
# adjoint pair.  Degree 2 first (the configuration whose newton
# converged in round 3, now with the own-rolled GMRES + two-consecutive
# -failure exit), merge the scale row, then retry degree 4 for the
# total-time optimum.  Strictly serialized TPU processes.
log=/tmp/tpu_chain_r4c.log
exec >>"$log" 2>&1
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo || exit 1

ts() { date +%H:%M:%S; }

while true; do
  if timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "$(ts) TPU up — stage 1c"

    for deg in 2 4; do
      echo "$(ts) newton deg=$deg"
      timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$deg \
        python scripts/scale_probe.py newton 64 3 >> /tmp/scale_chain.log 2> /tmp/newton_r4c_d$deg.err
      echo "$(ts) newton deg=$deg rc=$?"
      echo "$(ts) adjoint deg=$deg"
      timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$deg CALIBR8_BENCH_RESTART=40 \
        python scripts/scale_probe.py adjoint 64 3 >> /tmp/scale_chain.log 2> /tmp/adjoint_r4c_d$deg.err
      echo "$(ts) adjoint deg=$deg rc=$?"
      python scripts/merge_scale_row.py 64 && cp /tmp/scale_chain.log /root/repo/.bench_results/scale_chain_r4.log
      echo "$(ts) merge after deg=$deg rc=$?"
    done

    echo "$(ts) stage 1c done"
    break
  else
    echo "$(ts) tunnel down"
    sleep 90
  fi
done

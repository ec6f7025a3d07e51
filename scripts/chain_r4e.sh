#!/bin/bash
# Round-4 TPU chain, stage e (machine restarted; r4c/r4d never ran):
# ADJOINT-FIRST at 1.1M DOF — the north-star blank.  Order:
#   1. assembly 64 3   (cheap; needed by merge_scale_row)
#   2. adjoint 64 3 deg=2  (the missing row; 3-program split, donated)
#   3. newton  64 3 deg=2  (refresh under own-rolled GMRES)
#   4. merge scale row -> .bench_results/scale_f32_n64.json
# Strictly serialized TPU processes; poll the tunnel between jobs.
log=/tmp/tpu_chain_r4e.log
exec >>"$log" 2>&1
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo || exit 1

ts() { date +%H:%M:%S; }

wait_tpu() {
  while ! timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; do
    echo "$(ts) tunnel down"
    sleep 90
  done
}

wait_tpu
echo "$(ts) TPU up — stage e"

echo "$(ts) assembly"
timeout 3600 env CALIBR8_X64=0 \
  python scripts/scale_probe.py assembly 64 3 >> /tmp/scale_chain.log 2> /tmp/assembly_r4e.err
echo "$(ts) assembly rc=$?"

for try in 1 2; do
  wait_tpu
  echo "$(ts) adjoint deg=2 try=$try"
  timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=2 CALIBR8_BENCH_RESTART=40 \
    python scripts/scale_probe.py adjoint 64 3 >> /tmp/scale_chain.log 2> /tmp/adjoint_r4e_t$try.err
  rc=$?
  echo "$(ts) adjoint rc=$rc"
  [ $rc -eq 0 ] && grep -q '"phase": "adjoint".*"seconds"' /tmp/scale_chain.log && break
  sleep 120
done

wait_tpu
echo "$(ts) newton deg=2"
timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=2 \
  python scripts/scale_probe.py newton 64 3 >> /tmp/scale_chain.log 2> /tmp/newton_r4e.err
echo "$(ts) newton rc=$?"

python scripts/merge_scale_row.py 64 && cp /tmp/scale_chain.log /root/repo/.bench_results/scale_chain_r4.log
echo "$(ts) merge rc=$?"
echo "$(ts) stage e done"

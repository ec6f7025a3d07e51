#!/bin/bash
# Round-4 TPU chain, stage f (queue after chain_r4e):
#   1. profile_mg make-vs-apply split at the 1.1M-DOF scale mesh
#      (deg 2 and 4) — decides whether to build preconditioner lag
#      NOTE profile_mg takes the BASE n: 8 + 3 refinements = n=64 mesh
#   2. newton + adjoint at refs=4 deg=4 (L=4 measured half the Krylov
#      iterations of L=3; 1.5k-DOF base collapses the NS coarse solve)
#   3. merge the scale row
#   4. full bench warm run (f64 MG rows, dist_overhead, calibration,
#      twins — the driver-visible record)
log=/tmp/tpu_chain_r4f.log
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

# wait for chain_r4e to finish
while [ -z "$(grep 'stage e done' /tmp/tpu_chain_r4e.log 2>/dev/null)" ]; do
  sleep 60
done

for deg in 2 4; do
  wait_tpu
  echo "$(ts) profile_mg scale mesh deg=$deg"
  timeout 5400 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$deg \
    python scripts/profile_mg.py 8 3 > /tmp/profile_mg_r4_d$deg.log 2>&1
  echo "$(ts) profile_mg deg=$deg rc=$? :: $(grep -h '{' /tmp/profile_mg_r4_d$deg.log | tail -1 | head -c 400)"
done

wait_tpu
echo "$(ts) newton refs=4 deg=4"
timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=4 \
  python scripts/scale_probe.py newton 64 4 >> /tmp/scale_chain.log 2> /tmp/newton_r4f.err
echo "$(ts) newton refs=4 rc=$?"

wait_tpu
echo "$(ts) adjoint refs=4 deg=4"
timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=4 CALIBR8_BENCH_RESTART=40 \
  python scripts/scale_probe.py adjoint 64 4 >> /tmp/scale_chain.log 2> /tmp/adjoint_r4f.err
echo "$(ts) adjoint refs=4 rc=$?"

python scripts/merge_scale_row.py 64 && cp /tmp/scale_chain.log /root/repo/.bench_results/scale_chain_r4.log
echo "$(ts) merge rc=$?"

wait_tpu
echo "$(ts) full bench warm run"
timeout 12600 env CALIBR8_BENCH_DEADLINE=12000 \
  python bench.py > /tmp/bench_r4_full.log 2>&1
echo "$(ts) bench rc=$? :: $(tail -c 400 /tmp/bench_r4_full.log)"

echo "$(ts) stage f done"

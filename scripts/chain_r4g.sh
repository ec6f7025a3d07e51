#!/bin/bash
# Round-4 TPU chain, stage g (queue after chain_r4f's full bench):
#   1. newton_mg f32 n8 refresh — _newton_fn tol fixed 5e-3 -> 1e-4
#      (the own-rolled cycle exits at 0.1*atol, so the 5e-3 request
#      yielded 4.7e-4 and _mark_stalled mislabeled it)
#   2. dist_overhead f32 n32 — ell_matvec_T_sm check_vma fix
#   3. profile_mg at the 1.57M-elem scale mesh (deg 2) — make-state vs
#      closure-rebuild vs V-cycle-apply attribution for the perf push
log=/tmp/tpu_chain_r4g.log
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

# wait for chain_r4f to finish
while [ -z "$(grep 'stage f done' /tmp/tpu_chain_r4f.log 2>/dev/null)" ]; do
  sleep 60
done

wait_tpu
echo "$(ts) newton_mg f32 n8 (tol fix)"
timeout 3600 python bench.py --mode newton_mg --dtype f32 --n 8 \
  > /tmp/newton_mg_r4g.log 2>&1
echo "$(ts) newton_mg rc=$? :: $(grep -h '{' /tmp/newton_mg_r4g.log | tail -1 | head -c 300)"

wait_tpu
echo "$(ts) dist_overhead f32 n32 (check_vma fix)"
timeout 3600 python bench.py --mode dist_overhead --dtype f32 --n 32 \
  > /tmp/dist_overhead_r4g.log 2>&1
echo "$(ts) dist_overhead rc=$? :: $(grep -h '{' /tmp/dist_overhead_r4g.log | tail -1 | head -c 300)"

wait_tpu
echo "$(ts) profile_mg scale mesh deg=2"
timeout 5400 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=2 CALIBR8_BENCH_RESTART=40 \
  python scripts/profile_mg.py 8 3 > /tmp/profile_mg_r4g_d2.log 2>&1
echo "$(ts) profile_mg rc=$? :: $(grep -h '{' /tmp/profile_mg_r4g_d2.log | tail -1 | head -c 400)"

echo "$(ts) stage g done"

#!/bin/bash
# Round-4 TPU chain, stage i (queue after chain_r4h): smoother-degree
# sweep at the 1.1M-DOF scale mesh.  The dynamic trip bounds
# (solve/amg.py _dyn_bound, re-landed with the own-rolled GMRES) mean
# degree no longer multiplies generated code — deg-6 should compile to
# ~the deg-2 size and cut Krylov iterations (196k-elem runs at default
# deg-6 converge in ~1/3 the iterations the forced-deg-2 scale runs
# take).  MEMSTATS prints code size before running, so an over-ceiling
# program is caught without wedging.
log=/tmp/tpu_chain_r4i.log
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

while [ -z "$(grep 'stage h done' /tmp/tpu_chain_r4h.log 2>/dev/null)" ]; do
  sleep 60
done

for deg in 6 4; do
  wait_tpu
  echo "$(ts) newton deg=$deg"
  timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$deg \
    python scripts/scale_probe.py newton 64 3 >> /tmp/scale_chain.log 2> /tmp/newton_r4i_d$deg.err
  rc=$?
  its=$(grep '"phase": "newton"' /tmp/scale_chain.log | grep '"solve_iters"' | tail -1 \
    | python3 -c "import sys,json; d=json.loads(sys.stdin.read()); print(d.get('solve_iters'), d.get('seconds'))" 2>/dev/null)
  echo "$(ts) newton deg=$deg rc=$rc iters/seconds: $its"
done

# pick the better degree for the adjoint by the logged newton seconds
best=$(python3 - <<'EOF'
import json
rows = [json.loads(l) for l in open('/tmp/scale_chain.log')
        if l.startswith('{"phase": "newton"') and '"seconds"' in l]
best, bt = 2, 1e9
for r in rows[-3:]:
    s = r.get("seconds", 1e9)
    if s < bt:
        bt = s
        best = r.get("cheb_degree", None)
print(best if best else 2)
EOF
)
echo "$(ts) best degree by newton seconds: $best"

wait_tpu
echo "$(ts) adjoint deg=$best"
timeout 10800 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$best CALIBR8_BENCH_RESTART=40 \
  python scripts/scale_probe.py adjoint 64 3 >> /tmp/scale_chain.log 2> /tmp/adjoint_r4i.err
echo "$(ts) adjoint rc=$?"

python scripts/merge_scale_row.py 64 && cp /tmp/scale_chain.log /root/repo/.bench_results/scale_chain_r4.log
echo "$(ts) merge rc=$?"
echo "$(ts) stage i done"

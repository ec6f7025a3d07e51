#!/bin/bash
# Round-4 TPU chain, stage j (queue after /tmp/bench_chain.sh): re-run
# the 1.1M-DOF adjoint phase at the CURRENT head.  Two things changed
# since the merged row was captured (git f4240a9):
#   * the outer Krylov loop now runs a FULL-LENGTH cycle after a
#     no-progress cycle (871dbcf) — the captured 86-iter adjoint gave
#     up at relres 2.1e-4 against tol 1e-4 exactly the way that fix
#     targets (optimistic Givens estimate re-entering a cycle near the
#     f32 floor);
#   * restart=40 was the captured setting; 86 iters spans 3 cycles, so
#     restart=100 keeps the whole solve in ONE Krylov space (basis
#     101 x 1.1M x 4 B = 444 MB — mem_solve showed 3.68 GB temp at
#     restart 40, so +0.26 GB clears the 16 GB HBM ceiling easily).
# Success = adjoint converged (relres <= 1e-4) and/or fewer seconds;
# merge_scale_row then refreshes .bench_results/scale_f32_n64.json.
log=/tmp/tpu_chain_r4j.log
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

while [ -z "$(grep 'bench chain done' /tmp/bench_chain.log 2>/dev/null)" ]; do
  sleep 60
done

# /tmp was wiped by the box restart: seed the phase log from the
# committed copy so merge_scale_row still sees the assembly/newton
# phases alongside the new adjoint line
if [ ! -f /tmp/scale_chain.log ]; then
  cp /root/repo/.bench_results/scale_chain_r4.log /tmp/scale_chain.log
fi

wait_tpu
echo "$(ts) adjoint restart=100 (stencil ELL)"
timeout 10800 env CALIBR8_X64=0 CALIBR8_BENCH_RESTART=100 \
  python scripts/scale_probe.py adjoint 64 3 \
  >> /tmp/scale_chain.log 2> /tmp/adjoint_r4j.err
echo "$(ts) adjoint rc=$?"
tail -1 /tmp/scale_chain.log

# newton under the stencil ELL apply (the captured 22.3 s row ran the
# gather form; merge keeps whichever converged row is faster)
wait_tpu
echo "$(ts) newton (stencil ELL)"
timeout 7200 env CALIBR8_X64=0 \
  python scripts/scale_probe.py newton 64 3 \
  >> /tmp/scale_chain.log 2> /tmp/newton_r4j.err
echo "$(ts) newton rc=$?"
tail -1 /tmp/scale_chain.log

python scripts/merge_scale_row.py 64 \
  && cp /tmp/scale_chain.log /root/repo/.bench_results/scale_chain_r4.log
echo "$(ts) merge rc=$?"
echo "$(ts) stage j done"

#!/bin/bash
# Round-4 TPU chain: poll for the tunnel, then in the up-window run
#   1. compile-only code-size ablation (confirms the dynamic-trip fix)
#   2. scale newton at Chebyshev degree 4 (fallback: degree 2)
#   3. scale adjoint at the degree that worked
#   4. merge_scale_row -> .bench_results/scale_f32_n64.json
# All TPU processes strictly serialized (two at once -> UNAVAILABLE).
log=/tmp/tpu_chain_r4.log
exec >>"$log" 2>&1
export PYTHONPATH=/root/repo:$PYTHONPATH
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo || exit 1

ts() { date +%H:%M:%S; }

while true; do
  if timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "$(ts) TPU up — starting chain"

    echo "$(ts) [1/4] ablate_code_size (compile-only, default degree)"
    timeout 7200 env CALIBR8_X64=0 python scripts/ablate_code_size.py 64 3 cycle restart10 > /tmp/ablate_r4.log 2>&1
    echo "$(ts) ablate rc=$? — $(grep -c '"tag"' /tmp/ablate_r4.log) probes"
    grep '"tag"' /tmp/ablate_r4.log

    deg=4
    echo "$(ts) [2/4] scale newton deg=$deg"
    timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$deg \
      python scripts/scale_probe.py newton 64 3 >> /tmp/scale_chain.log 2> /tmp/newton_r4.err
    rc=$?
    echo "$(ts) newton deg=$deg rc=$rc"
    if [ $rc -ne 0 ]; then
      tail -3 /tmp/newton_r4.err
      deg=2
      echo "$(ts) [2b/4] scale newton fallback deg=$deg"
      timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$deg \
        python scripts/scale_probe.py newton 64 3 >> /tmp/scale_chain.log 2> /tmp/newton_r4b.err
      rc=$?
      echo "$(ts) newton deg=$deg rc=$rc"
      [ $rc -ne 0 ] && tail -3 /tmp/newton_r4b.err
    fi

    echo "$(ts) [3/4] scale adjoint deg=$deg"
    timeout 7200 env CALIBR8_X64=0 CALIBR8_MG_CHEB_DEGREE=$deg CALIBR8_BENCH_RESTART=40 \
      python scripts/scale_probe.py adjoint 64 3 >> /tmp/scale_chain.log 2> /tmp/adjoint_r4.err
    rc=$?
    echo "$(ts) adjoint deg=$deg rc=$rc"
    [ $rc -ne 0 ] && tail -3 /tmp/adjoint_r4.err

    echo "$(ts) [4/4] merge scale row"
    python scripts/merge_scale_row.py 64 || echo "$(ts) merge incomplete"

    echo "$(ts) chain done (deg=$deg)"
    break
  else
    echo "$(ts) tunnel down"
    sleep 90
  fi
done

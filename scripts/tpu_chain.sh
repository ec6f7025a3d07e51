#!/bin/bash
log=/tmp/tpu_chain.log
while true; do
  if timeout 120 env PYTHONPATH=/root/repo:$PYTHONPATH python -c "import jax; assert jax.devices()" >> $log 2>&1; then
    echo "$(date +%H:%M:%S) TPU up - running repro" >> $log
    cd /tmp && timeout 5400 env PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=0 JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2 python /tmp/repro_mg_tpu.py 32 3 both > /tmp/repro32_rp5.log 2>&1
    rc=$?
    echo "$(date +%H:%M:%S) repro rc=$rc" >> $log
    if [ $rc -eq 0 ]; then
      echo "$(date +%H:%M:%S) launching full bench warm run" >> $log
      timeout 14400 env PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_BENCH_DEADLINE=13500 python /root/repo/bench.py > /tmp/bench_r3_full.log 2>&1
      echo "$(date +%H:%M:%S) bench rc=$?" >> $log
      break
    fi
  else
    echo "$(date +%H:%M:%S) down" >> $log
  fi
  sleep 90
done
echo "$(date +%H:%M:%S) chain done" >> $log

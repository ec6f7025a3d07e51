"""Probe: does the axon tunnel kill LONG single dispatches?

Every failing 1.1M-DOF adjoint configuration (restart=100, any smoother
degree, any ELL form) executes ~70-240 s inside ONE remote call; every
passing configuration (newton restart=50, adjoint restart=40, all 196k
runs) stays under ~70 s per dispatch.  This probe runs a pure compute
loop (chained MXU matmuls inside fori_loop — no framework code) at
increasing target durations and reports which die UNAVAILABLE.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_long_dispatch.py
Prints one JSON line per duration.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    n = 8192
    x = jnp.full((n, n), 1.0 / n, jnp.float32)

    def step(_, a):
        a = a @ a
        # data-dependent renorm: keeps values finite and the loop body
        # impossible to fold
        return a / jnp.maximum(jnp.max(jnp.abs(a)), 1e-30) * (1.0 / n)

    def make(iters):
        def run(a):
            return jax.lax.fori_loop(0, iters, step, a, unroll=False)
        return jax.jit(run)

    # calibrate at two counts; check linearity so we trust per_iter
    # the axon tunnel ACKs dispatches before execution, so
    # block_until_ready returns immediately — a VALUE FETCH is the only
    # real synchronization (same lesson as the bench harness study)
    def timed(f):
        t0 = time.perf_counter()
        v = float(jnp.sum(f(x)))
        return time.perf_counter() - t0, v

    t = {}
    for k in (50, 200):
        f = make(k)
        timed(f)  # warmup/compile
        t[k], _ = timed(f)
    per_iter = (t[200] - t[50]) / 150
    print(json.dumps({"t50_s": t[50], "t200_s": t[200],
                      "per_iter_s": per_iter}), flush=True)
    if per_iter <= 0:
        raise SystemExit("calibration failed")

    for target_s in (30, 90, 150, 240, 400):
        iters = max(10, min(int(target_s / per_iter), 2**31 - 1))
        f = make(iters)
        out = {"target_s": target_s, "iters": iters}
        try:
            dt, _ = timed(f)
            out["seconds"] = round(dt, 1)
        except Exception as e:  # noqa: BLE001
            out["error"] = repr(e)[:300]
            print(json.dumps(out), flush=True)
            break
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""A/B the bench timing harness on the real chip.

Round-3 anomaly: `--mode assembly` (Pallas path, chained timing)
recorded 0.697 s at 196k elems while a FULL Newton step (assembly +
GMRES, same chained harness) recorded 0.459 s — impossible unless the
harness itself injects per-iteration cost.  Suspect: the chain helper
`_chain_first_arg(lambda out: out[0].ravel()[0])` runs ravel / index /
mul / add as EAGER ops between iterations — four separate dispatches
over the axon tunnel — where the newton chain's scalar (out[3]) needs
only two.

Measures, for both the Pallas and XLA assembly paths:
  eager_chain   — current timeit chain (eager ops between calls)
  jit_chain     — same data dependency, chain step jitted (1 dispatch)
  scan          — k iterations inside ONE jit via lax.scan (zero
                  per-iteration dispatch; chain prevents CSE)
  percall_sync  — block_until_ready every call (over-reports by RTT)

Usage (TPU, tunnel up, nothing else on the chip):
  PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=0 \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  python scripts/ab_timing.py [n=32] [iters=10]

Prints one JSON line per (path, harness).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("CALIBR8_X64", "0")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    import bench

    prob = bench.build_problem(n, "f32")
    x, x_prev, xi_prev = bench.representative_state(prob)
    params = prob.params0

    def measure(fn, tag):
        out = fn(x, x_prev, xi_prev, params)  # warm
        jax.block_until_ready(out)

        # eager chain (bench.timeit today)
        t0 = time.perf_counter()
        args = (x, x_prev, xi_prev, params)
        for _ in range(iters):
            out = fn(*args)
            s = out[0].ravel()[0]
            args = (args[0] + 0.0 * s,) + args[1:]
        jax.block_until_ready(out)
        eager = (time.perf_counter() - t0) / iters

        # jitted chain step
        chain_step = jax.jit(lambda r, xx: xx + 0.0 * r.ravel()[0])
        xx = chain_step(out[0], x)
        jax.block_until_ready(xx)
        t0 = time.perf_counter()
        args = (x, x_prev, xi_prev, params)
        for _ in range(iters):
            out = fn(*args)
            args = (chain_step(out[0], args[0]),) + args[1:]
        jax.block_until_ready(out)
        jitc = (time.perf_counter() - t0) / iters

        # scan: all iterations in one dispatch
        @jax.jit
        def scanned(x0, x_prev, xi_prev, params):
            def body(xc, _):
                o = fn.__wrapped__(xc, x_prev, xi_prev, params) if hasattr(
                    fn, "__wrapped__") else fn(xc, x_prev, xi_prev, params)
                return xc + 0.0 * o[0].ravel()[0], o[0].ravel()[0]
            xf, rs = jax.lax.scan(body, x0, None, length=iters)
            return xf, rs

        o = scanned(x, x_prev, xi_prev, params)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = scanned(x, x_prev, xi_prev, params)
        jax.block_until_ready(o)
        scan = (time.perf_counter() - t0) / iters

        # per-call sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x, x_prev, xi_prev, params)
            jax.block_until_ready(out)
        sync = (time.perf_counter() - t0) / iters

        print(json.dumps({
            "path": tag, "n_elem": int(prob.disc.n_elem),
            "eager_chain_s": eager, "jit_chain_s": jitc,
            "scan_s": scan, "percall_sync_s": sync,
        }), flush=True)

    os.environ["CALIBR8_PALLAS"] = "1"
    measure(bench.make_assemble(prob), "pallas")
    os.environ["CALIBR8_PALLAS"] = "0"
    measure(bench.make_assemble(prob), "xla")
    os.environ["CALIBR8_PALLAS"] = "1"


if __name__ == "__main__":
    main()

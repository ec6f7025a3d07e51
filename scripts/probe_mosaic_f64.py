"""Probe which f64 loop forms Mosaic can lower on TPU.

Round-2 finding: lax.while_loop cannot carry f64 vectors inside a
Pallas TPU kernel (backend compiler crash), which gates all implicit
batched twins to the XLA path at f64 (fem/pallas_assembly.py
supports_pallas).  This probe checks the candidate fallbacks on the
real chip:

  a. while_loop, f64 vector carry (the known-bad baseline)
  b. fori_loop, fixed trip count, f64 vector carry
  c. fully unrolled Python loop (no carry at all)
  d. fori_loop, f32 carry pair (hi+lo double-single) — last resort

Run:  PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=1 \
      python scripts/probe_mosaic_f64.py
"""

import os
import sys
import traceback

os.environ.setdefault("CALIBR8_X64", "1")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from jax.experimental import pallas as pl


N = 1024
ITERS = 8


def _mk(kind):
    def body_fn(x):
        # a Newton-ish update with a data-dependent contraction
        return x - 0.25 * (x * x - 2.0)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        if kind == "while":
            def cond(c):
                it, _ = c
                return it < ITERS

            def body(c):
                it, z = c
                return it + 1, body_fn(z)

            _, x = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), x)
            )
        elif kind == "fori":
            x = jax.lax.fori_loop(0, ITERS, lambda i, z: body_fn(z), x)
        elif kind == "unroll":
            for _ in range(ITERS):
                x = body_fn(x)
        o_ref[...] = x

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, N), x.dtype),
        )(x)

    return run


def main():
    x = jnp.full((8, N), 1.7, jnp.float64)
    expect = None
    for kind in ("unroll", "fori", "while"):
        try:
            y = _mk(kind)(x)
            y.block_until_ready()
            val = float(y[0, 0])
            if expect is None:
                expect = val
            ok = abs(val - expect) < 1e-12
            print(f"{kind}: OK value={val!r} match={ok}", flush=True)
        except Exception as e:  # noqa: BLE001 — probe records the crash
            msg = str(e).splitlines()[:3]
            print(f"{kind}: FAIL {type(e).__name__}: {' | '.join(msg)}",
                  flush=True)
            traceback.print_exc(limit=2, file=sys.stderr)


if __name__ == "__main__":
    main()

"""Probe which inverse-trig primitives Mosaic (Pallas TPU) can lower.

Round-3 finding: the eigensolver twin (models/batched.py t_eig_sym33)
uses jnp.arccos, which failed on the real chip with "Unimplemented
primitive in Pallas TPU lowering for KernelType.TC: acos".  Before
rewriting, probe acos / asin / atan / atan2 in a minimal kernel to see
which (if any) lower, so the replacement uses the cheapest supported
form.

Usage (TPU, tunnel up, nothing else on the chip):
  PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=0 \
  python scripts/probe_mosaic_trig.py

Prints one line per primitive: OK <max_abs_err vs CPU numpy> or the
exception class + message.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CALIBR8_X64", "0")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    x = np.linspace(-0.95, 0.95, 256).astype(np.float32).reshape(2, 128)
    y = np.linspace(0.05, 1.0, 256).astype(np.float32).reshape(2, 128)

    cases = {
        "acos": (lambda a, b: jnp.arccos(a), np.arccos(x)),
        "asin": (lambda a, b: jnp.arcsin(a), np.arcsin(x)),
        "atan": (lambda a, b: jnp.arctan(a), np.arctan(x)),
        "atan2": (lambda a, b: jnp.arctan2(a, b), np.arctan2(x, y)),
        "acos_via_atan2": (
            lambda a, b: jnp.arctan2(jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0)), a),
            np.arccos(x),
        ),
    }

    for name, (fn, want) in cases.items():
        def kernel(a_ref, b_ref, o_ref, fn=fn):
            o_ref[...] = fn(a_ref[...], b_ref[...])

        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            )(jnp.asarray(x), jnp.asarray(y))
            err = float(np.max(np.abs(np.asarray(out) - want)))
            print(f"{name}: OK max_abs_err={err:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001 — probe
            msg = str(e).replace("\n", " ")[:160]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()

"""Pallas EBE matvec kernel: y_e = J_e v_e in trailing layout.

The Krylov per-iteration cost is ONE element-by-element matvec plus a
preconditioner apply.  The XLA lowering of the trailing-layout matvec
(fem/assembly.py ebe_matvec_T — nde^2 rank-1 lane FMAs) measures
~11.7 ms at 196k elements on v5e, ~40x off the ~0.3 ms HBM floor (the
element Jacobians are 200 MB; each FMA's operand slices re-stream from
HBM instead of staying in VMEM).  This kernel performs the whole
(nde x nde) contraction per element block inside VMEM: one stream over
J, one over v, one write of y — the bandwidth floor.

The gather (x -> v_e) and scatter-add (y_e -> y) stay in XLA: they are
single fused gather/segment ops over (n_elem, nde) and measure fast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(E_pad: int) -> int | None:
    for b in (2048, 1024, 512, 256, 128):
        if E_pad % b == 0:
            return b
    return None


def make_ebe_matvec_T(nde: int, E_pad: int, dtype, block_e: int):
    """Returns mv(J_T (nde, nde, E_pad), v_eT (nde, E_pad)) ->
    y_eT (nde, E_pad); transpose handled by the caller swapping J axes
    (jit hoists that relayout out of the Krylov loop — it happens once
    per solve, not per iteration)."""
    n_blocks = E_pad // block_e

    def kernel(J_ref, v_ref, y_ref):
        J = J_ref[...]  # (nde, nde, B)
        v = v_ref[...]  # (nde, B)
        rows = []
        for i in range(nde):
            acc = J[i, 0] * v[0]
            for j in range(1, nde):
                acc = acc + J[i, j] * v[j]
            rows.append(acc)
        y_ref[...] = jnp.stack(rows, axis=0)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (nde, nde, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nde, block_e), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (nde, block_e), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nde, E_pad), dtype),
    )

    # linear_call gives the kernel an explicit TRANSPOSE rule (the same
    # kernel on the axis-swapped Jacobian) — lax.custom_linear_solve
    # (jax gmres) transposes its matvec at trace time and pallas_call
    # has no transpose rule of its own
    from jax import custom_derivatives as _cd

    def _f(J_T, v_eT):
        return call(J_T, v_eT)

    def _f_T(J_T, ct):
        return call(J_T.swapaxes(0, 1), ct)

    def mv(J_T, v_eT):
        return _cd.linear_call(_f, _f_T, J_T, v_eT)

    return mv


_CACHE = {}


def supports(J_T) -> bool:
    return (
        jax.default_backend() == "tpu"
        # f64 Pallas is structurally impossible on this TPU stack (the
        # XLA:TPU X64-rewrite pass has no rule for tpu_custom_call) —
        # hit again by the mixed-precision IR residual program, whose
        # promoted f64 matvec must take the XLA path
        and J_T.dtype != jnp.float64
        and J_T.ndim == 3
        and J_T.shape[0] == J_T.shape[1]
        and _pick_block(J_T.shape[2]) is not None
    )


def ebe_matvec_T_tpu(J_T, disc, v):
    """Drop-in trailing-layout EBE matvec through the Pallas kernel.
    J_T (nde, nde, E_pad) (the fused assembly kernel's native output,
    possibly pre-swapped for transpose solves)."""
    nde, _, E_pad = J_T.shape
    key = (nde, E_pad, J_T.dtype)
    mv = _CACHE.get(key)
    if mv is None:
        mv = make_ebe_matvec_T(nde, E_pad, J_T.dtype, _pick_block(E_pad))
        _CACHE[key] = mv
    v_e = disc.gather_elem(v)  # (n_elem, nde)
    n_elem = v_e.shape[0]
    if E_pad != n_elem:
        v_e = jnp.concatenate(
            [v_e, jnp.zeros((E_pad - n_elem, nde), v_e.dtype)], axis=0
        )
    y_eT = mv(J_T, v_e.T)
    return disc.scatter_elem(y_eT[:, :n_elem].T)

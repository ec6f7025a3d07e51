"""Batched dense solves for tiny (n <= ~16) systems.

jnp.linalg.solve lowers to pivoted LU via lapack-style kernels that are
catastrophically slow for large batches of tiny matrices on TPU
(~100x slower than an unrolled elimination at n = 7).  These replace it
in every hot path: the per-IP constitutive Newton, the dxi/dx static
condensation (evaluations.cpp:112 analog), and the local adjoint solves.

Unrolled Gauss-Jordan with partial (max-column) pivoting, fully
vectorized over the leading batch axis; the pivot search/swap is a
batched argmax + take_along_axis, keeping everything on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def gauss_solve(A, B):
    """Solve A X = B for batched tiny systems.

    A: (..., n, n); B: (..., n) or (..., n, m).  Returns X with B's
    shape.  Partial pivoting by max |column| below the diagonal.
    """
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    n = A.shape[-1]
    Ab = jnp.concatenate([A, B], axis=-1)
    m = Ab.shape[-1]

    for k in range(n):
        # pivot: row with max |A[:, k]| among rows k..n-1
        col = jnp.abs(Ab[..., :, k])
        mask = jnp.arange(n) >= k
        col = jnp.where(mask, col, -jnp.inf)
        piv = jnp.argmax(col, axis=-1)  # (...,)
        piv_row = jnp.take_along_axis(
            Ab, piv[..., None, None].repeat(m, axis=-1), axis=-2
        )[..., 0, :]
        row_k = Ab[..., k, :]
        # swap rows k and piv
        onehot = (
            jnp.arange(n)[..., :, None] == piv[..., None, None]
        )  # (..., n, 1)
        is_k = (jnp.arange(n) == k)[..., :, None]
        Ab = jnp.where(is_k, piv_row[..., None, :], Ab)
        Ab = jnp.where(
            onehot & ~is_k, row_k[..., None, :], Ab
        )
        # eliminate
        pivval = Ab[..., k, k][..., None]
        rowk = Ab[..., k, :] / pivval
        factors = Ab[..., :, k]
        Ab = Ab - factors[..., :, None] * rowk[..., None, :]
        sel = (jnp.arange(n) == k)[..., :, None]
        Ab = jnp.where(sel, rowk[..., None, :], Ab)

    X = Ab[..., :, n:]
    return X[..., 0] if vec else X

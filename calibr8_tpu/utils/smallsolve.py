"""Batched dense solves for tiny (n <= ~16) systems.

jnp.linalg.solve lowers to pivoted LU kernels that are catastrophically
slow for large batches of tiny matrices on TPU (~100x slower than an
unrolled elimination at n = 7), so these replace it in every hot path:
the per-IP constitutive Newton, the dxi/dx static condensation
(evaluations.cpp:112 analog), and the local adjoint solves.

Two variants, both fully unrolled Gauss-Jordan vectorized over leading
batch axes:

  gauss_solve(..., pivot=False)  no pivoting — fastest; constitutive
      Jacobians are well-scaled/diagonal-dominant so this is the hot
      default, with callers guarding NaN/Inf updates (models/newton.py).
  gauss_solve(..., pivot=True)   partial (max-column) pivoting realized
      with one-hot einsum row selection (argmax + take_along_axis
      triggers pathological XLA compiles under vmap); used where
      robustness matters more than the ~3x cost (adjoint transposes,
      verification).
"""

from __future__ import annotations

import jax.numpy as jnp


def gauss_solve(A, B, pivot: bool = False):
    """Solve A X = B for batched tiny systems.

    A: (..., n, n); B: (..., n) or (..., n, m).  Returns X with B's shape.
    """
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    n = A.shape[-1]
    Ab = jnp.concatenate([A, B], axis=-1)

    for k in range(n):
        if pivot:
            col = jnp.abs(Ab[..., :, k])
            mask = jnp.arange(n) >= k
            col = jnp.where(mask, col, -jnp.inf)
            piv = jnp.argmax(col, axis=-1)
            onehot = (jnp.arange(n) == piv[..., None]).astype(Ab.dtype)
            piv_row = jnp.einsum("...n,...nm->...m", onehot, Ab)
            row_k = Ab[..., k, :]
            is_k = (jnp.arange(n) == k).astype(Ab.dtype)[..., :, None]
            Ab = (
                Ab
                + is_k * (piv_row - row_k)[..., None, :]
                + onehot[..., :, None] * (row_k - piv_row)[..., None, :]
            )
        pivval = Ab[..., k, k][..., None]
        rowk = Ab[..., k, :] / pivval
        factors = Ab[..., :, k]
        Ab = Ab - factors[..., :, None] * rowk[..., None, :]
        sel = (jnp.arange(n) == k)[..., :, None]
        Ab = jnp.where(sel, rowk[..., None, :], Ab)

    X = Ab[..., :, n:]
    return X[..., 0] if vec else X


def gauss_solve_T(A, B):
    """Trailing-batch variant: A (n, n, E), B (n, m, E) -> X (n, m, E).

    Keeps the element axis minor-most (TPU lanes) through the
    elimination — used inside trailing-layout assembly so the big
    (nxi+nde)^2-per-element Jacobian never needs a relayout before
    condensation.  No pivoting (see gauss_solve)."""
    n = A.shape[0]
    Ab = jnp.concatenate([A, B], axis=1)  # (n, n+m, E)
    # row-unrolled Gauss-Jordan using only rank-1 (E,) lane-aligned
    # broadcasts: size-1 sublane expansions like (1, n+m, E) -> full and
    # rank-1 iota masks both crash Mosaic layout inference in Pallas
    # kernels once n+m exceeds one sublane tile
    for k in range(n):
        rowk = Ab[k] * (1.0 / Ab[k, k])  # (n+m, E)
        rows = []
        for i in range(n):
            rows.append(rowk if i == k else Ab[i] - Ab[i, k] * rowk)
        Ab = jnp.stack(rows, axis=0)
    return Ab[:, n:]

"""Fully-jitted GMRES(m) cycle and preconditioned CG.

Replaces jax.scipy.sparse.linalg.{gmres,cg} on the hot solve paths
(solve/linear.py, parallel/dist.py).  Two reasons, both TPU-driven:

  * jax's gmres wraps the solve in lax.custom_linear_solve, which
    EAGERLY builds the transpose of the (preconditioned) operator by
    jax.linear_transpose at trace time — so every loop inside the
    preconditioner must be reverse-transposable.  That outlaws
    data-dependent trip bounds, and XLA:TPU UNROLLS constant-trip
    fori_loops per call site: the Chebyshev smoother loops alone
    contributed ~0.5 GB of generated code per V-cycle inline site at
    1.5M elements, against the chip's ~2 GB executable-load ceiling
    (scripts/ablate_code_size.py; the reference has no analog problem —
    Belos/MueLu smoother degree is a runtime knob,
    source/calibr8/src/linear_solve.cpp:36-123).  Nothing in the
    framework differentiates THROUGH a linear solve (adjoints are
    formed explicitly, source/calibr8/src/adjoint.cpp:76-189), so the
    transposability requirement bought nothing.

  * jax's "batched" GMRES runs all `restart` inner iterations with no
    convergence check; at scale each preconditioned iteration is a full
    MG V-cycle (~12-15 fine matvec equivalents), so a solve needing 16
    iterations under restart 40 wasted 24.  This cycle carries the
    Givens-rotation residual estimate and EXITS EARLY on
    |g_{k+1}| <= atol.

Orthogonalization is classical Gram-Schmidt applied twice (CGS2):
two (m+1, n) matmul-shaped reductions per iteration instead of k
sequential vdots — MXU/VPU-friendly and numerically equivalent to
modified Gram-Schmidt for Krylov practice.  All dots are jnp
reductions, so sharded (GSPMD) operands lower to ICI collectives
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _adot(V, w):
    """(m1, *shape) . (*shape) -> (m1,): basis-against-vector dots."""
    axes = tuple(range(1, V.ndim))
    return jnp.tensordot(V, w, axes=(axes, tuple(range(w.ndim))))


def _acomb(y, V):
    """sum_k y[k] V[k] for V (m, *shape)."""
    return jnp.tensordot(y, V, axes=(0, 0))


def _nrm(v):
    return jnp.sqrt(jnp.vdot(v, v).real).astype(v.dtype)


def gmres_cycle(opM, r0, restart: int, atol):
    """One right-preconditioned GMRES(m) cycle from the residual r0.

    Minimizes ||r0 - opM(dy)|| over the Krylov space of opM and r0,
    exiting early when the recurrence residual |g_{k+1}| drops to
    `atol` or on happy breakdown.  Returns (dy, res_est, k_used); the
    caller applies the right preconditioner to dy (dx = M(dy)) and
    re-checks the TRUE residual (the Belos status-check discipline,
    source/calibr8/src/linear_solve.cpp:106-123).

    r0 may be any array shape (flat single-device vectors or sharded
    dist blocks); reductions are global.
    """
    m = int(restart)
    dtype = r0.dtype
    shape = r0.shape
    tiny = jnp.asarray(1e-30 if dtype == jnp.float32 else 1e-290, dtype)

    beta = _nrm(r0)
    atol = jnp.asarray(atol, dtype)

    V0 = jnp.zeros((m + 1,) + shape, dtype)
    V0 = V0.at[0].set(r0 / jnp.maximum(beta, tiny))
    # RT[k] = column k of the Givens-triangularized Hessenberg R
    R0 = jnp.zeros((m, m), dtype)
    g0 = jnp.zeros(m + 1, dtype).at[0].set(beta)
    cs0 = jnp.zeros(m, dtype)
    sn0 = jnp.zeros(m, dtype)

    def cond(c):
        _, _, _, _, _, k, res, brk = c
        return (k < m) & (res > atol) & jnp.logical_not(brk)

    def body(c):
        V, RT, g, cs, sn, k, _, _ = c
        vk = jax.lax.dynamic_index_in_dim(V, k, 0, keepdims=False)
        w = opM(vk)
        # CGS2: rows > k of V are zero vectors, so their dots vanish —
        # no masking needed
        h1 = _adot(V, w)
        w = w - _acomb(h1, V)
        h2 = _adot(V, w)
        w = w - _acomb(h2, V)
        h = h1 + h2
        hk1 = _nrm(w)
        V = jax.lax.dynamic_update_index_in_dim(
            V, w / jnp.maximum(hk1, tiny), k + 1, 0
        )
        h = jax.lax.dynamic_update_index_in_dim(h, hk1, k + 1, 0)

        # previous Givens rotations on the new column (data-dependent
        # bound k — a sequential scalar sweep, negligible either way)
        def rot(i, h):
            hi = h[i]
            hi1 = h[i + 1]
            t = cs[i] * hi + sn[i] * hi1
            h = h.at[i + 1].set(-sn[i] * hi + cs[i] * hi1)
            return h.at[i].set(t)

        h = jax.lax.fori_loop(0, k, rot, h)
        hk = jax.lax.dynamic_index_in_dim(h, k, 0, keepdims=False)
        hk1r = jax.lax.dynamic_index_in_dim(h, k + 1, 0, keepdims=False)
        den = jnp.sqrt(hk * hk + hk1r * hk1r)
        ok = den > tiny
        c_k = jnp.where(ok, hk / jnp.maximum(den, tiny), 1.0).astype(dtype)
        s_k = jnp.where(ok, hk1r / jnp.maximum(den, tiny), 0.0).astype(dtype)
        cs = cs.at[k].set(c_k)
        sn = sn.at[k].set(s_k)
        h = jax.lax.dynamic_update_index_in_dim(h, den, k, 0)
        RT = jax.lax.dynamic_update_slice(
            RT, h[None, :m], (k, jnp.zeros_like(k))
        )
        gk = jax.lax.dynamic_index_in_dim(g, k, 0, keepdims=False)
        g = jax.lax.dynamic_update_index_in_dim(g, -s_k * gk, k + 1, 0)
        g = jax.lax.dynamic_update_index_in_dim(g, c_k * gk, k, 0)
        res = jnp.abs(-s_k * gk)
        return (V, RT, g, cs, sn, k + 1, res, hk1 <= tiny)

    k0 = jnp.asarray(0, jnp.int32)
    V, RT, g, cs, sn, k_used, res, _ = jax.lax.while_loop(
        cond, body, (V0, R0, g0, cs0, sn0, k0, beta, beta <= tiny)
    )
    R = RT.T

    # back substitution on the m x m upper-triangular R, padded to
    # identity on the columns the cycle never reached (their g rows are
    # zeroed, so y vanishes there)
    mask = jnp.arange(m) < k_used
    diag = jnp.diagonal(R)
    R = R + jnp.diag(jnp.where(mask & (jnp.abs(diag) > tiny), 0.0, 1.0))
    gm = jnp.where(mask, g[:m], 0.0).astype(dtype)

    def bsub(i, y):
        j = m - 1 - i
        rj = jax.lax.dynamic_index_in_dim(R, j, 0, keepdims=False)
        num = gm[j] - jnp.dot(rj, y) + rj[j] * y[j]
        return y.at[j].set(num / rj[j])

    y = jax.lax.fori_loop(0, m, bsub, jnp.zeros(m, dtype))
    dy = _acomb(y, V[:m])
    return dy, res, k_used


def pcg(op, b, M, tol, maxiter: int, atol=0.0, x0=None):
    """Preconditioned conjugate gradients with early exit on
    ||r|| <= max(tol * ||b||, atol).  Returns (x, relres)."""
    dtype = b.dtype
    norm_b = _nrm(b)
    safe_nb = jnp.maximum(norm_b, jnp.asarray(1e-300, dtype))
    target = jnp.maximum(tol * norm_b, jnp.asarray(atol, dtype))

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - op(x)
    z = M(r) if M is not None else r
    p = z
    rz = jnp.vdot(r, z).real.astype(dtype)

    def cond(c):
        _, r, _, _, _, k = c
        return (k < maxiter) & (_nrm(r) > target)

    def body(c):
        x, r, p, z, rz, k = c
        Ap = op(p)
        alpha = rz / jnp.vdot(p, Ap).real.astype(dtype)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r) if M is not None else r
        rz_new = jnp.vdot(r, z).real.astype(dtype)
        p = z + (rz_new / rz) * p
        return (x, r, p, z, rz_new, k + 1)

    x, r, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, r, p, z, rz, jnp.asarray(0, jnp.int32))
    )
    return x, _nrm(b - op(x)) / safe_nb

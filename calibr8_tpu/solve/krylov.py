"""Restarted GMRES with iteration counting and convergence reporting.

The reference checks the Belos solver status after every solve and
reacts to non-convergence (reference: source/calibr8/src/linear_solve.cpp:106-123,
primal.cpp:163-195); jax.scipy.sparse.linalg.gmres discards that
information.  This host-orchestrated GMRES (jitted Arnoldi inner loop,
host restart loop) surfaces

  * iteration count,
  * final residual norm (recomputed, not the recurrence estimate),
  * a converged flag,

and is the solver used when diagnostics matter: preconditioner studies
(multigrid iteration-count tests), the hardened primal/adjoint solve
path, and failure detection.  The matvec/preconditioner are arbitrary
callables over any array shape (flat single-device vectors or sharded
(P, N_own, ndpn) dist arrays — reductions are jnp.vdot either way).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class KrylovInfo:
    iterations: int
    relres: float
    converged: bool


def _norm(v):
    return jnp.sqrt(jnp.vdot(v, v).real)


def gmres_counted(op, b, M=None, tol=1e-8, atol=0.0, maxiter=200, restart=50, x0=None):
    """Right-preconditioned restarted GMRES(m).

    Solves op(x) = b with x = M(y) substitution (right preconditioning
    keeps the TRUE residual observable in the recurrence).  Returns
    (x, KrylovInfo).
    """
    if M is None:
        M = lambda v: v

    norm_b = float(_norm(b))
    target = max(tol * norm_b, atol)
    if norm_b == 0.0:
        return jnp.zeros_like(b), KrylovInfo(0, 0.0, True)

    x = jnp.zeros_like(b) if x0 is None else x0
    total = 0

    op_j = jax.jit(op) if not hasattr(op, "lower") else op
    M_j = jax.jit(M) if not hasattr(M, "lower") else M

    while total < maxiter:
        r = b - op_j(x)
        beta = float(_norm(r))
        if beta <= target:
            break
        m = min(restart, maxiter - total)
        # Arnoldi with modified Gram-Schmidt (host loop; each step is
        # one jitted matvec + vector ops — fine for diagnostics and
        # moderate restart values)
        V = [r / beta]
        H = np.zeros((m + 1, m))
        g = np.zeros(m + 1)
        g[0] = beta
        # Givens rotations
        cs = np.zeros(m)
        sn = np.zeros(m)
        k_used = 0
        converged_inner = False
        for k in range(m):
            w = op_j(M_j(V[k]))
            for i in range(k + 1):
                hik = jnp.vdot(V[i], w).real
                H[i, k] = float(hik)
                w = w - hik * V[i]
            hk1 = float(_norm(w))
            H[k + 1, k] = hk1
            if hk1 > 1e-300:
                V.append(w / hk1)
            else:
                V.append(w)
            # apply previous rotations to column k
            for i in range(k):
                t = cs[i] * H[i, k] + sn[i] * H[i + 1, k]
                H[i + 1, k] = -sn[i] * H[i, k] + cs[i] * H[i + 1, k]
                H[i, k] = t
            # new rotation
            denom = np.hypot(H[k, k], H[k + 1, k])
            if denom == 0.0:
                cs[k], sn[k] = 1.0, 0.0
            else:
                cs[k], sn[k] = H[k, k] / denom, H[k + 1, k] / denom
            H[k, k] = denom
            H[k + 1, k] = 0.0
            g[k + 1] = -sn[k] * g[k]
            g[k] = cs[k] * g[k]
            k_used = k + 1
            if abs(g[k + 1]) <= target:
                converged_inner = True
                break
        # solve the small triangular system and update
        k = k_used
        if k > 0:
            try:
                y = np.linalg.solve(H[:k, :k], g[:k])
            except np.linalg.LinAlgError:  # breakdown (singular operator)
                y = np.linalg.lstsq(H[:k, :k], g[:k], rcond=None)[0]
            dz = y[0] * V[0]
            for i in range(1, k):
                dz = dz + y[i] * V[i]
            x = x + M_j(dz)
        total += k
        if converged_inner:
            r = b - op_j(x)
            if float(_norm(r)) <= max(target, 1e-300) * 1.0000001:
                break
        if k == 0:
            break

    relres = float(_norm(b - op_j(x))) / norm_b
    return x, KrylovInfo(total, relres, relres <= tol * 1.0000001 or relres * norm_b <= max(atol, 0.0))

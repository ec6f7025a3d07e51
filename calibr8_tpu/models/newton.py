"""Batched per-integration-point constitutive Newton solves.

Re-design of LocalResidual<FADT>::solve_nonlinear (reference: e.g.
source/calibr8/src/small_J2.cpp:122-172): per integration point, Newton
on C(xi; xi_prev, x, p) = 0 with the branch path re-selected at every
iterate, convergence on ||C|| (absolute, or relative to the first
iterate), and a dense (<= ~8x8) solve per iterate.

TPU design: one lax.while_loop per point, vmapped over all points of an
element set (the batched while runs until every lane converges, with
converged lanes frozen).  The dense solves are batched jnp.linalg.solve
on tiny matrices.  Jacobians d C / d xi come from jax.jacfwd on the same
pure residual — the moral equivalent of the reference's FADT seeding
(local_residual.hpp:86-109) without a separate AD type system.

Divergence handling matches the reference: a point that exhausts
max_iters reports failure; the caller sums failures and contracts the
global line search (primal.cpp:99-104, 163-195).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from calibr8_tpu.models.base import ELASTIC, Kinematics
from calibr8_tpu.utils.smallsolve import gauss_solve


class LocalSolveResult(NamedTuple):
    xi: jnp.ndarray  # (..., nxi) converged local state
    path: jnp.ndarray  # (...,) int branch taken at the solution
    failed: jnp.ndarray  # (...,) bool: Newton exhausted max_iters
    iters: jnp.ndarray  # (...,) int iterations used


class _NewtonState(NamedTuple):
    xi: jnp.ndarray
    path: jnp.ndarray
    it: jnp.ndarray
    r0: jnp.ndarray
    done: jnp.ndarray


def make_local_solver(model, max_iters: int, abs_tol: float, rel_tol: float):
    """Build solve(xi_prev, kin, params) -> LocalSolveResult for a single
    integration point; vmap at the call site."""

    nxi = model.nxi()

    if not model.needs_local_newton():

        def trivial(xi_prev, kin: Kinematics, params):
            xi = jnp.zeros_like(xi_prev)
            return LocalSolveResult(
                xi=xi,
                path=jnp.asarray(ELASTIC, dtype=jnp.int32),
                failed=jnp.asarray(False),
                iters=jnp.asarray(0, dtype=jnp.int32),
            )

        return trivial

    def solve(xi_prev, kin: Kinematics, params):
        dtype = xi_prev.dtype
        xi0 = model.first_guess(xi_prev, kin, params)

        def resid(xi, path):
            return model.residual(xi, xi_prev, kin, params, path)

        def jac(xi, path):
            # linearize + unit tangents: one primal evaluation and nxi
            # cheap tangent passes (TPU-friendly vs jacfwd's batching)
            _, lin = jax.linearize(lambda z: resid(z, path), xi)
            return jax.vmap(lin, in_axes=1, out_axes=1)(
                jnp.eye(nxi, dtype=xi.dtype)
            )

        # Hosford/Barlat-style solves (reference: small_hosford.cpp /
        # hypo_hosford.cpp / hypo_barlat.cpp solve_nonlinear) select the
        # branch at the first iterate only, then force it, and damp the
        # Newton update with a backtracking line search on 1/2||C||^2.
        freeze_path = getattr(model, "freeze_path", False)
        use_ls = getattr(model, "local_line_search", freeze_path)

        def cond(s: _NewtonState):
            return jnp.logical_and(s.it <= max_iters, jnp.logical_not(s.done))

        def body(s: _NewtonState):
            path = model.pathfn(s.xi, xi_prev, kin, params)
            if freeze_path:
                path = jnp.where(s.it == 1, path, s.path)
            R = resid(s.xi, path)
            rnorm = jnp.linalg.norm(R)
            r0 = jnp.where(s.it == 1, rnorm, s.r0)
            conv = jnp.logical_or(rnorm < abs_tol, rnorm / jnp.maximum(r0, 1e-300) < rel_tol)
            J = jac(s.xi, path)
            dxi = gauss_solve(J, -R)
            # guard NaN/Inf updates (singular local Jacobian): keep xi,
            # iterate count still advances toward failure
            bad = jnp.logical_not(jnp.all(jnp.isfinite(dxi)))
            dxi = jnp.where(bad, jnp.zeros_like(dxi), dxi)
            if use_ls:
                # backtracking halving on the merit 1/2||C||^2 with the
                # Armijo condition (the simple-safeguard version of the
                # reference's cubic line search)
                phi0 = 0.5 * rnorm * rnorm
                c1 = 1.0e-4

                def ls_body(k, carry):
                    alpha, accepted = carry
                    Rt = resid(s.xi + alpha * dxi, path)
                    phit = 0.5 * jnp.sum(Rt * Rt)
                    ok = phit <= phi0 * (1.0 - 2.0 * c1 * alpha)
                    ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(Rt)))
                    new_alpha = jnp.where(jnp.logical_or(ok, accepted), alpha, alpha * 0.5)
                    return new_alpha, jnp.logical_or(accepted, ok)

                alpha, _ = jax.lax.fori_loop(
                    0, 4, ls_body, (jnp.asarray(1.0, dtype), jnp.asarray(False))
                )
                dxi = alpha * dxi
            xi_new = jnp.where(conv, s.xi, s.xi + dxi)
            return _NewtonState(
                xi=xi_new,
                path=path,
                it=s.it + 1,
                r0=r0,
                done=conv,
            )

        s0 = _NewtonState(
            xi=xi0.astype(dtype),
            path=jnp.asarray(ELASTIC, dtype=jnp.int32),
            it=jnp.asarray(1, dtype=jnp.int32),
            r0=jnp.asarray(1.0, dtype=dtype),
            done=jnp.asarray(False),
        )
        s = jax.lax.while_loop(cond, body, s0)
        failed = jnp.logical_not(s.done)
        return LocalSolveResult(
            xi=s.xi, path=s.path, failed=failed, iters=s.it - 1
        )

    return solve


def local_jacobians(model, xi, xi_prev, kin: Kinematics, params, path):
    """Derivative blocks of C at the converged state with the branch
    forced (reference force_path: local_residual.hpp:130-138).

    Returns dict with dC_dxi (nxi,nxi), dC_dxiprev, dC_dgradu (nxi,d,d),
    dC_dgraduprev, dC_dp (nxi,np).
    """

    def C(xi_, xi_prev_, gu, gu_prev, params_):
        k = Kinematics(grad_u=gu, grad_u_prev=gu_prev)
        return model.residual(xi_, xi_prev_, k, params_, path)

    args = (xi, xi_prev, kin.grad_u, kin.grad_u_prev, params)
    out = {}
    names = ["dC_dxi", "dC_dxiprev", "dC_dgradu", "dC_dgraduprev", "dC_dp"]
    for i, name in enumerate(names):
        out[name] = jax.jacfwd(C, argnums=i)(*args)
    return out


def make_local_solver_batched(model, max_iters: int, abs_tol: float, rel_tol: float):
    """Batched (trailing element axis) local Newton with a SCALAR
    while condition (any unconverged) — required inside Pallas kernels,
    where Mosaic cannot lower vector-valued loop conditions, and also
    the efficient layout for XLA (element axis on the TPU lanes).

    solve(xiT_prev (nxi, E), kinT (d, d, E pytree), parsT (np, E))
    -> LocalSolveResult with trailing-axis fields."""

    nxi = model.nxi()

    def solve(xiT_prev, kinT, parsT):
        dtype = xiT_prev.dtype
        E = xiT_prev.shape[-1]

        def resid_one(xi, xi_prev, kin, params, path):
            return model.residual(xi, xi_prev, kin, params, path)

        vres = jax.vmap(
            resid_one, in_axes=(-1, -1, Kinematics(-1, -1), -1, 0), out_axes=-1
        )
        vpath = jax.vmap(
            model.pathfn, in_axes=(-1, -1, Kinematics(-1, -1), -1), out_axes=0
        )

        if not model.needs_local_newton():
            xi = jnp.zeros_like(xiT_prev)
            return LocalSolveResult(
                xi=xi,
                path=jnp.zeros(E, jnp.int32),
                failed=jnp.zeros(E, bool),
                iters=jnp.zeros(E, jnp.int32),
            )

        vfirst = jax.vmap(
            model.first_guess, in_axes=(-1, Kinematics(-1, -1), -1), out_axes=-1
        )
        xi0 = vfirst(xiT_prev, kinT, parsT)

        freeze_path = getattr(model, "freeze_path", False)
        use_ls = getattr(model, "local_line_search", freeze_path)

        from calibr8_tpu.utils.smallsolve import gauss_solve_T

        def jacT(xiT, path):
            def f(z):
                return vres(z, xiT_prev, kinT, parsT, path)

            _, lin = jax.linearize(f, xiT)
            # iota-based one-hot seeds (a .at[k].set would lower to a
            # scatter, which Mosaic cannot lower inside Pallas kernels)
            rows = jax.lax.broadcasted_iota(jnp.int32, xiT.shape, 0)
            cols = [lin((rows == k).astype(xiT.dtype)) for k in range(nxi)]
            return jnp.stack(cols, axis=1)  # (nxi, nxi, E)

        def cond(s):
            # s[4] is an int32 mask (Mosaic cannot carry i1 vectors
            # through scf.while)
            return jnp.any(jnp.logical_and(s[2] <= max_iters, s[4] == 0))

        def body(s):
            xiT, path, it, r0, done = s
            new_path = vpath(xiT, xiT_prev, kinT, parsT)
            if freeze_path:
                new_path = jnp.where(it == 1, new_path, path)
            R = vres(xiT, xiT_prev, kinT, parsT, new_path)  # (nxi, E)
            rnorm = jnp.sqrt(jnp.sum(R * R, axis=0))
            r0n = jnp.where(it == 1, rnorm, r0)
            conv = jnp.logical_or(
                rnorm < abs_tol, rnorm / jnp.maximum(r0n, 1e-300) < rel_tol
            )
            J = jacT(xiT, new_path)
            dxi = gauss_solve_T(J, -R[:, None, :])[:, 0, :]
            bad = jnp.logical_not(jnp.all(jnp.isfinite(dxi), axis=0))
            dxi = jnp.where(bad[None, :], 0.0, dxi)
            if use_ls:
                phi0 = 0.5 * rnorm * rnorm
                alpha = jnp.ones(E, dtype)
                accepted = jnp.zeros(E, bool)
                for _ in range(4):
                    Rt = vres(
                        xiT + alpha[None, :] * dxi, xiT_prev, kinT, parsT, new_path
                    )
                    phit = 0.5 * jnp.sum(Rt * Rt, axis=0)
                    ok = jnp.logical_and(
                        phit <= phi0 * (1.0 - 2e-4 * alpha),
                        jnp.all(jnp.isfinite(Rt), axis=0),
                    )
                    alpha = jnp.where(jnp.logical_or(ok, accepted), alpha, alpha * 0.5)
                    accepted = jnp.logical_or(accepted, ok)
                dxi = alpha[None, :] * dxi
            xi_new = jnp.where(conv[None, :], xiT, xiT + dxi)
            return (xi_new, new_path, it + 1, r0n, conv.astype(jnp.int32))

        s0 = (
            xi0.astype(dtype),
            jnp.zeros(E, jnp.int32),
            jnp.asarray(1, jnp.int32),
            jnp.ones(E, dtype),
            jnp.zeros(E, jnp.int32),
        )
        xiT, path, it, r0, done = jax.lax.while_loop(cond, body, s0)
        return LocalSolveResult(
            xi=xiT,
            path=path,
            failed=(done == 0),
            iters=jnp.full(E, it - 1, jnp.int32),
        )

    return solve

"""Fully-jitted Newton step and scanned time loop.

The host-orchestrated StepSolver (solve/newton.py) mirrors the
reference's printing/line-search behavior for interactive runs; this
module provides the PRODUCTION path: one XLA program per load step
(lax.while_loop Newton with a fixed-budget backtracking damping), and a
lax.scan over steps for the whole trajectory.  Because everything is a
pure jitted function, experiments batch with jax.vmap (the multi-
experiment calibration axis — SURVEY: the reference's 'data parallel'
analog is independent problems, objective.hpp:41-45) and the element
arrays shard over the TPU mesh with GSPMD.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from calibr8_tpu.fem.bcs import apply_dbcs_residual
from calibr8_tpu.solve import linear as linear_mod


class _NewtonCarry(NamedTuple):
    x: jnp.ndarray
    xi: jnp.ndarray
    path: jnp.ndarray
    norm: jnp.ndarray
    norm0: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    failed: jnp.ndarray


def make_jit_step(
    assembler,
    max_iters: int = 15,
    abs_tol: float = 1e-8,
    rel_tol: float = 1e-8,
    ls_evals: int = 2,
    linear_cfg=None,
):
    """Build step(x0, x_prev, xi_prev, params, bc_dofs, bc_vals, ext)
    -> (x, xi, path, norm, failed), fully jittable."""
    disc = assembler.disc
    linear_cfg = linear_cfg or linear_mod.LinearCfg(method="dense")

    def assemble(x, x_prev, xi_prev, params, bc_dofs, bc_vals, ext):
        loc = assembler.local_solve(x, x_prev, xi_prev, params)
        R, J_e, diag = assembler.residual_and_jacobian(
            x, x_prev, loc.xi, xi_prev, loc.path, params
        )
        R = R - ext
        R = apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals)
        return loc, R, J_e, diag

    def residual_norm(x, x_prev, xi_prev, params, bc_dofs, bc_vals, ext):
        loc = assembler.local_solve(x, x_prev, xi_prev, params)
        R = assembler.residual(x, x_prev, loc.xi, params) - ext
        R = apply_dbcs_residual(R, diag_dummy(R), x, bc_dofs, bc_vals)
        return R

    def diag_dummy(R):
        return jnp.ones_like(R)

    def step(x0, x_prev, xi_prev, params, bc_dofs, bc_vals, ext):
        loc0, R0, J0, d0 = assemble(
            x0, x_prev, xi_prev, params, bc_dofs, bc_vals, ext
        )
        n0 = jnp.linalg.norm(R0)

        def cond(c: _NewtonCarry):
            return jnp.logical_and(
                c.it <= max_iters,
                jnp.logical_and(~c.done, ~c.failed),
            )

        def body(c: _NewtonCarry):
            loc, R, J_e, diag = assemble(
                c.x, x_prev, xi_prev, params, bc_dofs, bc_vals, ext
            )
            norm = jnp.linalg.norm(R)
            norm0 = jnp.where(c.it == 1, norm, c.norm0)
            conv = jnp.logical_or(
                norm < abs_tol, norm / jnp.maximum(norm0, 1e-300) < rel_tol
            )
            fail = loc.failed.sum() > 0
            dx = linear_mod.solve(
                linear_cfg, J_e, disc, diag, -R, bc_dofs
            )
            # fixed-budget backtracking: accept the largest alpha in
            # {1, 1/2, ...} whose merit does not increase
            alpha = jnp.asarray(1.0, c.x.dtype)
            phi0 = 0.5 * norm * norm
            for _ in range(ls_evals):
                x_t = c.x + alpha * dx
                loc_t = assembler.local_solve(x_t, x_prev, xi_prev, params)
                R_t = assembler.residual(x_t, x_prev, loc_t.xi, params) - ext
                R_t = apply_dbcs_residual(R_t, diag, x_t, bc_dofs, bc_vals)
                phi_t = 0.5 * jnp.sum(R_t * R_t)
                bad = jnp.logical_or(
                    phi_t > phi0, loc_t.failed.sum() > 0
                )
                alpha = jnp.where(bad, alpha * 0.5, alpha)
            x_new = jnp.where(conv, c.x, c.x + alpha * dx)
            return _NewtonCarry(
                x=x_new,
                xi=loc.xi,
                path=loc.path,
                norm=norm,
                norm0=norm0,
                it=c.it + 1,
                done=conv,
                failed=fail,
            )

        c0 = _NewtonCarry(
            x=x0,
            xi=loc0.xi,
            path=loc0.path,
            norm=n0,
            norm0=n0,
            it=jnp.asarray(1, jnp.int32),
            done=jnp.asarray(False),
            failed=jnp.asarray(False),
        )
        c = jax.lax.while_loop(cond, body, c0)
        failed = jnp.logical_or(c.failed, ~c.done)
        return c.x, c.xi, c.path, c.norm, failed

    return step


def make_jit_trajectory(assembler, time_grid, dbcs, max_iters=15,
                        abs_tol=1e-8, rel_tol=1e-8, ls_evals=2,
                        linear_cfg=None):
    """lax.scan over load steps.  BC values per step are precomputed
    host-side into (n_steps, n_bc) arrays (they depend only on t)."""
    import numpy as np

    step_fn = make_jit_step(
        assembler, max_iters, abs_tol, rel_tol, ls_evals, linear_cfg
    )
    disc = assembler.disc
    bc_dofs, _ = dbcs.arrays(0.0)
    bc_vals = jnp.stack(
        [
            jnp.asarray(dbcs.values(time_grid.time(s), s), disc.dtype)
            for s in range(1, time_grid.num_steps + 1)
        ]
    )

    def run(params):
        x0 = disc.zero_x()
        xi0 = jnp.tile(
            jnp.asarray(assembler.model.init_xi(), disc.dtype)[None, :],
            (disc.n_elem, 1),
        )
        ext = jnp.zeros(disc.n_dofs, disc.dtype)

        def scan_body(carry, bc_v):
            x, xi = carry
            x_new, xi_new, path, norm, failed = step_fn(
                x, x, xi, params, bc_dofs, bc_v, ext
            )
            return (x_new, xi_new), (x_new, xi_new, path, norm, failed)

        (_, _), (xs, xis, paths, norms, fails) = jax.lax.scan(
            scan_body, (x0, xi0), bc_vals
        )
        return xs, xis, paths, norms, fails

    return run


class JitStepSolver:
    """Drop-in step solver running the WHOLE Newton loop as one XLA
    program per load step (make_jit_step), exposing the same
    solve_at_step contract as solve/newton.StepSolver.

    One device dispatch per step instead of several per Newton
    iteration: on a tunneled TPU every eager dispatch costs ~30 ms
    RTT, which dominates calibration objective evaluations on small
    meshes (the reference's per-evaluation forward solve,
    source/calibr8/src/primal.cpp:31-209, pays the same per-iteration
    latencies through Tpetra).  Deck opt-in:

        global residual: {solver: jitted}

    Semantics vs the host solver: fixed-budget backtracking damping
    instead of the printing Armijo cubic line search, no per-iteration
    convergence prints, and the multigrid preconditioner hook is not
    threaded through (use the host solver for MG decks).  A failed
    step raises NewtonSolveError exactly like the host path, so
    optimizer failure handling (opt/drivers.py penalty_inward /
    repeat_last) behaves identically."""

    def __init__(self, assembler, cfg):
        self.assembler = assembler
        self.cfg = cfg
        self._step = None

    def solve_at_step(
        self, x, x_prev, xi_prev, params, bc_dofs, bc_vals, ext_force,
        step: int = 0,
    ):
        from calibr8_tpu.solve.newton import NewtonSolveError

        if self._step is None:
            cfg = self.cfg
            self._step = jax.jit(
                make_jit_step(
                    self.assembler,
                    max_iters=cfg.max_iters,
                    abs_tol=cfg.abs_tol,
                    rel_tol=cfg.rel_tol,
                    ls_evals=cfg.line_search.max_evals,
                    linear_cfg=cfg.linear,
                )
            )
        x_new, xi, path, norm, failed = self._step(
            x, x_prev, xi_prev, params, bc_dofs, bc_vals, ext_force
        )
        if bool(failed):
            raise NewtonSolveError(
                f"jitted primal step {step} failed "
                f"(|R| = {float(norm):.3e} after {self.cfg.max_iters} iters)"
            )
        return x_new, xi, path, dict(resid_norm=float(norm))

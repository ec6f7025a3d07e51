"""Multigrid-preconditioned ADJOINT solves (transposed systems).

The reference preconditions the adjoint solve with the same
Teko/MueLu stack as the primal (source/calibr8/src/linear_solve.cpp:36-123
serves both directions; adjoint.cpp:41-49 only tightens the tolerance).
Round 2/3 learned that adjoint systems need the TRANSPOSED sweep order
(forward block-GS ordering stalls); the MG analog is the
mirrored-sweep cycle (solve/mg.py mixed_wrap transpose=True,
solve/amg.py / parallel/dist_mg.py mirrored u/p ordering)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.fem.assembly import ebe_matvec_disc, jac_is_trailing
from calibr8_tpu.fem.bcs import apply_dbcs_matvec
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.amg import AMGPrecondFactory
from calibr8_tpu.solve.krylov import gmres_counted
from calibr8_tpu.solve.precond import BlockJacobiGS

from tests.decks import BCS_2D, J2_MAT, make_deck


def _amg_prob(L=1, tol=1e-10):
    deck = make_deck(
        {"type": "notch2D", "h": 0.25, "refinements": L},
        "small_J2",
        J2_MAT,
        BCS_2D(0.001),
        1,
    )
    deck["linear algebra"] = {
        "preconditioner": "amg",
        "method": "gmres",
        "tolerance": tol,
    }
    return Problem(load_deck(deck))


def _transposed_probe(prob, which, tol=1e-10):
    """GMRES iteration count for one TRANSPOSED Jacobian solve."""
    a = prob.assembler
    disc = prob.disc
    x0, xi0, _ = prob.primal.initial_state()
    bc_dofs, bc_vals = prob.dbcs.arrays(prob.time_grid.time(1), 1)
    ext = jnp.zeros(disc.n_dofs, disc.dtype)
    x, xi, path, _ = prob.step_solver.solve_at_step(
        x0, x0, xi0, prob.params0, bc_dofs, bc_vals, ext, step=1
    )
    loc = a.local_solve(x, x0, xi0, prob.params0)
    _, J_e, diag = a.residual_and_jacobian(
        x, x0, loc.xi, xi0, loc.path, prob.params0
    )
    # transpose FIRST, then Dirichlet rows (solve/linear.py convention)
    if jac_is_trailing(J_e, disc):
        op_e = J_e.swapaxes(0, 1)
    else:
        op_e = J_e.swapaxes(-1, -2)

    def op(v):
        out = ebe_matvec_disc(op_e, disc, v)
        return apply_dbcs_matvec(out, diag, v, bc_dofs)

    if which == "mg":
        Mfn = prob.mg_factory.make(op_e, diag, bc_dofs, op, transpose=True)
    else:
        Mfn = BlockJacobiGS(disc, J_e, diag, bc_dofs, transpose=True)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(disc.n_dofs))
    _, info = gmres_counted(op, b, M=Mfn, tol=tol, maxiter=900, restart=100)
    return info.iterations, bool(info.converged)


def test_transposed_amg_beats_transposed_block_gs():
    """The mirrored-sweep AMG cycle must converge the transposed system
    in far fewer Krylov iterations than one-level transposed block-GS
    (the primal-side measurement was 45-60 vs 488)."""
    prob = _amg_prob(L=1)
    it_mg, ok_mg = _transposed_probe(prob, "mg")
    it_gs, ok_gs = _transposed_probe(prob, "gs")
    assert ok_mg
    assert it_mg < 0.5 * it_gs or not ok_gs, (it_mg, it_gs, ok_gs)


def test_adjoint_sweep_with_amg_matches_plain():
    """Gradient with the MG-preconditioned adjoint == plain adjoint
    gradient (both solves converged to tight tolerance)."""
    prob = _amg_prob(L=1, tol=1e-12)
    traj = prob.solve_primal()
    tight = dataclasses.replace(
        prob.step_solver.cfg.linear, tol=1e-12, refine_iters=3
    )
    adj0 = Adjoint(prob.assembler, prob.qoi, prob.dbcs, tight)
    g0, _ = adj0.sweep(traj, prob.params0, prob.time_grid)
    adj1 = Adjoint(
        prob.assembler, prob.qoi, prob.dbcs, tight,
        mg_factory=prob.mg_factory,
    )
    assert adj1.mg_factory is not None
    g1, _ = adj1.sweep(traj, prob.params0, prob.time_grid)
    scale = float(jnp.max(jnp.abs(g0)))
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), atol=1e-9 * max(scale, 1.0)
    )


def test_geometric_mg_transpose_converges():
    """The geometric (refinement-chain) factory's mirrored cycle also
    solves the transposed system."""
    deck = make_deck(
        {"type": "notch2D", "h": 0.25, "refinements": 2},
        "small_J2",
        J2_MAT,
        BCS_2D(0.001),
        1,
    )
    deck["linear algebra"] = {
        "preconditioner": "multigrid",
        "method": "gmres",
        "tolerance": 1e-10,
    }
    prob = Problem(load_deck(deck))
    assert not isinstance(prob.mg_factory, AMGPrecondFactory)
    it, ok = _transposed_probe(prob, "mg")
    assert ok
    assert it < 200, it


def test_dist_adjoint_amg_matches_single_device():
    """Sharded adjoint sweep under the dist AMG mirrored cycle ==
    single-device adjoint gradient."""
    from calibr8_tpu.parallel.dist import DistAdjoint, DistContext, DistPrimal
    from calibr8_tpu.parallel.dist_mg import DistAMG

    prob = _amg_prob(L=1, tol=1e-12)
    tight = dataclasses.replace(
        prob.step_solver.cfg.linear, tol=1e-12, refine_iters=3
    )
    traj0 = prob.solve_primal()
    adj0 = Adjoint(
        prob.assembler, prob.qoi, prob.dbcs, tight,
        mg_factory=prob.mg_factory,
    )
    g0, _ = adj0.sweep(traj0, prob.params0, prob.time_grid)

    ctx = DistContext(prob, n_parts=8)
    assert isinstance(ctx._mg, DistAMG)
    traj1 = DistPrimal(ctx).run()
    g1, _ = DistAdjoint(ctx, linear_cfg=tight).sweep(
        traj1, prob.params0, prob.time_grid
    )
    scale = float(jnp.max(jnp.abs(g0)))
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), atol=1e-9 * max(scale, 1.0)
    )


def test_adjoint_precond_reuse_step_matches_none():
    """Adjoint sweep with 'preconditioner reuse: step' (the transposed
    hierarchy state built outside the Krylov program — at scale this
    is what splits the solve executable under the load ceiling) must
    reproduce the reuse-none gradient."""
    deck = make_deck(
        {"type": "notch2D", "h": 0.3, "refinements": 3},
        "small_J2",
        J2_MAT,
        BCS_2D(0.001),
        1,
    )
    deck["linear algebra"] = {
        "preconditioner": "multigrid",
        "method": "gmres",
        "tolerance": 1e-10,
    }
    prob = Problem(load_deck(deck))
    assert getattr(prob.mg_factory, "recursive", False)
    traj = prob.solve_primal()
    grads = {}
    for reuse in ("none", "step"):
        cfg = dataclasses.replace(
            prob.step_solver.cfg.linear, tol=1e-10, precond_reuse=reuse
        )
        adj = Adjoint(
            prob.assembler, prob.qoi, prob.dbcs, cfg,
            mg_factory=prob.mg_factory,
        )
        g, _ = adj.sweep(traj, prob.params0, prob.time_grid)
        grads[reuse] = np.asarray(g)
    scale = max(np.abs(grads["none"]).max(), 1.0)
    np.testing.assert_allclose(
        grads["step"], grads["none"], atol=1e-9 * scale
    )

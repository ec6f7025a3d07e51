"""Preconditioner-state split parity (mg.make_state / make(state=...)).

The recursive geometric MG's heavy per-Jacobian arrays (level Galerkin
products, node-block diagonal inverses, Chebyshev lmax bounds,
Newton-Schulz coarse inverses) are built once as a pytree and passed
back into the apply program — the MueLu reuse discipline
(source/calibr8/src/linear_solve.cpp:36-123) realized as a jit-program
split.  M built from state must reproduce the monolithic make() to
roundoff, including the transposed (adjoint) cycle, on both the
assembled-ELL and EBE level-apply paths.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.fem.assembly import ebe_matvec_disc
from calibr8_tpu.fem.bcs import apply_dbcs_matvec
from calibr8_tpu.problem import Problem

from tests.decks import BCS_2D, J2_MAT, make_deck


def _recursive_problem():
    deck = make_deck(
        {"type": "notch2D", "h": 0.25, "refinements": 3},
        "small_J2",
        J2_MAT,
        BCS_2D(0.001),
        1,
    )
    deck["linear algebra"] = {
        "preconditioner": "multigrid",
        "method": "gmres",
    }
    return Problem(load_deck(deck))


def _assembled(prob):
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
    return J_e, diag, bc_dofs


@pytest.fixture(scope="module")
def setup():
    prob = _recursive_problem()
    assert prob.mg_factory is not None and prob.mg_factory.recursive
    return (prob,) + _assembled(prob)


def _parity(prob, J_e, diag, bc_dofs, transpose):
    mg = prob.mg_factory
    disc = prob.disc
    op_e = J_e.swapaxes(-1, -2) if transpose else J_e

    def op(v):
        out = ebe_matvec_disc(op_e, disc, v)
        return apply_dbcs_matvec(out, diag, v, bc_dofs)

    state = mg.make_state(op_e, diag, bc_dofs, op, transpose=transpose)
    assert state is not None
    M_mono = mg.make(op_e, diag, bc_dofs, op, transpose=transpose)
    M_state = mg.make(
        op_e, diag, bc_dofs, op, transpose=transpose, state=state
    )
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal(disc.n_dofs), disc.dtype)
    z0 = M_mono(r)
    z1 = M_state(r)
    scale = float(jnp.linalg.norm(z0))
    err = float(jnp.linalg.norm(z0 - z1)) / max(scale, 1e-30)
    assert err < 1e-12, f"state-vs-monolithic M parity {err:.3e}"
    return state


@pytest.mark.smoke
def test_mg_state_parity_forward(setup):
    prob, J_e, diag, bc_dofs = setup
    _parity(prob, J_e, diag, bc_dofs, transpose=False)


def test_mg_state_parity_transpose(setup):
    prob, J_e, diag, bc_dofs = setup
    _parity(prob, J_e, diag, bc_dofs, transpose=True)


def test_mg_state_parity_ebe_levels(setup, monkeypatch):
    """The EBE level-apply path (CALIBR8_MG_LEVEL_ELL=0) stores the
    raw Galerkin blocks in the state instead of assembled ELL values."""
    monkeypatch.setenv("CALIBR8_MG_LEVEL_ELL", "0")
    prob, J_e, diag, bc_dofs = setup
    st = _parity(prob, J_e, diag, bc_dofs, transpose=False)
    assert st["u"][0]["A_T"] is None and st["u"][0]["JT"] is not None


def test_mg_state_across_jit_programs(setup):
    """State built in one jit program, consumed in another — the
    scale-bench split (bench._bench_newton_split): the solve program
    receives the hierarchy as arguments, not as traced computation."""
    prob, J_e, diag, bc_dofs = setup
    mg = prob.mg_factory
    disc = prob.disc

    def op_from(J):
        def op(v):
            out = ebe_matvec_disc(J, disc, v)
            return apply_dbcs_matvec(out, diag, v, bc_dofs)

        return op

    @jax.jit
    def build(J_e):
        return mg.make_state(J_e, diag, bc_dofs, op_from(J_e))

    @jax.jit
    def apply(J_e, state, r):
        M = mg.make(J_e, diag, bc_dofs, op_from(J_e), state=state)
        return M(r)

    state = build(J_e)
    rng = np.random.default_rng(5)
    r = jnp.asarray(rng.standard_normal(disc.n_dofs), disc.dtype)
    z_ref = mg.make(J_e, diag, bc_dofs, op_from(J_e))(r)
    z = apply(J_e, state, r)
    err = float(
        jnp.linalg.norm(z - z_ref) / jnp.maximum(jnp.linalg.norm(z_ref), 1e-30)
    )
    assert err < 1e-12, f"cross-jit state parity {err:.3e}"


def test_mg_state_lagged_solve_converges(setup):
    """Krylov solve preconditioned by a LAGGED hierarchy (state built
    from a nearby Jacobian) still converges — preconditioner quality,
    not correctness, is all the lag can cost."""
    from calibr8_tpu.solve import linear as linear_mod

    prob, J_e, diag, bc_dofs = setup
    disc = prob.disc
    mg = prob.mg_factory
    # "lagged" Jacobian: perturb the element blocks by 5%
    J_lag = J_e * (1.0 + 0.05)
    state = linear_mod.mg_make_state(
        linear_mod.LinearCfg(method="gmres"),
        J_lag, disc, diag, bc_dofs, mg,
    )
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(disc.n_dofs), disc.dtype)
    cfg = linear_mod.LinearCfg(
        method="gmres", tol=1e-8, max_iters=400, restart=80
    )
    x, rr = linear_mod.solve_info(
        cfg, J_e, disc, diag, b, bc_dofs, mg=mg, mg_state=state
    )
    assert float(rr) < 1e-7, f"lagged-M solve stalled: relres {float(rr)}"


def test_precond_reuse_step_matches_none():
    """Deck 'preconditioner reuse: step' (hierarchy built once per
    Newton step from the base Jacobian, lagged across its iterations —
    the MueLu reuse discipline) must converge the same primal to the
    same state: lag changes Krylov iteration counts only, never the
    solution (GMRES checks the true residual)."""
    states = {}
    for reuse in ("none", "step"):
        deck = make_deck(
            {"type": "notch2D", "h": 0.25, "refinements": 3},
            "small_J2",
            J2_MAT,
            BCS_2D(0.001),
            1,
        )
        deck["linear algebra"] = {
            "preconditioner": "multigrid",
            "method": "gmres",
            "preconditioner reuse": reuse,
        }
        prob = Problem(load_deck(deck))
        assert prob.step_solver.cfg.linear.precond_reuse == reuse
        x0, xi0, _ = prob.primal.initial_state()
        bc_dofs, bc_vals = prob.dbcs.arrays(prob.time_grid.time(1), 1)
        ext = jnp.zeros(prob.disc.n_dofs, prob.disc.dtype)
        x, xi, path, info = prob.step_solver.solve_at_step(
            x0, x0, xi0, prob.params0, bc_dofs, bc_vals, ext, step=1
        )
        if reuse == "step":
            assert prob.step_solver._mg_state is not None
        states[reuse] = np.asarray(x)
    s = max(np.abs(states["none"]).max(), 1e-12)
    np.testing.assert_allclose(
        states["step"], states["none"], atol=1e-8 * s
    )


def test_host_restart_loop_matches_solve_info(setup):
    """Host-orchestrated restarts (linear.solve_cycle jitted per cycle
    + host_restart_loop) reproduce the in-program while_loop solver
    (solve_info) on the same MG problem: same convergence, same
    iteration accounting discipline.  This is the scale path on the
    tunneled chip, where any single dispatch past ~50-60 s of device
    execution crashes the TPU worker (scripts/probe_long_dispatch.py)
    — the 1.1M-DOF adjoint MUST run its outer restarts on host."""
    from calibr8_tpu.solve import linear as linear_mod

    prob, J_e, diag, bc_dofs = setup
    disc = prob.disc
    mg = prob.mg_factory
    cfg = linear_mod.LinearCfg(
        method="gmres", tol=1e-8, max_iters=400, restart=25,
        refine_iters=1,
    )
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(disc.n_dofs), disc.dtype)

    for transpose in (False, True):
        x_ref, rr_ref, ki_ref = linear_mod.solve_info(
            cfg, J_e, disc, diag, b, bc_dofs, transpose=transpose,
            mg=mg, return_iters=True,
        )
        cyc = jax.jit(
            lambda z, stag: linear_mod.solve_cycle(
                cfg, J_e, disc, diag, b, z, stag, bc_dofs,
                transpose=transpose, mg=mg,
            )
        )
        x_h, rr_h, ki_h = linear_mod.host_restart_loop(
            lambda z, stag: cyc(z, jnp.asarray(stag, jnp.int32)),
            jnp.zeros_like(b), float(jnp.linalg.norm(b)), cfg.tol,
            cfg.max_iters, cfg.restart, cfg.refine_iters,
        )
        assert rr_h <= cfg.tol, f"host cycles stalled at {rr_h:.3e}"
        assert float(rr_ref) <= cfg.tol
        # same Krylov trajectory: identical per-cycle math => identical
        # iteration counts and bit-comparable solutions
        assert ki_h == int(ki_ref), (ki_h, int(ki_ref))
        err = float(jnp.linalg.norm(x_h - x_ref)) / max(
            float(jnp.linalg.norm(x_ref)), 1e-30
        )
        assert err < 1e-10, f"host-vs-program solution parity {err:.3e}"

"""Fully-jitted Newton/scan path: must match the host-orchestrated
solver, support vmap over experiments, and shard over devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.jit_newton import make_jit_step, make_jit_trajectory

from tests.decks import BCS_2D, J2_MAT, make_deck


@pytest.fixture(scope="module")
def prob():
    deck = make_deck({"type": "notch2D", "h": 0.25}, "small_J2", J2_MAT, BCS_2D(0.002), 3)
    return Problem(load_deck(deck))


def test_jit_trajectory_matches_host_solver(prob):
    traj = prob.solve_primal()
    run = make_jit_trajectory(prob.assembler, prob.time_grid, prob.dbcs)
    xs, xis, paths, norms, fails = jax.jit(run)(prob.params0)
    assert not bool(fails.any())
    np.testing.assert_allclose(
        np.asarray(xs[-1]), np.asarray(traj.x[-1]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(xis[-1]), np.asarray(traj.xi[-1]), atol=1e-9
    )


def test_vmap_multi_experiment(prob):
    """Batched calibration experiments: vmap the whole trajectory over a
    parameter batch (the multi-experiment axis — objective.hpp:41-45)."""
    run = make_jit_trajectory(prob.assembler, prob.time_grid, prob.dbcs)
    base = np.asarray(prob.params0)
    batch = jnp.asarray(
        np.stack([base, base * 1.05, base * 0.95])
    )  # 3 experiments
    xs, xis, paths, norms, fails = jax.jit(jax.vmap(run))(batch)
    assert xs.shape[0] == 3
    assert not bool(fails.any())
    # different parameters -> different responses
    assert float(jnp.abs(xs[1, -1] - xs[0, -1]).max()) > 1e-9
    # first experiment == unbatched run
    xs0, *_ = jax.jit(run)(prob.params0)
    np.testing.assert_allclose(
        np.asarray(xs[0, -1]), np.asarray(xs0[-1]), atol=1e-10
    )


@pytest.mark.smoke
def test_jitted_step_solver_deck_opt_in():
    """'global residual: {solver: jitted}' routes the primal through
    JitStepSolver and reproduces the host-solver trajectory + QoI."""
    from calibr8_tpu.solve.jit_newton import JitStepSolver

    deck = make_deck(
        {"type": "notch2D", "h": 0.25}, "small_J2", J2_MAT, BCS_2D(0.002), 2
    )
    deck_j = {k: (dict(v) if isinstance(v, dict) else v) for k, v in deck.items()}
    deck_j["residuals"] = {
        "global residual": dict(
            deck["residuals"]["global residual"], solver="jitted"
        ),
        "local residual": deck["residuals"]["local residual"],
    }
    p_host = Problem(load_deck(deck))
    p_jit = Problem(load_deck(deck_j))
    assert isinstance(p_jit.step_solver, JitStepSolver)
    t_host = p_host.solve_primal()
    t_jit = p_jit.solve_primal()
    np.testing.assert_allclose(
        np.asarray(t_jit.x[-1]), np.asarray(t_host.x[-1]), atol=1e-9
    )
    assert abs(t_jit.J - t_host.J) <= 1e-10 * max(abs(t_host.J), 1e-30)


def test_jitted_step_solver_rejects_mg_deck():
    deck = make_deck(
        {"type": "notch2D", "h": 0.25}, "small_J2", J2_MAT, BCS_2D(0.002), 1
    )
    deck["residuals"]["global residual"]["solver"] = "jitted"
    deck["linear algebra"] = {
        "method": "gmres",
        "tolerance": 1e-8,
        "maximum iterations": 200,
        "preconditioner": "multigrid",
    }
    deck["discretization"]["builtin mesh"]["refinements"] = 1
    with pytest.raises(ValueError, match="jitted"):
        Problem(load_deck(deck))

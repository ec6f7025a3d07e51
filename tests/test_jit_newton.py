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

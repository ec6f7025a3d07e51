"""Distributed AMG preconditioner (parallel/dist_mg.py): the sharded
Krylov solve under a deck-requested multigrid hierarchy must reproduce
the single-device answer (the MueLu-under-MPI analog,
reference: source/calibr8/src/linear_solve.cpp:36-123)."""

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.parallel.dist import DistContext, DistPrimal
from calibr8_tpu.parallel.dist_mg import DistAMG
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.amg import AMGPrecondFactory

from tests.decks import BCS_2D, J2_MAT, make_deck


def _prob(L, tol=1e-10):
    deck = make_deck(
        {"type": "notch2D", "h": 0.15, "refinements": L},
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


@pytest.mark.parametrize("L", [1, 2])
def test_dist_amg_matches_single_device(L):
    """AMG-preconditioned dist Newton == single-device solve across a
    refinement level (fine smoothing sharded, aggregate levels
    replicated via psum)."""
    prob = _prob(L)
    assert isinstance(prob.mg_factory, AMGPrecondFactory)
    ctx = DistContext(prob, n_parts=8)
    assert isinstance(ctx._mg, DistAMG)
    traj_d = DistPrimal(ctx).run()
    x_d = ctx.from_dist(traj_d["x"][-1])
    traj_s = prob.solve_primal()
    x_s = np.asarray(traj_s.x[-1])
    err = np.linalg.norm(x_d.reshape(-1) - x_s) / np.linalg.norm(x_s)
    assert err < 1e-9, err

"""Checkpointing, multi-QoI batch evaluation, time files — remaining
driver-level behaviors (reference:
main_evaluate_multiple_qois_and_gradients.cpp, disc.cpp time file)."""

import os

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.problem import Problem

from tests.decks import BCS_2D, J2_MAT, make_deck


def test_checkpoint_roundtrip(tmp_path):
    from calibr8_tpu.opt.checkpoint import load_checkpoint, save_checkpoint

    p = str(tmp_path / "ckpt")
    hist = [(np.array([0.0, 0.0]), 1.0), (np.array([0.1, -0.2]), 0.5)]
    save_checkpoint(p, np.array([0.1, -0.2]), hist, {"names": ["a", "b"]})
    x, h, meta = load_checkpoint(p)
    np.testing.assert_allclose(x, [0.1, -0.2])
    assert len(h) == 2 and abs(h[1][1] - 0.5) < 1e-15


def test_trajectory_roundtrip(tmp_path):
    from calibr8_tpu.opt.checkpoint import load_trajectory, save_trajectory

    deck = make_deck({"type": "notch2D", "h": 0.25}, "small_J2", J2_MAT, BCS_2D(0.002), 2)
    prob = Problem(load_deck(deck))
    traj = prob.solve_primal()
    p = str(tmp_path / "traj.npz")
    save_trajectory(p, traj)
    t2 = load_trajectory(p)
    np.testing.assert_allclose(np.asarray(t2.x[-1]), np.asarray(traj.x[-1]))
    np.testing.assert_allclose(np.asarray(t2.xi[-1]), np.asarray(traj.xi[-1]))


def test_multiple_qois_and_gradients():
    from calibr8_tpu.opt.multi_qoi import evaluate_multiple_qois_and_gradients
    from calibr8_tpu.opt.objective import ActiveParams, AdjointObjective
    from calibr8_tpu.solve.adjoint import Adjoint
    from calibr8_tpu.solve.linear import LinearCfg

    deck = make_deck({"type": "notch2D", "h": 0.25}, "small_J2", J2_MAT, BCS_2D(0.003), 2)
    prob = Problem(load_deck(deck))
    qois = [
        {"type": "average displacement"},
        {"type": "reaction", "coordinate index": 1, "coordinate value": 1.0,
         "coordinate tolerance": 1e-6, "reaction force component": 1},
    ]
    results = evaluate_multiple_qois_and_gradients(prob, qois)
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r["J"])
        assert np.all(np.isfinite(r["grad_all"]))
    # cross-check the avg-disp gradient against the single-QoI objective
    active = ActiveParams.from_inverse_spec(
        {"materials": {"body": {"E": [800.0, 1200.0], "Y": [5.0, 15.0]}}},
        prob.disc.elem_set_names, prob.model.param_names,
    )
    adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, LinearCfg())
    obj = AdjointObjective(prob, adj, active)
    x0 = active.to_canonical(active.extract(prob.params0))
    g_single = obj.gradient(x0)
    g_multi = active.grad_to_canonical(active.extract_grad(results[0]["grad_all"]))
    np.testing.assert_allclose(g_multi, g_single, rtol=1e-10)


def test_time_file(tmp_path):
    tf = tmp_path / "times.txt"
    tf.write_text("0.0\n0.5\n2.0\n")
    deck = make_deck({"type": "notch2D", "h": 0.3}, "small_J2", J2_MAT, BCS_2D(0.001), 2)
    deck["discretization"]["time file"] = str(tf)
    prob = Problem(load_deck(deck))
    assert prob.time_grid.num_steps == 2
    assert abs(prob.time_grid.dt(2) - 1.5) < 1e-15
    traj = prob.solve_primal()
    # final BC displacement = 0.001 * t_final = 0.002
    u, _ = prob.disc.split(traj.x[-1])
    ymax = prob.disc.mesh.node_sets["ymax"]
    np.testing.assert_allclose(np.asarray(u)[ymax, 1], 0.002, atol=1e-12)


def test_iterative_solver_matches_dense():
    """EBE-GMRES with the block u/p Gauss-Seidel preconditioner (the
    Teko BGS2x2 analog, linear_solve.cpp:36-123) reproduces the direct
    solve."""
    import jax.numpy as jnp

    deck = make_deck({"type": "notch2D", "h": 0.12}, "small_J2", J2_MAT, BCS_2D(0.001), 2)
    deck["linear algebra"] = {
        "method": "gmres", "tolerance": 1e-10, "maximum iterations": 300,
    }
    prob = Problem(load_deck(deck))
    traj_it = prob.solve_primal()
    deck2 = {**deck, "linear algebra": {"method": "dense"}}
    prob2 = Problem(load_deck(deck2))
    traj_d = prob2.solve_primal()
    err = float(jnp.max(jnp.abs(traj_it.x[-1] - traj_d.x[-1])))
    assert err < 1e-9, err

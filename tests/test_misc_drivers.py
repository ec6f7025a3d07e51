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


def test_normal_traction_qoi():
    """n . sigma . n on the pulled face equals the applied traction
    (normal_traction.cpp)."""
    from tests.decks import CUBE, HYPER_ELASTIC_MAT

    deck = make_deck(
        CUBE, "hyper_J2", HYPER_ELASTIC_MAT,
        {"expression": {
            "bc 1": [0, 0, "xmin", "0.0"],
            "bc 2": [0, 1, "ymin", "0.0"],
            "bc 3": [0, 2, "zmin", "0.0"]}},
        1,
        **{"traction bcs": {"bc 1": [0, "ymax", "0.", "1.0 * t", "0."]},
           "quantity of interest": {"type": "normal traction", "side set": "ymax"}},
    )
    prob = Problem(load_deck(deck))
    traj = prob.solve_primal()
    assert abs(traj.J - 1.0) < 5e-3


def test_vectorize_and_indicator_fields():
    from calibr8_tpu.io.fields_utils import add_node_set_fields, vectorize_fields
    from calibr8_tpu.mesh.generators import square

    data = {f"ux_{s}": np.full(5, s * 1.0) for s in range(3)}
    data.update({f"uy_{s}": np.full(5, s * 2.0) for s in range(3)})
    out = vectorize_fields(data, 2, comps=("ux", "uy"))
    assert out["measured_2"].shape == (5, 2)
    np.testing.assert_allclose(out["measured_2"][:, 1], 4.0)

    mesh = square(3)
    add_node_set_fields(mesh, ["xmin"])
    f = mesh.fields["xmin"]
    assert f.sum() == len(mesh.node_sets["xmin"])


def test_transfer_surface_data():
    from calibr8_tpu.io.fields_utils import transfer_surface_data

    rng = np.random.default_rng(0)
    src = rng.random((400, 2))
    vals = 1.0 + src[:, 0] - 2.0 * src[:, 1]
    tgt = rng.random((50, 2)) * 0.8 + 0.1
    out = transfer_surface_data(src, {"measured_1": vals}, tgt, radius=0.2, order=1)
    expect = 1.0 + tgt[:, 0] - 2.0 * tgt[:, 1]
    np.testing.assert_allclose(out["measured_1"], expect, atol=1e-10)

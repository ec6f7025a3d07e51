"""VFM gradient verification — the analog of the reference vfm tests
(reference: test/vfm/CMakeLists.txt): synthetic primal run writes
measured fields + load.dat; the FS_VFM and Adjoint_VFM objectives at a
perturbed parameter point produce gradients that (a) agree with each
other and (b) pass the FD log-drop check (reference regresses log10
drop 7.68 +- 0.1 on its mesh)."""

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.io.synthetic import attach_synthetic
from calibr8_tpu.opt.objective import fd_gradient_check
from calibr8_tpu.opt.vfm_objective import build_vfm_objective
from calibr8_tpu.problem import Problem

MESH = {"type": "notch2D", "h": 0.15}
# w vanishes on the Dirichlet boundary and equals e_y on the loaded top
# (the reference deck's virtual field — vfm_*_notch2D.yaml.in)
VF_EXPRS = {
    "w_x": "cos(4. * atan(1.) * (y - 0.5) / 1.) * x",
    "w_y": "(y * (2 * (y - 0.5) + 1.) / (2 * 1.))",
}


def _deck(materials, qoi):
    return {
        "discretization": {
            "builtin mesh": MESH,
            "num steps": 4,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {
                "type": "mechanics_plane_stress",
                "nonlinear max iters": 30,
                "nonlinear absolute tol": 1e-8,
                "nonlinear relative tol": 1e-8,
            },
            "local residual": {
                "type": "small_hill_plane_stress",
                "nonlinear max iters": 100,
                "nonlinear absolute tol": 1e-12,
                "nonlinear relative tol": 1e-12,
                "materials": {"body": materials},
            },
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 1, "ymax", "0.01 * t"],
            }
        },
        "quantity of interest": qoi,
    }


@pytest.fixture(scope="module")
def vfm_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vfm")
    load_file = str(tmp / "load.dat")
    hill = {"R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0}
    truth = {"E": 1000.0, "nu": 0.25, "Y": 2.0, "S": 10.0, "D": 50.0, **hill}
    syn = Problem(
        load_deck(
            _deck(
                truth,
                {
                    "type": "reaction mismatch",
                    "coordinate index": 1,
                    "coordinate value": 1.0,
                    "coordinate tolerance": 1e-6,
                    "reaction force component": 1,
                    "load out file": load_file,
                },
            )
        )
    )
    traj = syn.solve_primal()
    attach_synthetic(syn.mesh, syn.disc, traj)
    # objective evaluated at perturbed parameters (the reference's
    # vfm_*_check decks use Y=2.2, S=8, D=60)
    start = {"E": 1000.0, "nu": 0.25, "Y": 2.2, "S": 8.0, "D": 60.0, **hill}
    prob = Problem(load_deck(_deck(start, {})), mesh=syn.mesh)
    inverse = {
        "objective type": "FS_VFM",
        "objective scale factor": 1e2,
        "thickness": 1.0,
        "load input file": load_file,
        "materials": {"body": {"Y": [1.0, 3.0], "S": [5.0, 15.0], "D": [40.0, 80.0]}},
    }
    return prob, inverse


def test_fs_vfm_gradient(vfm_setup):
    prob, inverse = vfm_setup
    obj, active = build_vfm_objective(prob, inverse, VF_EXPRS)
    x0 = active.to_canonical(active.extract(prob.params0))
    J, g = obj.value_and_gradient(x0)
    assert np.isfinite(J) and J > 0
    drop, errs = fd_gradient_check(obj.value, g, x0, num_steps=11)
    assert drop > 6.0, f"log10 drop {drop}, errs {errs}"


def test_adjoint_vfm_matches_forward_sens(vfm_setup):
    prob, inverse = vfm_setup
    fs_obj, active = build_vfm_objective(prob, inverse, VF_EXPRS)
    inverse_adj = dict(inverse, **{"objective type": "Adjoint_VFM"})
    adj_obj, _ = build_vfm_objective(prob, inverse_adj, VF_EXPRS)
    x0 = active.to_canonical(active.extract(prob.params0))
    J_fs, g_fs = fs_obj.value_and_gradient(x0)
    J_adj, g_adj = adj_obj.value_and_gradient(x0)
    assert abs(J_fs - J_adj) / abs(J_fs) < 1e-12
    np.testing.assert_allclose(g_adj, g_fs, rtol=1e-9, atol=1e-12)

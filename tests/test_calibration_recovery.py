"""End-to-end parameter-recovery calibration — the analog of the
reference python FEMU test (reference: test/python/CMakeLists.txt:30-77):

  1. forward solve at truth parameters (Y=2, S=10, D=2) on the 2D
     plane-stress notch writes synthetic measured_<step> displacement
     fields and the per-step axial load (load.dat);
  2. the calibration objective (full-field displacement mismatch +
     axial-load mismatch, balance factor 4.22, weights 3.98e7) with the
     adjoint (pdeco) gradient under scipy L-BFGS-B recovers the truth
     parameters from perturbed starts (Y=2.6, S=7, D=3);
  3. recovered params must match truth at rtol 1e-3.
"""

import copy

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.io.synthetic import attach_synthetic
from calibr8_tpu.opt.drivers import run_inverse
from calibr8_tpu.opt.objective import ActiveParams, AdjointObjective
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg

TRUTH = {"Y": 2.0, "S": 10.0, "D": 2.0}

MESH = {"type": "notch2D", "h": 0.15}


def _base_deck(materials, qoi):
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
                "nonlinear max iters": 500,
                "nonlinear absolute tol": 1e-12,
                "nonlinear relative tol": 1e-12,
                "materials": {"body": materials},
            },
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 1, "ymax", "0.003 * t"],
            }
        },
        "quantity of interest": qoi,
    }


@pytest.mark.smoke
def test_femu_recovery_fast(tmp_path):
    """Fast-suite gate on the flagship synthetic -> calibrate -> recover
    loop (coarser mesh, 2 steps, 2 active params; the full reference
    configuration runs in the slow test below)."""
    load_file = str(tmp_path / "load.dat")
    hill = {"R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0}
    truth_mats = {"E": 1000.0, "nu": 0.25, **TRUTH, **hill}
    qoi_syn = {
        "type": "reaction mismatch",
        "coordinate index": 1,
        "coordinate value": 1.0,
        "coordinate tolerance": 1e-6,
        "reaction force component": 1,
        "load out file": load_file,
    }
    syn_deck = _base_deck(truth_mats, qoi_syn)
    syn_deck["discretization"]["builtin mesh"] = {"type": "notch2D", "h": 0.25}
    syn_deck["discretization"]["num steps"] = 2
    syn_deck["dirichlet bcs"]["expression"]["bc 3"] = [0, 1, "ymax", "0.005 * t"]
    syn = Problem(load_deck(syn_deck))
    traj = syn.solve_primal()
    attach_synthetic(syn.mesh, syn.disc, traj)

    start_mats = {**truth_mats, "Y": 2.5, "D": 2.8}
    cal_deck = copy.deepcopy(syn_deck)
    cal_deck["residuals"]["local residual"]["materials"] = {"body": start_mats}
    cal_deck["quantity of interest"] = {
        "type": "calibration",
        "balance factor": 4.22,
        "coordinate index": 1,
        "coordinate value": 1.0,
        "coordinate tolerance": 1e-6,
        "reaction force component": 1,
        "displacement weights": [3.98e7, 3.98e7],
        "load input file": load_file,
    }
    cal = Problem(load_deck(cal_deck), mesh=syn.mesh)
    adj = Adjoint(cal.assembler, cal.qoi, cal.dbcs, LinearCfg())
    active = ActiveParams.from_inverse_spec(
        {"materials": {"body": {"Y": [1.0, 3.0], "D": [1.0, 4.0]}}},
        cal.disc.elem_set_names,
        cal.model.param_names,
    )
    obj = AdjointObjective(cal, adj, active)
    x0 = active.to_canonical(active.extract(cal.params0))
    res = run_inverse(obj, active, x0=x0, max_iters=60, gtol=1e-12)
    recovered = dict(zip([n.split("/")[-1] for n in res.names], res.params))
    for name in ("Y", "D"):
        rel = abs(recovered[name] - TRUTH[name]) / TRUTH[name]
        assert rel < 5e-3, (
            f"{name} = {recovered[name]:.6f} vs {TRUTH[name]} "
            f"(rel {rel:.2e}); J = {res.J:.3e}, evals = {res.n_evals}"
        )


@pytest.mark.slow
@pytest.mark.parametrize("method", ["L-BFGS-B", "trust-constr"])
def test_femu_parameter_recovery(method, tmp_path):
    load_file = str(tmp_path / "load.dat")
    hill = {"R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0}

    # 1. synthetic generation at truth
    truth_mats = {"E": 1000.0, "nu": 0.25, **TRUTH, **hill}
    syn_deck = _base_deck(
        truth_mats,
        {
            "type": "reaction mismatch",
            "coordinate index": 1,
            "coordinate value": 1.0,
            "coordinate tolerance": 1e-6,
            "reaction force component": 1,
            "load out file": load_file,
        },
    )
    syn = Problem(load_deck(syn_deck))
    traj = syn.solve_primal()
    attach_synthetic(syn.mesh, syn.disc, traj)

    # 2. calibration from a perturbed start on the same mesh
    start_mats = {"E": 1000.0, "nu": 0.25, "Y": 2.6, "S": 7.0, "D": 3.0, **hill}
    cal_deck = _base_deck(
        start_mats,
        {
            "type": "calibration",
            "balance factor": 4.22,
            "coordinate index": 1,
            "coordinate value": 1.0,
            "coordinate tolerance": 1e-6,
            "reaction force component": 1,
            "displacement weights": [3.98e7, 3.98e7],
            "load input file": load_file,
        },
    )
    cal = Problem(load_deck(cal_deck), mesh=syn.mesh)
    adj = Adjoint(cal.assembler, cal.qoi, cal.dbcs, LinearCfg())
    active = ActiveParams.from_inverse_spec(
        {"materials": {"body": {"Y": [1.0, 3.0], "S": [5.0, 15.0], "D": [1.0, 4.0]}}},
        cal.disc.elem_set_names,
        cal.model.param_names,
    )
    obj = AdjointObjective(cal, adj, active)
    x0 = active.to_canonical(active.extract(cal.params0))

    out_file = str(tmp_path / "calibrated_params.txt")
    # trust-constr approaches the flat S-direction minimum more slowly
    # than L-BFGS-B on this problem; give it a larger budget
    max_iters = 150 if method == "L-BFGS-B" else 500
    res = run_inverse(
        obj, active, x0=x0, method=method, max_iters=max_iters,
        gtol=1e-10, out_file=out_file,
    )

    recovered = dict(zip([n.split("/")[-1] for n in res.names], res.params))
    for name, truth in TRUTH.items():
        rel = abs(recovered[name] - truth) / truth
        assert rel < 1e-3, (
            f"{method}: {name} = {recovered[name]:.6f} vs {truth} (rel {rel:.2e}); "
            f"J = {res.J:.3e}, evals = {res.n_evals}"
        )

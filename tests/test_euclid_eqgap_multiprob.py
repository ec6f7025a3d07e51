"""EUCLID multi-virtual-field objective, equilibrium gap, field DBCs,
and multi-problem objectives — the remaining L7/L8 behaviors
(reference: main_objective.cpp:409-509 EUCLID, equilibrium_gap.cpp,
dbcs.cpp field DBCs, test/adjoint/2prob.yaml.in)."""

import numpy as np
import jax.numpy as jnp
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.io.synthetic import attach_synthetic
from calibr8_tpu.opt.objective import (
    ActiveParams,
    AdjointObjective,
    MultiProblemObjective,
    fd_gradient_check,
)
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg
from calibr8_tpu.solve.vfm import VirtualPower


def _deck(materials, pull, qoi=None, num_steps=3):
    return {
        "discretization": {
            "builtin mesh": {"type": "notch2D", "h": 0.2},
            "num steps": num_steps,
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
                "nonlinear max iters": 200,
                "nonlinear absolute tol": 1e-12,
                "nonlinear relative tol": 1e-12,
                "materials": {"body": materials},
            },
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 1, "ymax", f"{pull} * t"],
            }
        },
        "quantity of interest": qoi or {"type": "average displacement"},
    }


HILL = {"R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0}
TRUTH = {"E": 1000.0, "nu": 0.25, "Y": 2.0, "S": 10.0, "D": 2.0, **HILL}
START = {"E": 1000.0, "nu": 0.25, "Y": 2.4, "S": 8.0, "D": 2.5, **HILL}
INV = {"materials": {"body": {"Y": [1.0, 3.0], "S": [5.0, 15.0], "D": [1.0, 4.0]}}}


@pytest.fixture(scope="module")
def measured():
    syn = Problem(load_deck(_deck(TRUTH, 0.004)))
    traj = syn.solve_primal()
    attach_synthetic(syn.mesh, syn.disc, traj)
    return syn, traj


def test_euclid_objective_gradient(measured):
    syn, traj = measured
    prob = Problem(load_deck(_deck(START, 0.004)), mesh=syn.mesh)
    from calibr8_tpu.opt.vfm_objective import EUCLIDObjective

    active = ActiveParams.from_inverse_spec(
        INV, prob.disc.elem_set_names, prob.model.param_names
    )
    vp = VirtualPower(prob, jnp.zeros(prob.disc.n_dofs, prob.disc.dtype))
    # per-step "measured" loads from the truth run reaction at ymax
    load = [0.1 * s for s in range(1, 4)]  # arbitrary measured loads
    obj = EUCLIDObjective(
        prob, vp, active, load,
        node_set_names=["ymax", "xmax"],
        vf_components=[1, 0],
        obj_scale_factors=[1.0, 2.0],
        load_scale_factors=[1.0, 0.0],
    )
    x0 = active.to_canonical(active.extract(prob.params0))
    J, g = obj.value_and_gradient(x0)
    assert np.isfinite(J) and J > 0
    drop, errs = fd_gradient_check(obj.value, g, x0, num_steps=10)
    assert drop > 5.0, f"log10 drop {drop}, errs {errs}"


def test_equilibrium_gap_gradient(measured):
    syn, traj = measured
    prob = Problem(load_deck(_deck(START, 0.004)), mesh=syn.mesh)
    from calibr8_tpu.opt.vfm_objective import EquilibriumGapObjective

    active = ActiveParams.from_inverse_spec(
        INV, prob.disc.elem_set_names, prob.model.param_names
    )
    vp = VirtualPower(prob, jnp.zeros(prob.disc.n_dofs, prob.disc.dtype))
    obj = EquilibriumGapObjective(prob, vp, active)
    x0 = active.to_canonical(active.extract(prob.params0))
    J, g = obj.value_and_gradient(x0)
    # the measured data came from DIFFERENT params -> positive gap
    assert J > 0
    drop, errs = fd_gradient_check(obj.value, g, x0, num_steps=10)
    assert drop > 5.0, f"log10 drop {drop}, errs {errs}"


def test_field_dbcs_reproduce_measured(measured):
    """Driving the primal with measured-field DBCs on the loaded
    boundary reproduces the truth response when params match
    (dbcs.cpp field DBCs)."""
    syn, traj = measured
    deck = _deck(TRUTH, 0.004)
    deck["dirichlet bcs"] = {
        "expression": {
            "bc 1": [0, 0, "xmin", "0.0"],
            "bc 2": [0, 1, "ymin", "0.0"],
        },
        "field": {"bc 3": [0, 1, "ymax", "measured"]},
    }
    prob = Problem(load_deck(deck), mesh=syn.mesh)
    traj2 = prob.solve_primal()
    err = float(jnp.max(jnp.abs(traj2.x[-1] - traj.x[-1])))
    assert err < 1e-8, err


def test_multi_problem_objective(measured):
    syn, traj = measured
    p1 = Problem(load_deck(_deck(START, 0.004)), mesh=syn.mesh)
    p2 = Problem(load_deck(_deck(START, 0.003)), mesh=syn.mesh)
    objs = []
    active = None
    for p in (p1, p2):
        adj = Adjoint(p.assembler, p.qoi, p.dbcs, LinearCfg())
        a = ActiveParams.from_inverse_spec(
            INV, p.disc.elem_set_names, p.model.param_names
        )
        active = active or a
        objs.append(AdjointObjective(p, adj, a))
    multi = MultiProblemObjective(objs, active)
    x0 = active.to_canonical(active.extract(p1.params0))
    J, g = multi.value_and_gradient(x0)
    J1 = objs[0].value(x0)
    J2 = objs[1].value(x0)
    assert abs(J - (J1 + J2)) < 1e-14
    drop, errs = fd_gradient_check(multi.value, g, x0, num_steps=9)
    assert drop > 5.0, f"log10 drop {drop}, errs {errs}"

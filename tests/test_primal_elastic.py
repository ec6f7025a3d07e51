"""End-to-end forward-solve regressions for the elastic models.

Mirrors the reference's golden-QoI regression strategy
(reference: source/calibr8/src/main_primal.cpp:203-219,
test/primal/cube_elastic.yaml.in): cube_elastic is a unit cube under
free thermal expansion with symmetry BCs — the exact solution is
u = cte*dT * x (linear), captured exactly by P1 elements, so
J = avg displacement = cte*dT/2 = 5.0e-3 on ANY mesh.  This golden
value is mesh-independent and transfers exactly from the reference.
"""

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.problem import Problem

CUBE_ELASTIC = {
    "cube elastic": {
        "problem": {"name": "cube_elastic"},
        "discretization": {
            "builtin mesh": {"type": "cube", "n": 2},
            "num steps": 1,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {
                "type": "mechanics",
                "nonlinear max iters": 15,
                "nonlinear absolute tol": 1e-8,
                "nonlinear relative tol": 1e-8,
                "print convergence": False,
            },
            "local residual": {
                "type": "elastic",
                "materials": {
                    "body": {"E": 1000.0, "nu": 0.25, "cte": 1e-3, "delta_T": 10.0}
                },
            },
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 2, "zmin", "0.0"],
            }
        },
        "quantity of interest": {"type": "average displacement"},
        "regression": {"QoI": 5.00000000000000184e-3, "relative error tol": 1.0e-6},
    }
}


@pytest.mark.smoke
def test_cube_elastic_golden_qoi():
    prob = Problem(load_deck(CUBE_ELASTIC))
    traj = prob.solve_primal()
    J = traj.J
    expected = 5.00000000000000184e-3
    assert abs(J - expected) / expected < 1e-6, f"J = {J}"
    assert prob.check_regression(J)


def test_cube_elastic_displacement_field():
    """The discrete solution must equal u = 0.01 * x exactly."""
    prob = Problem(load_deck(CUBE_ELASTIC))
    traj = prob.solve_primal()
    u, p = prob.disc.split(traj.x[-1])
    coords = np.asarray(prob.disc.coords)
    np.testing.assert_allclose(np.asarray(u), 0.01 * coords, atol=1e-9)
    # pressure: -hydro = -(kappa tr eps - 3 kappa cte dT) = 0 at solution
    np.testing.assert_allclose(np.asarray(p), 0.0, atol=1e-8)


def test_cube_elastic_traction():
    """Uniaxial traction on ymax of a unit cube: sigma_yy = t,
    u_y = t/E * y with lateral contraction — exact linear solution."""
    deck = {
        "problem": {"name": "cube_traction"},
        "discretization": {
            "builtin mesh": {"type": "cube", "n": 2},
            "num steps": 1,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {"type": "mechanics"},
            "local residual": {
                "type": "elastic",
                "materials": {"body": {"E": 1000.0, "nu": 0.25}},
            },
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 2, "zmin", "0.0"],
            }
        },
        "traction bcs": {"bc 1": [0, "ymax", "0.0", "1.0 * t", "0.0"]},
        "quantity of interest": {"type": "average displacement"},
    }
    prob = Problem(load_deck(deck))
    traj = prob.solve_primal()
    u, _ = prob.disc.split(traj.x[-1])
    coords = np.asarray(prob.disc.coords)
    E, nu, t = 1000.0, 0.25, 1.0
    expect = np.stack(
        [
            -nu * t / E * coords[:, 0],
            t / E * coords[:, 1],
            -nu * t / E * coords[:, 2],
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(u), expect, atol=1e-8)

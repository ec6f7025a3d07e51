"""Unit tests for the small_J2 radial-return local solve and an
end-to-end elastoplastic notch problem (the reference's flagship 2D
test: test/primal/notch2D_small_J2.yaml.in)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.models import create_local_model
from calibr8_tpu.models.base import ELASTIC, PLASTIC, Kinematics
from calibr8_tpu.models.newton import make_local_solver

E, NU, K, Y = 1000.0, 0.25, 100.0, 10.0
MU = E / (2 * (1 + NU))
PARAMS = jnp.asarray([E, NU, K, Y, 0.0, 0.0])


def analytic_radial_return(eps, pstrain_old, alpha_old):
    """Hand-rolled closed-form radial return for linear hardening."""
    d = eps.shape[0]
    dev_eps = eps - np.trace(eps) / 3.0 * np.eye(d)
    s_trial = 2 * MU * (dev_eps - pstrain_old)
    smag = np.linalg.norm(s_trial)
    f_trial = smag - np.sqrt(2.0 / 3.0) * (Y + K * alpha_old)
    if f_trial <= 0:
        return pstrain_old, alpha_old, ELASTIC
    dalpha = f_trial / (2 * MU * np.sqrt(1.5) + np.sqrt(2.0 / 3.0) * K)
    n = s_trial / smag
    pstrain = pstrain_old + np.sqrt(1.5) * dalpha * n
    return pstrain, alpha_old + dalpha, PLASTIC


@pytest.mark.parametrize("dim", [2, 3])
def test_radial_return_matches_analytic(dim):
    model = create_local_model("small_J2", dim)
    solver = make_local_solver(model, max_iters=100, abs_tol=1e-12, rel_tol=1e-12)

    rng = np.random.default_rng(0)
    for trial in range(5):
        gu = 0.02 * rng.standard_normal((dim, dim))
        kin = Kinematics(
            grad_u=jnp.asarray(gu), grad_u_prev=jnp.zeros((dim, dim))
        )
        xi_prev = jnp.zeros(model.nxi())
        res = solver(xi_prev, kin, PARAMS)
        assert not bool(res.failed)

        eps = 0.5 * (gu + gu.T)
        nc = 3 if dim == 2 else 6
        p_np, a_np, path_np = analytic_radial_return(
            eps, np.zeros((dim, dim)), 0.0
        )
        got_p = np.asarray(res.xi[:nc])
        if dim == 2:
            expect_p = np.array([p_np[0, 0], p_np[1, 1], p_np[0, 1]])
        else:
            expect_p = np.array(
                [p_np[0, 0], p_np[1, 1], p_np[2, 2], p_np[0, 1], p_np[0, 2], p_np[1, 2]]
            )
        np.testing.assert_allclose(got_p, expect_p, atol=1e-10)
        np.testing.assert_allclose(float(res.xi[nc]), a_np, atol=1e-10)
        assert int(res.path) == path_np


def test_path_dependence_two_steps():
    """Load then partially unload: step 2 must be elastic with frozen
    plastic strain (path dependence through xi_prev)."""
    dim = 3
    model = create_local_model("small_J2", dim)
    solver = make_local_solver(model, max_iters=100, abs_tol=1e-12, rel_tol=1e-12)
    gu1 = jnp.asarray(np.diag([0.03, -0.01, -0.01]))
    kin1 = Kinematics(grad_u=gu1, grad_u_prev=jnp.zeros((3, 3)))
    res1 = solver(jnp.zeros(model.nxi()), kin1, PARAMS)
    assert int(res1.path) == PLASTIC

    gu2 = 0.9 * gu1
    kin2 = Kinematics(grad_u=gu2, grad_u_prev=gu1)
    res2 = solver(res1.xi, kin2, PARAMS)
    assert int(res2.path) == ELASTIC
    np.testing.assert_allclose(
        np.asarray(res2.xi), np.asarray(res1.xi), atol=1e-14
    )


NOTCH2D_SMALL_J2 = {
    "problem": {"name": "notch2D_small_J2"},
    "discretization": {
        "builtin mesh": {"type": "notch2D", "h": 0.12},
        "num steps": 8,
        "step size": 1.0,
    },
    "residuals": {
        "global residual": {
            "type": "mechanics",
            "nonlinear max iters": 15,
            "nonlinear absolute tol": 1e-8,
            "nonlinear relative tol": 1e-8,
        },
        "local residual": {
            "type": "small_J2",
            "nonlinear max iters": 500,
            "nonlinear absolute tol": 1e-12,
            "nonlinear relative tol": 1e-12,
            "materials": {
                "body": {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0, "cte": 0.0, "delta_T": 0.0}
            },
        },
    },
    "dirichlet bcs": {
        "expression": {
            "bc 1": [0, 0, "xmin", "0.0"],
            "bc 2": [0, 1, "ymin", "0.0"],
            "bc 3": [0, 1, "ymax", "0.001 * t"],
        }
    },
    "quantity of interest": {"type": "average displacement"},
}


@pytest.mark.smoke
def test_notch2d_small_j2_end_to_end():
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.problem import Problem

    prob = Problem(load_deck(NOTCH2D_SMALL_J2))
    traj = prob.solve_primal()
    # plasticity must activate by the final step
    assert int(jnp.sum(traj.path[-1])) > 0
    # QoI positive and in the physically sensible range (final avg disp
    # is O(half the applied 8e-3 pull))
    J = traj.J
    assert 1e-3 < J < 2e-2, J
    # self-regression golden (our mesh differs from the reference's:
    # the reference value for ITS mesh at h=0.075 is 6.55208497e-3; ours
    # at h=0.12 is 0.6% away — consistent physics).  Guards against
    # behavioral drift in mechanics/plasticity/assembly.
    assert J == pytest.approx(6.51333502442964264e-03, rel=1e-8)

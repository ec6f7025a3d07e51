"""NN/ICNN building blocks and the hybrid NN-hardening model — the
analog of the reference unit tests (test/unit/nn.cpp:85-104 FD
derivative checks wrt params and inputs; test/unit/icnn.cpp sanity) and
of the hybrid_hyper_J2_plane_stress model where NN weights join the
calibrated parameters (hybrid_hyper_J2_plane_stress.cpp:114-128)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.models.nn import FFNN, FICNN


def test_ffnn_derivatives_match_fd():
    nn = FFNN("sigmoid", [2, 8, 8, 1])
    p = jnp.asarray(nn.init_params)
    x = jnp.asarray([0.3, -0.2])

    f_p = lambda p_: nn(p_, x)[0]
    f_x = lambda x_: nn(p, x_)[0]
    gp = jax.grad(f_p)(p)
    gx = jax.grad(f_x)(x)
    rng = np.random.default_rng(0)
    vp = jnp.asarray(rng.standard_normal(p.shape))
    vx = jnp.asarray(rng.standard_normal(x.shape))
    h = 1e-6
    fd_p = (f_p(p + h * vp) - f_p(p - h * vp)) / (2 * h)
    fd_x = (f_x(x + h * vx) - f_x(x - h * vx)) / (2 * h)
    assert abs(float(jnp.dot(gp, vp)) - float(fd_p)) < 1e-8
    assert abs(float(jnp.dot(gx, vx)) - float(fd_x)) < 1e-8


def test_ficnn_convexity():
    nn = FICNN("softplus", [1, 6, 6, 1], enforce_convex=True)
    p = jnp.asarray(nn.init_params)
    ys = np.linspace(-2, 2, 41)
    vals = np.array([float(nn(p, jnp.asarray([y]))[0]) for y in ys])
    second = np.diff(vals, 2)
    assert np.all(second > -1e-8), "FICNN output must be convex in its input"


def test_hybrid_model_primal_and_gradient():
    """hybrid_hyper_J2_plane_stress runs end-to-end and its adjoint
    gradient (including NN weights) passes an FD check."""
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.opt.objective import ActiveParams, AdjointObjective, fd_gradient_check
    from calibr8_tpu.problem import Problem
    from calibr8_tpu.solve.adjoint import Adjoint
    from calibr8_tpu.solve.linear import LinearCfg

    deck = {
        "discretization": {
            "builtin mesh": {"type": "notch2D", "h": 0.2},
            "num steps": 3,
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
                "type": "hybrid_hyper_J2_plane_stress",
                "nonlinear max iters": 200,
                "nonlinear absolute tol": 1e-12,
                "nonlinear relative tol": 1e-12,
                "embedded model": {
                    "activation function": "sigmoid",
                    "topology": [1, 4, 1],
                    "input scale": 1.0,
                    "output scale": 10.0,
                },
                "materials": {"body": {"E": 1000.0, "nu": 0.25, "Y": 2.0}},
            },
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 1, "ymax", "0.005 * t"],
            }
        },
        "quantity of interest": {"type": "average displacement"},
    }
    prob = Problem(load_deck(deck))
    traj = prob.solve_primal()
    assert np.isfinite(traj.J) and traj.J > 0
    assert int(jnp.sum(traj.path[-1])) > 0  # NN hardening exercised

    # calibrate Y and two NN weights: gradient check
    adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, LinearCfg())
    inverse = {
        "materials": {
            "body": {"Y": [1.0, 3.0], "nn_0": [-2.0, 2.0], "nn_1": [-2.0, 2.0]}
        }
    }
    active = ActiveParams.from_inverse_spec(
        inverse, prob.disc.elem_set_names, prob.model.param_names
    )
    obj = AdjointObjective(prob, adj, active)
    x0 = active.to_canonical(active.extract(prob.params0))
    g = obj.gradient(x0)
    assert np.all(np.isfinite(g))
    drop, errs = fd_gradient_check(obj.value, g, x0, num_steps=10)
    assert drop > 5.0, f"log10 drop {drop}, errs {errs}"

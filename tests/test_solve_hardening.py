"""Linear-solve failure detection and parameter-transform modes.

The reference checks Belos solver status after every Krylov solve and
fails on non-convergence (linear_solve.cpp:106-123, primal.cpp:163-195),
and its Python driver layer supports value/log/bounds parameter
scalings (python/calibr8/util/parameter_transforms.py:4-66)."""

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.opt import transforms as tr
from calibr8_tpu.opt.objective import ActiveParams, AdjointObjective, fd_gradient_check
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg
from calibr8_tpu.solve.newton import NewtonCfg, NewtonSolveError, StepSolver

from tests.decks import BCS_2D, J2_MAT, make_deck


def test_singular_linear_solve_raises():
    """A rank-deficient Jacobian must be detected from the recomputed
    Krylov residual (the Belos status-check analog) and fail the step
    rather than silently feed garbage dx into the Newton update."""
    import jax.numpy as jnp

    from calibr8_tpu.solve.linear import solve_info

    deck = make_deck(
        {"type": "notch2D", "h": 0.25}, "small_J2", J2_MAT, BCS_2D(0.001), 1
    )
    prob = Problem(load_deck(deck))
    a = prob.assembler
    disc = prob.disc
    x0, xi0, _ = prob.primal.initial_state()
    bc_dofs, _ = prob.dbcs.arrays(1.0, 1)
    loc = a.local_solve(x0, x0, xi0, prob.params0)
    R, J_e, diag = a.residual_and_jacobian(
        x0, x0, loc.xi, xi0, loc.path, prob.params0
    )

    # zero every row touching one interior node -> genuinely singular
    conn = np.asarray(disc.conn)
    bc_nodes = set()
    for ns in disc.mesh.node_sets.values():
        bc_nodes.update(np.asarray(ns).tolist())
    target = next(
        int(n) for n in np.unique(conn) if int(n) not in bc_nodes
    )
    rowmask = np.repeat(conn != target, disc.ndpn, axis=1)  # (n_e, nde)
    J_z = J_e * jnp.asarray(rowmask)[:, :, None]
    mask_flat = np.ones(disc.n_dofs)
    for eq in range(disc.spec.dim):
        mask_flat[disc.u_dof(np.array([target]), eq)] = 0.0
    if disc.spec.mixed:
        mask_flat[disc.p_dof(np.array([target]))] = 0.0
    diag_z = diag * jnp.asarray(mask_flat)

    rng = np.random.default_rng(3)
    # rhs concentrated on the dead rows: unreducible residual
    b = jnp.asarray(
        (1.0 - mask_flat) + 0.01 * mask_flat * rng.standard_normal(disc.n_dofs)
    )
    # max_iters counts TOTAL inner iterations; give the healthy check a
    # full-dimension Krylov budget
    cfg = LinearCfg(
        method="gmres", tol=1e-10, max_iters=2 * disc.n_dofs, restart=200
    )
    x, relres = solve_info(cfg, J_z, disc, diag_z, b, bc_dofs)
    rr = float(relres)
    assert not np.isfinite(rr) or rr > 0.5

    solver = StepSolver(a, NewtonCfg(linear=cfg), use_pallas=False)
    with pytest.raises(NewtonSolveError, match="linear solve diverged"):
        solver._check_linear(x, relres)
    # and the healthy system converges cleanly through the same path
    b2 = jnp.asarray(rng.standard_normal(disc.n_dofs))
    x, relres = solve_info(cfg, J_e, disc, diag, b2, bc_dofs)
    assert float(relres) <= 1e-8
    solver._check_linear(x, relres)


def test_krylov_counted_reports_stall():
    from calibr8_tpu.solve.krylov import gmres_counted
    import jax.numpy as jnp

    A = jnp.zeros((4, 4)).at[0, 0].set(1.0)  # rank-1, singular
    b = jnp.ones(4)
    x, info = gmres_counted(lambda v: A @ v, b, tol=1e-10, maxiter=20)
    assert not info.converged
    assert info.relres > 0.5


def test_transform_roundtrips():
    scales = [None, 10.0, (2.0, 8.0)]
    p = np.array([3.7, 25.0, 5.5])
    x = tr.transform_parameters(p, scales, False)
    back = tr.transform_parameters(x, scales, True)
    np.testing.assert_allclose(back, p, rtol=1e-14)
    # log: canonical is log(p/ref)
    assert np.isclose(x[1], np.log(2.5))
    # bounds: canonical in [-1, 1]
    assert -1.0 <= x[2] <= 1.0
    # chain-rule factors
    h = 1e-7
    for i, s in enumerate(scales):
        fd = (
            tr.from_canonical(x[i] + h, s) - tr.from_canonical(x[i] - h, s)
        ) / (2 * h)
        assert np.isclose(tr.first_deriv(p[i], s), fd, rtol=1e-6)
    assert tr.opt_bounds(None) == (None, None)
    assert tr.opt_bounds(10.0) == (None, None)
    assert tr.opt_bounds((0.0, 1.0)) == (-1.0, 1.0)


def test_log_scaled_adjoint_gradient():
    """FD-vs-adjoint gradient check with mixed log/bounds scalings —
    the log mode's dp/dx = p chain rule must be applied."""
    deck = make_deck(
        {"type": "notch2D", "h": 0.25}, "small_J2", J2_MAT, BCS_2D(0.001), 2
    )
    prob = Problem(load_deck(deck))
    adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, LinearCfg())
    # E log-scaled (ref 1000), Y bounds-scaled
    inverse = {"materials": {"body": {"E": 1000.0, "Y": [5.0, 15.0]}}}
    active = ActiveParams.from_inverse_spec(
        inverse, prob.disc.elem_set_names, prob.model.param_names
    )
    assert active.opt_bounds() == [(None, None), (-1.0, 1.0)]
    obj = AdjointObjective(prob, adj, active)
    x0 = active.to_canonical(active.extract(prob.params0))
    np.testing.assert_allclose(
        active.from_canonical(x0), active.extract(prob.params0), rtol=1e-12
    )
    g = obj.gradient(x0)
    drop, errs = fd_gradient_check(obj.value, g, x0)
    assert drop > 5.0, f"log10 drop {drop}, errs {errs}"

"""Domain-decomposed (sharded-DOF) path: partition invariants, halo
exchange, assembly/matvec/solve/adjoint parity against the single-device
path on the 8-device CPU mesh — the rebuild's analog of the reference's
owned/ghost Export-ADD correctness-by-construction (linear_alg.hpp:38-53)
plus real multi-rank runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.problem import Problem
from calibr8_tpu.parallel.dist import DistAdjoint, DistContext, DistPrimal
from calibr8_tpu.parallel.partition import build_partition
from calibr8_tpu.solve.adjoint import Adjoint

from tests.decks import BCS_2D, J2_MAT, make_deck


@pytest.fixture(scope="module")
def prob():
    deck = make_deck(
        {"type": "notch2D", "h": 0.1}, "small_J2", J2_MAT, BCS_2D(0.001), 2
    )
    return Problem(load_deck(deck))


@pytest.fixture(scope="module")
def ctx(prob):
    assert jax.device_count() >= 8
    return DistContext(prob, n_parts=8)


def test_partition_invariants(prob, ctx):
    part = ctx.part
    disc = prob.disc
    conn = np.asarray(disc.conn)
    # every element appears exactly once
    real = part.elems[part.elems >= 0]
    assert len(real) == disc.n_elem
    assert len(np.unique(real)) == disc.n_elem
    # every node owned exactly once, slots consistent
    own = part.own_nodes[part.own_nodes >= 0]
    assert len(own) == disc.n_nodes
    assert len(np.unique(own)) == disc.n_nodes
    for k in range(part.n_parts):
        for s, gid in enumerate(part.own_nodes[k]):
            if gid >= 0:
                assert part.owner_of[gid] == k
                assert part.own_slot_of[gid] == s
    # conn_local maps back to the global connectivity
    for k in range(part.n_parts):
        mask = part.elems[k] >= 0
        got = part.local_nodes[k][part.conn_local[k][mask]]
        np.testing.assert_array_equal(got, conn[part.elems[k][mask]])
    # send/recv pairing: what j sends to k is exactly k's ghost list from j
    for k in range(part.n_parts):
        for j in range(part.n_parts):
            s = part.send_slots[j, k]
            r = part.recv_slots[k, j]
            sent = part.own_nodes[j][s[s < part.N_own]]
            recvd = part.local_nodes[k][r[r < part.N_loc]]
            np.testing.assert_array_equal(sent, recvd)


def test_dist_assembly_matches_single_device(prob, ctx):
    disc = prob.disc
    a = prob.assembler
    rng = np.random.default_rng(0)
    x = jnp.asarray(1e-3 * rng.standard_normal(disc.n_dofs))
    xp = jnp.asarray(1e-4 * rng.standard_normal(disc.n_dofs))
    xi_prev = jnp.tile(
        jnp.asarray(a.model.init_xi())[None, :], (disc.n_elem, 1)
    )

    loc = a.local_solve(x, xp, xi_prev, prob.params0)
    R0, J_e0, diag0 = a.residual_and_jacobian(
        x, xp, loc.xi, xi_prev, loc.path, prob.params0
    )

    Xd, XPd = ctx.to_dist(x), ctx.to_dist(xp)
    xid = ctx.to_dist_elem(np.asarray(xi_prev))
    np.testing.assert_allclose(np.asarray(ctx.from_dist(Xd)), np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ctx.from_dist_device(Xd)), np.asarray(x)
    )

    R, J_T, diag, xi, path, nfail = ctx.assemble(Xd, XPd, xid, prob.params0)
    np.testing.assert_allclose(
        np.asarray(ctx.from_dist(R)), np.asarray(R0), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ctx.from_dist(diag)), np.asarray(diag0), atol=5e-12
    )
    np.testing.assert_allclose(
        np.asarray(ctx.from_dist_elem(xi)), np.asarray(loc.xi), atol=1e-14
    )
    np.testing.assert_array_equal(
        np.asarray(ctx.from_dist_elem(path)), np.asarray(loc.path)
    )
    assert int(nfail) == int(jnp.sum(loc.failed))

    # EBE matvec through the halo exchange == single-device matvec
    from calibr8_tpu.fem.assembly import ebe_matvec_disc

    v = jnp.asarray(rng.standard_normal(disc.n_dofs))
    y0 = ebe_matvec_disc(J_e0, disc, v)
    y = ctx.from_dist(ctx.matvec(J_T, ctx.to_dist(v)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), atol=5e-12)


@pytest.mark.smoke
def test_dist_primal_matches_single_device(prob, ctx):
    traj0 = prob.solve_primal()
    traj1 = DistPrimal(ctx).run()
    x0 = np.asarray(traj0.x[-1])
    x1 = np.asarray(ctx.from_dist(traj1["x"][-1]))
    np.testing.assert_allclose(x1, x0, atol=1e-10)
    np.testing.assert_allclose(
        traj1["qoi_values"], traj0.qoi_values, rtol=1e-10
    )


def test_dist_adjoint_gradient_matches_single_device(prob, ctx):
    import dataclasses

    tight = dataclasses.replace(
        prob.step_solver.cfg.linear, tol=1e-13, refine_iters=3
    )
    traj0 = prob.solve_primal()
    adj0 = Adjoint(prob.assembler, prob.qoi, prob.dbcs, tight)
    grad0, _ = adj0.sweep(traj0, prob.params0, prob.time_grid)

    traj1 = DistPrimal(ctx).run()
    grad1, _ = DistAdjoint(ctx, linear_cfg=tight).sweep(
        traj1, prob.params0, prob.time_grid
    )
    scale = float(jnp.max(jnp.abs(grad0)))
    np.testing.assert_allclose(
        np.asarray(grad1), np.asarray(grad0), atol=1e-10 * max(scale, 1.0)
    )


def test_dist_memory_is_sharded(ctx):
    """DOF vectors and element arrays hold 1/n_parts per device — the
    scalable layout the replicated-DOF GSPMD path cannot give."""
    x = ctx.zeros()
    shard = x.addressable_shards[0].data
    assert x.nbytes == ctx.part.n_parts * shard.nbytes
    assert ctx.detJ.nbytes == ctx.part.n_parts * ctx.detJ.addressable_shards[0].data.nbytes


@pytest.mark.slow
def test_dist_parity_large_mesh():
    """>= 10k-element parity: sharded Newton + adjoint gradient match the
    single-device results to 1e-10 on a non-trivial mesh."""
    deck = make_deck(
        {"type": "notch2D", "h": 0.0145},
        "small_J2",
        J2_MAT,
        BCS_2D(0.001),
        1,
    )
    # tight Krylov budget so BOTH paths solve their linear systems to
    # near machine precision — the 1e-10 x-parity assertion compares
    # converged solutions, not solver tails
    deck["linear algebra"] = {
        "method": "gmres",
        "tolerance": 1e-13,
        "maximum iterations": 9000,
    }
    prob = Problem(load_deck(deck))
    assert prob.disc.n_elem >= 10000
    ctx = DistContext(prob, n_parts=8)

    traj0 = prob.solve_primal()
    traj1 = DistPrimal(ctx).run()
    x0 = np.asarray(traj0.x[-1])
    x1 = np.asarray(ctx.from_dist(traj1["x"][-1]))
    scale = np.abs(x0).max()
    assert np.abs(x1 - x0).max() <= 1e-10 * max(scale, 1.0) + 1e-12
    np.testing.assert_allclose(
        traj1["qoi_values"], traj0.qoi_values, rtol=1e-9
    )

    adj0 = Adjoint(
        prob.assembler, prob.qoi, prob.dbcs, prob.step_solver.cfg.linear
    )
    grad0, _ = adj0.sweep(traj0, prob.params0, prob.time_grid)
    grad1, _ = DistAdjoint(ctx).sweep(traj1, prob.params0, prob.time_grid)
    scale_g = float(np.abs(np.asarray(grad0)).max())
    assert np.abs(np.asarray(grad1) - np.asarray(grad0)).max() <= 1e-8 * scale_g

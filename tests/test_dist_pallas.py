"""Dist (shard_map) assembly through the per-shard fused Pallas kernel:
interpret-mode parity against the dist XLA element path on the CPU x8
mesh.  On TPU the same kernel compiles via Mosaic — this is the dist
analog of the single-chip fast path (fem/pallas_assembly.py), with the
halo gather supplying element dofs and Export-ADD doing the scatter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.parallel.dist import DistContext
from calibr8_tpu.problem import Problem

from tests.decks import BCS_2D, J2_MAT, make_deck


def test_dist_pallas_assembly_matches_dist_xla(monkeypatch):
    # default tier, not smoke: the interpret-mode reference pass costs
    # ~7 min on the CPUx8 box (dist smoke coverage lives in
    # test_dist.py::test_dist_primal_matches_single_device)
    assert jax.device_count() >= 8
    deck = make_deck(
        {"type": "notch2D", "h": 0.22}, "small_J2", J2_MAT, BCS_2D(0.001), 2
    )
    prob = Problem(load_deck(deck))
    disc = prob.disc
    rng = np.random.default_rng(0)
    x = jnp.asarray(1e-3 * rng.standard_normal(disc.n_dofs))
    xp = jnp.asarray(1e-4 * rng.standard_normal(disc.n_dofs))
    xi_prev = jnp.tile(
        jnp.asarray(prob.assembler.model.init_xi())[None, :],
        (disc.n_elem, 1),
    )

    ctx0 = DistContext(prob, n_parts=8)
    monkeypatch.setenv("CALIBR8_PALLAS_INTERPRET", "1")
    ctx1 = DistContext(prob, n_parts=8)

    args = (
        ctx0.to_dist(x),
        ctx0.to_dist(xp),
        ctx0.to_dist_elem(np.asarray(xi_prev)),
        prob.params0,
    )
    R0, J0, d0, xi0, path0, nf0 = ctx0.assemble(*args)
    R1, J1, d1, xi1, path1, nf1 = ctx1.assemble(*args)

    r0 = np.asarray(ctx0.from_dist(R0))
    r1 = np.asarray(ctx1.from_dist(R1))
    sR = max(np.abs(r0).max(), 1e-12)
    np.testing.assert_allclose(r1, r0, atol=1e-9 * sR)
    g0, g1 = np.asarray(ctx0.from_dist(d0)), np.asarray(ctx1.from_dist(d1))
    sJ = max(np.abs(g0).max(), 1e-12)
    np.testing.assert_allclose(g1, g0, atol=5e-7 * sJ)
    np.testing.assert_array_equal(
        np.asarray(ctx1.from_dist_elem(path1)),
        np.asarray(ctx0.from_dist_elem(path0)),
    )
    np.testing.assert_allclose(
        np.asarray(ctx1.from_dist_elem(xi1)),
        np.asarray(ctx0.from_dist_elem(xi0)),
        rtol=1e-8,
        atol=1e-10,
    )
    jj0, jj1 = np.asarray(J0), np.asarray(J1)
    np.testing.assert_allclose(
        jj1, jj0, atol=5e-7 * max(np.abs(jj0).max(), 1e-12)
    )
    assert int(nf0) == int(nf1) == 0


def test_dist_ell_trailing_pallas_matvec_matches_einsum(monkeypatch):
    """The TPU dist Krylov apply (ell_trailing + ell_matvec_T: padded
    trailing blocks through the Pallas lane-FMA kernel inside
    shard_map) against the row-layout einsum apply (ell_matvec) in
    interpret mode — the path bench.run_dist_overhead and the dist
    solve take on hardware (it shipped broken once: pallas_call's
    missing vma annotation trips shard_map's check_vma)."""
    assert jax.device_count() >= 8
    deck = make_deck(
        {"type": "notch2D", "h": 0.22}, "small_J2", J2_MAT, BCS_2D(0.001), 2
    )
    prob = Problem(load_deck(deck))
    disc = prob.disc
    rng = np.random.default_rng(1)
    x = jnp.asarray(1e-3 * rng.standard_normal(disc.n_dofs))
    xp = jnp.asarray(1e-4 * rng.standard_normal(disc.n_dofs))
    xi_prev = jnp.tile(
        jnp.asarray(prob.assembler.model.init_xi())[None, :],
        (disc.n_elem, 1),
    )

    ctx = DistContext(prob, n_parts=8)
    Xd = ctx.to_dist(x)
    _, J_T, *_ = ctx.assemble(
        Xd, ctx.to_dist(xp), ctx.to_dist_elem(np.asarray(xi_prev)),
        prob.params0,
    )
    A_ell = ctx.ell_assemble(J_T)
    v = ctx.to_dist(jnp.asarray(rng.standard_normal(disc.n_dofs)))

    y0 = np.asarray(ctx.from_dist(ctx.ell_matvec(A_ell, v)))

    monkeypatch.setenv("CALIBR8_PALLAS_INTERPRET", "1")
    A_T = ctx.ell_trailing(A_ell)
    y1 = np.asarray(ctx.from_dist(ctx.ell_matvec_T(A_T, v)))

    s = max(np.abs(y0).max(), 1e-12)
    np.testing.assert_allclose(y1, y0, atol=1e-9 * s)

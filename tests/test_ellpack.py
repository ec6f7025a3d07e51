"""Assembled node-block ELLPACK operator vs the matrix-free EBE apply
(solve/ellpack.py — the Tpetra block-CRS + scatter-offsets analog)."""

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.deck import load_deck
from calibr8_tpu.fem.assembly import ebe_matvec_disc
from calibr8_tpu.fem.bcs import apply_dbcs_matvec
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.ellpack import EllOperator, assemble_ell

from tests.decks import BCS_2D, J2_MAT, make_deck
import pytest


def test_ell_matches_ebe():
    deck = make_deck(
        {"type": "notch2D", "h": 0.12}, "small_J2", J2_MAT, BCS_2D(0.001), 1
    )
    prob = Problem(load_deck(deck))
    disc = prob.disc
    a = prob.assembler
    rng = np.random.default_rng(0)
    x = jnp.asarray(1e-3 * rng.standard_normal(disc.n_dofs))
    xi0 = jnp.tile(jnp.asarray(a.model.init_xi())[None, :], (disc.n_elem, 1))
    loc = a.local_solve(x, disc.zero_x(), xi0, prob.params0)
    R, J_e, diag = a.residual_and_jacobian(
        x, disc.zero_x(), loc.xi, xi0, loc.path, prob.params0
    )
    bc_dofs, _ = prob.dbcs.arrays(1.0)

    v = jnp.asarray(rng.standard_normal(disc.n_dofs))
    y_ebe = apply_dbcs_matvec(
        ebe_matvec_disc(J_e, disc, v), diag, v, bc_dofs
    )
    y_ell = EllOperator(disc, J_e, diag, bc_dofs)(v)
    np.testing.assert_allclose(
        np.asarray(y_ell), np.asarray(y_ebe), atol=1e-11
    )

    # transpose apply
    y_ebeT = apply_dbcs_matvec(
        ebe_matvec_disc(J_e.swapaxes(-1, -2), disc, v), diag, v, bc_dofs
    )
    y_ellT = EllOperator(disc, J_e, diag, bc_dofs, transpose=True)(v)
    np.testing.assert_allclose(
        np.asarray(y_ellT), np.asarray(y_ebeT), atol=1e-11
    )

    # trailing-layout input (the Pallas assembly kernel's native form)
    J_T = jnp.moveaxis(J_e, 0, -1)
    y_ellt = EllOperator(disc, J_T, diag, bc_dofs)(v)
    np.testing.assert_allclose(
        np.asarray(y_ellt), np.asarray(y_ebe), atol=1e-11
    )

    # assembled diagonal blocks agree with the scatter path
    A, nbr = assemble_ell(J_e, disc)
    assert A.shape[1] == nbr.shape[1]
    # row sums against dense row sums through matvec with ones
    ones = jnp.ones(disc.n_dofs)
    np.testing.assert_allclose(
        np.asarray(EllOperator(disc, J_e, diag, bc_dofs)(ones)),
        np.asarray(
            apply_dbcs_matvec(
                ebe_matvec_disc(J_e, disc, ones), diag, ones, bc_dofs
            )
        ),
        atol=1e-11,
    )


def test_ell_maps_cache_is_host_side():
    """build_ell_maps must cache HOST numpy arrays: a first build
    inside a jit trace used to cache tracers, which leaked into every
    later trace of the same Disc (UnexpectedTracerError — hit on TPU by
    the scan-harness benches, which trace the same solve twice in one
    process)."""
    import jax

    from calibr8_tpu.solve.ellpack import build_ell_maps

    deck = make_deck(
        {"type": "cube", "n": 2}, "small_J2", J2_MAT, None, 1
    )
    prob = Problem(load_deck(deck))
    disc = prob.disc
    disc._ell_maps = None

    @jax.jit
    def first(x):
        m = build_ell_maps(disc)  # first build happens INSIDE a trace
        return x + jnp.asarray(m["nbr"]).sum()

    first(1.0)
    assert isinstance(disc._ell_maps["nbr"], np.ndarray)
    assert isinstance(disc._ell_maps["ell_idx_T"], np.ndarray)

    @jax.jit
    def second(x):  # the second trace must not see stale tracers
        m = build_ell_maps(disc)
        return x + jnp.asarray(m["ell_idx"]).sum()

    second(1.0)

"""CPU parity tests for the SCALE-ONLY code paths (engaged past
CALIBR8_ELEM_CHUNK elements at the 1M-DOF bench, never by the default
CPU suite): the two-pass adjoint step (solve/adjoint.py step_solve /
step_post), the parts='solve'/'post' adjoint-block seed slicing
(fem/assembly.py make_adjoint_blocks_kernel), the fold-the-transpose
ELL assembly (solve/ellpack.py assemble_ell_T(transpose=True)), and
the chunked ELL / Galerkin scatter paths with non-dividing chunks.

Reference anchor: the reference's adjoint runs the same code at every
mesh size (source/calibr8/src/adjoint.cpp:76-189); these paths exist
only because of TPU HBM/executable-size ceilings and must be
numerically identical to the plain ones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.ellpack import assemble_ell_T, assemble_ell_T_blocks
from calibr8_tpu.solve.linear import LinearCfg

from tests.decks import NOTCH2D, BCS_2D, J2_MAT, make_deck


def _prob(n_steps=2):
    deck = make_deck(NOTCH2D, "small_J2", J2_MAT, BCS_2D(0.001), n_steps)
    return Problem(load_deck(deck))


def _jac(prob, seed=3):
    a = prob.assembler
    disc = prob.disc
    rng = np.random.default_rng(seed)
    x = jnp.asarray(1e-3 * rng.standard_normal(disc.n_dofs), disc.dtype)
    xi0 = jnp.tile(
        jnp.asarray(a.model.init_xi())[None, :], (disc.n_elem, 1)
    ).astype(disc.dtype)
    loc = a.local_solve(x, disc.zero_x(), xi0, prob.params0)
    _, J_e, diag = a.residual_and_jacobian(
        x, disc.zero_x(), loc.xi, xi0, loc.path, prob.params0
    )
    return x, loc, xi0, J_e, diag


def _sweep_grad(prob):
    traj = prob.solve_primal()
    adj = Adjoint(
        prob.assembler, prob.qoi, prob.dbcs, LinearCfg(),
        mg_factory=prob.mg_factory,
    )
    grad, zs = adj.sweep(traj, prob.params0, prob.time_grid)
    return np.asarray(grad), np.asarray(zs[1][0])


@pytest.mark.smoke
def test_two_pass_adjoint_matches_one_pass(monkeypatch):
    """The scale adjoint recomputes the post-solve blocks behind a 0*z
    anchor (adjoint.py step_solve/step_post two-pass mode) and chunks
    every element kernel; forced on via a tiny CALIBR8_ELEM_CHUNK it
    must reproduce the one-pass gradient and adjoint state."""
    g0, z0 = _sweep_grad(_prob())

    monkeypatch.setenv("CALIBR8_ELEM_CHUNK", "13")  # 13 ∤ n_elem
    prob = _prob()
    assert prob.disc.n_elem > 13
    g1, z1 = _sweep_grad(prob)

    np.testing.assert_allclose(g1, g0, rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(z1, z0, rtol=0, atol=1e-8)


def test_adjoint_blocks_parts_match_all():
    """parts='solve' + parts='post' seed-offset slices must partition
    parts='all' exactly (same seeds, different grouping)."""
    prob = _prob()
    a = prob.assembler
    x, loc, xi0, _, _ = _jac(prob)
    disc = prob.disc
    args = (
        a.gather(x).T,
        a.gather(disc.zero_x()).T,
        loc.xi.T,
        xi0.T,
        loc.path,
        jnp.moveaxis(disc.grad_N, 0, -1),
        disc.detJ,
        disc.h,
        a.params_per_elem(prob.params0).T,
    )
    B_all = jax.jit(a.make_adjoint_blocks_kernel(parts="all"))(*args)
    B_s = jax.jit(a.make_adjoint_blocks_kernel(parts="solve"))(*args)
    B_p = jax.jit(a.make_adjoint_blocks_kernel(parts="post"))(*args)
    assert set(B_s) | set(B_p) >= set(B_all)
    for k, v in {**B_s, **B_p}.items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(B_all[k]), rtol=1e-12, atol=1e-11,
            err_msg=k,
        )


def test_assemble_ell_transpose_folded():
    """assemble_ell_T(J, transpose=True) — the swapaxes-free scale
    path — must equal assembling the blockwise-transposed Jacobian."""
    prob = _prob()
    disc = prob.disc
    _, _, _, J_e, _ = _jac(prob)
    A_ref, nbr_ref = assemble_ell_T(J_e.swapaxes(-1, -2), disc)
    A_fold, nbr = assemble_ell_T(J_e, disc, transpose=True)
    np.testing.assert_array_equal(np.asarray(nbr), np.asarray(nbr_ref))
    np.testing.assert_allclose(
        np.asarray(A_fold), np.asarray(A_ref), rtol=0, atol=1e-13
    )


@pytest.mark.parametrize("chunk", ["13", "16"])  # 13 does not divide
def test_assemble_ell_chunked_matches(monkeypatch, chunk):
    """Chunked ELL scatter (backward-overlapping masked final chunk)
    vs the one-shot scatter, both directions."""
    prob = _prob()
    disc = prob.disc
    _, _, _, J_e, _ = _jac(prob)
    ref = {
        t: np.asarray(assemble_ell_T(J_e, disc, transpose=t)[0])
        for t in (False, True)
    }
    monkeypatch.setenv("CALIBR8_ELEM_CHUNK", chunk)
    assert disc.n_elem > int(chunk)
    for t in (False, True):
        A_c, _ = jax.jit(
            lambda J, t=t: assemble_ell_T(J, disc, transpose=t)
        )(J_e)
        np.testing.assert_allclose(
            np.asarray(A_c), ref[t], rtol=1e-12, atol=1e-11
        )


def test_assemble_ell_blocks_chunked_matches(monkeypatch):
    """The per-level generic block scatter (assemble_ell_T_blocks) under
    a non-dividing chunk."""
    from calibr8_tpu.solve.ellpack import build_ell_maps

    prob = _prob()
    disc = prob.disc
    _, _, _, J_e, _ = _jac(prob)
    maps = build_ell_maps(disc)
    npe, ndpn = disc.spec.npe, disc.ndpn
    JT = jnp.moveaxis(J_e, 0, -1)
    args = (JT, maps["ell_ids_T"], int(maps["K"]), disc.n_nodes, npe, ndpn)
    A0 = np.asarray(assemble_ell_T_blocks(*args))
    monkeypatch.setenv("CALIBR8_ELEM_CHUNK", "13")
    A1 = np.asarray(jax.jit(lambda J: assemble_ell_T_blocks(J, *args[1:]))(JT))
    np.testing.assert_allclose(A1, A0, rtol=1e-12, atol=1e-11)


def test_mg_apply_chunked_matches(monkeypatch):
    """Geometric-MG preconditioner apply (Galerkin coarse blocks built
    through the chunked galerkin_u path) with a tiny non-dividing
    chunk vs the default one-shot build."""
    deck = make_deck(
        {"type": "cube", "n": 3, "refinements": 1},
        "small_J2", J2_MAT,
        {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 2, "zmin", "0.0"],
                "bc 4": [0, 2, "zmax", "0.02 * t"],
            }
        },
        1,
    )
    deck["linear algebra"] = {"preconditioner": "multigrid"}
    prob = Problem(load_deck(deck))
    disc = prob.disc
    _, _, _, J_e, diag = _jac(prob)
    bc_dofs, _ = prob.dbcs.arrays(1.0)

    from calibr8_tpu.fem.assembly import ebe_matvec_disc
    from calibr8_tpu.fem.bcs import apply_dbcs_matvec

    def op(v):
        return apply_dbcs_matvec(
            ebe_matvec_disc(J_e, disc, v), diag, v, bc_dofs
        )

    rng = np.random.default_rng(11)
    r = jnp.asarray(rng.standard_normal(disc.n_dofs), disc.dtype)
    M0 = prob.mg_factory.make(J_e, diag, bc_dofs, op)
    y0 = np.asarray(M0(r))

    monkeypatch.setenv("CALIBR8_ELEM_CHUNK", "13")
    assert disc.n_elem > 13
    M1 = prob.mg_factory.make(J_e, diag, bc_dofs, op)
    y1 = np.asarray(M1(r))
    np.testing.assert_allclose(y1, y0, rtol=1e-10, atol=1e-13)

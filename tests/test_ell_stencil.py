"""Stencil-offset ELL canonicalization (solve/ellpack.py gather_T).

On structured meshes (builtin cubes/squares and their nested
refinements — every scale-bench level) each ELL slot is canonicalized
to a constant node-index OFFSET, so the apply-side neighbor gather
becomes K static slices of a zero-padded vector.  The gather it
replaces materialized an (n, K, m) intermediate whose minor dims
tile-pad ~42x on TPU — the measured fine-matvec bottleneck of the MG
Krylov iteration.  Parity pinned here on CPU; both apply forms share
the canonicalized maps (CALIBR8_ELL_STENCIL=0 selects the gather)."""

import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.fem.assembly import ebe_matvec_disc
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.ellpack import (
    assemble_ell_T,
    build_ell_maps,
    ell_maps_from_conn,
    gather_T,
)

from tests.decks import BCS_3D, CUBE, ELASTIC_MAT, J2_MAT, make_deck


def _cube_problem():
    deck = make_deck(
        {"type": "cube", "n": 3}, "elastic", ELASTIC_MAT, BCS_3D(0.001), 1
    )
    return Problem(load_deck(deck))


def _assembled(prob):
    disc = prob.disc
    a = prob.assembler
    rng = np.random.default_rng(0)
    x = jnp.asarray(1e-3 * rng.standard_normal(disc.n_dofs))
    xi0 = jnp.tile(jnp.asarray(a.model.init_xi())[None, :], (disc.n_elem, 1))
    loc = a.local_solve(x, disc.zero_x(), xi0, prob.params0)
    _, J_e, diag = a.residual_and_jacobian(
        x, disc.zero_x(), loc.xi, xi0, loc.path, prob.params0
    )
    return J_e, diag


def test_structured_mesh_detects_offsets():
    prob = _cube_problem()
    maps = build_ell_maps(prob.disc)
    offs = maps["offsets"]
    assert offs is not None
    # translation-invariant tet lattice: a few dozen sorted offsets
    assert maps["K"] == len(offs)
    assert 0 in offs and np.all(np.diff(offs) > 0)
    # every non-sentinel nbr entry agrees with its slot's offset
    nbr = maps["nbr"]
    n = prob.disc.n_nodes
    for k in range(maps["K"]):
        valid = nbr[:, k] < n
        np.testing.assert_array_equal(
            nbr[valid, k], np.nonzero(valid)[0] + offs[k]
        )


def test_unstructured_mesh_falls_back():
    deck = make_deck(
        {"type": "notch2D", "h": 0.12}, "small_J2", J2_MAT,
        {"expression": {"bc 1": [0, 0, "xmin", "0.0"]}}, 1,
    )
    prob = Problem(load_deck(deck))
    assert build_ell_maps(prob.disc)["offsets"] is None


def test_stencil_apply_matches_gather_and_ebe():
    prob = _cube_problem()
    disc = prob.disc
    J_e, diag = _assembled(prob)
    maps = build_ell_maps(disc)
    assert maps["offsets"] is not None
    A_T, nbr = assemble_ell_T(J_e, disc)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(disc.n_dofs))
    X = disc.nodemat(v)
    m = disc.ndpn

    G_sten = gather_T(X, jnp.asarray(nbr), disc.n_nodes, m, maps["offsets"])
    G_gath = gather_T(X, jnp.asarray(nbr), disc.n_nodes, m, None)

    def apply(G_T):
        Y_T = jnp.einsum("sijn,sjn->in", A_T, G_T)
        return disc.nodemat_to_flat(Y_T.T)

    # stencil vs gather through the assembled operator (zero A-blocks
    # annihilate the stencil's boundary-slot reads)
    np.testing.assert_allclose(
        np.asarray(apply(G_sten)), np.asarray(apply(G_gath)), atol=1e-12
    )
    # and vs the matrix-free EBE reference
    np.testing.assert_allclose(
        np.asarray(apply(G_sten)),
        np.asarray(ebe_matvec_disc(J_e, disc, v)),
        atol=1e-11,
    )


def test_gather_T_matches_on_valid_slots():
    # raw helper parity where the gather is defined (non-sentinel slots)
    prob = _cube_problem()
    disc = prob.disc
    maps = build_ell_maps(disc)
    nbr = maps["nbr"]
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.standard_normal((disc.n_nodes, disc.ndpn)))
    G_sten = np.asarray(
        gather_T(X, jnp.asarray(nbr), disc.n_nodes, disc.ndpn,
                 maps["offsets"])
    )
    G_gath = np.asarray(
        gather_T(X, jnp.asarray(nbr), disc.n_nodes, disc.ndpn, None)
    )
    valid = (nbr < disc.n_nodes).T  # (K, n)
    np.testing.assert_allclose(
        G_sten * valid[:, None, :], G_gath * valid[:, None, :], atol=0
    )


def test_stencil_knob_disables_canonicalization(monkeypatch):
    prob = _cube_problem()
    conn = np.asarray(prob.disc.conn)
    monkeypatch.setenv("CALIBR8_ELL_STENCIL", "0")
    maps = ell_maps_from_conn(conn, prob.disc.n_nodes)
    assert maps["offsets"] is None
    monkeypatch.delenv("CALIBR8_ELL_STENCIL")
    maps2 = ell_maps_from_conn(conn, prob.disc.n_nodes)
    assert maps2["offsets"] is not None


def test_tpu_kernel_branch_parity_interpreted(monkeypatch):
    """Execute the exact TPU Pallas branches (EllOperator trailing +
    LevelEllOperator kernel, stencil AND gather forms) on CPU via
    CALIBR8_ELL_FORCE_PALLAS + interpret mode — the branch a CPU-green
    NameError once shipped through untested."""
    monkeypatch.setenv("CALIBR8_ELL_FORCE_PALLAS", "1")
    monkeypatch.setenv("CALIBR8_PALLAS_INTERPRET", "1")
    prob = _cube_problem()
    disc = prob.disc
    J_e, diag = _assembled(prob)
    bc_dofs, _ = prob.dbcs.arrays(1.0)
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.standard_normal(disc.n_dofs))
    y_ref = np.asarray(
        __import__("calibr8_tpu.fem.bcs", fromlist=["apply_dbcs_matvec"])
        .apply_dbcs_matvec(ebe_matvec_disc(J_e, disc, v), diag, v, bc_dofs)
    )
    from calibr8_tpu.solve.ellpack import EllOperator, LevelEllOperator

    f32 = jnp.float32  # force the kernel path (f64 demotes to einsum)
    J32, d32, v32 = J_e.astype(f32), diag.astype(f32), v.astype(f32)
    for knob in ("1", "0"):  # stencil and gather forms
        monkeypatch.setenv("CALIBR8_ELL_STENCIL", knob)
        op = EllOperator(disc, J32, d32, bc_dofs)
        assert op._blk is not None
        np.testing.assert_allclose(
            np.asarray(op(v32)), y_ref, atol=2e-4 * np.abs(y_ref).max()
        )
        maps = build_ell_maps(disc)
        lvl = LevelEllOperator(
            jnp.moveaxis(J32, 0, -1), jnp.asarray(maps["nbr"]),
            jnp.asarray(maps["ell_ids_T"]), maps["K"], disc.n_nodes,
            disc.ndpn, offsets=maps["offsets"],
        )
        assert lvl._blk is not None
        # LevelEllOperator works in node-interleaved (n_nodes, m) layout;
        # convert the flat global vector in and the result back out
        # before comparing to the flat-layout EBE reference
        x_nm = jnp.asarray(disc.nodemat(v32)).reshape(-1)
        y_nm = np.asarray(lvl(x_nm)).reshape(disc.n_nodes, disc.ndpn)
        y_lvl = np.asarray(disc.nodemat_to_flat(jnp.asarray(y_nm)))
        y_nb = np.asarray(ebe_matvec_disc(J32, disc, v32))
        np.testing.assert_allclose(
            y_lvl, y_nb, atol=2e-4 * np.abs(y_nb).max()
        )


@pytest.mark.smoke
def test_mg_cycle_parity_stencil_vs_gather(monkeypatch):
    """The recursive-MG preconditioner application is bit-comparable
    between the stencil and gather apply forms on a refinement chain
    (same canonicalized maps, both level chains + fine p ELL)."""
    base = {"type": "square", "n": 2, "refinements": 3}
    deck = make_deck(
        base, "elastic", ELASTIC_MAT,
        {"expression": {
            "bc 1": [0, 0, "xmin", "0.0"],
            "bc 2": [0, 1, "ymin", "0.0"],
            "bc 3": [0, 1, "ymax", "0.001 * t"],
        }}, 1,
    )
    deck["linear algebra"] = {"preconditioner": "multigrid"}
    prob = Problem(load_deck(deck))
    assert prob.mg_factory.recursive
    # the renumbered refined levels all canonicalize to stencil form
    assert build_ell_maps(prob.disc)["offsets"] is not None
    for pr in prob.mg_factory._pairs:
        assert pr["ell_offs"] is not None
    J_e, diag = _assembled(prob)
    bc_dofs, _ = prob.dbcs.arrays(1.0)
    mg = prob.mg_factory
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal(prob.disc.n_dofs))

    M = mg.make(J_e, diag, bc_dofs)
    z_sten = np.asarray(M(r))
    monkeypatch.setenv("CALIBR8_ELL_STENCIL", "0")
    z_gath = np.asarray(mg.make(J_e, diag, bc_dofs)(r))
    denom = np.linalg.norm(z_gath)
    assert np.linalg.norm(z_sten - z_gath) <= 1e-12 * max(denom, 1.0)

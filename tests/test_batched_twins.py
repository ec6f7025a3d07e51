"""Batched (trailing-layout) model twins and the fused Pallas assembly
kernel vs the generic XLA path — run in Pallas interpret mode on CPU so
the TPU fast path is gated by the regular suite.

Twin coverage: small_J2 (analytic return), hyper_J2 (implicit, finite
deformation), small_hill (implicit, anisotropic), hypo_hill (implicit,
objective rates + polar rotation — covers hypo_J2 via unit ratios), and
small_hill_plane_stress (displacement-only plane-stress kernel path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.fem import pallas_assembly
from calibr8_tpu.problem import Problem

from calibr8_tpu.models.twin_cases import CASES, case_deck


def _state(prob, scale):
    """Deformed state with both plastic and elastic integration points."""
    disc = prob.disc
    rng = np.random.default_rng(0)
    coords = np.asarray(disc.coords)
    d = disc.spec.dim
    u = np.zeros((disc.n_nodes, d))
    u[:, 1] = scale * coords[:, 1] ** 2  # inhomogeneous -> partial yield
    u[:, 0] = -0.3 * scale * coords[:, 0]
    u = u + 0.02 * scale * rng.standard_normal(u.shape)
    if disc.spec.mixed:
        x = disc.join(jnp.asarray(u), jnp.zeros(disc.n_nodes))
    else:
        x = jnp.asarray(u.reshape(-1))
    xi_prev = jnp.tile(
        jnp.asarray(prob.assembler.model.init_xi())[None, :],
        (disc.n_elem, 1),
    )
    return x, disc.zero_x(), xi_prev


FAST = {"small_J2", "small_hill_plane_stress", "small_hill_plane_strain",
        "isotropic_elastic"}
# both kernel modes + the plane-stress and 2D-mixed paths; the implicit
# 3D twins take minutes in interpret mode and run in the slow suite


# smoke = one implicit (small_J2) + one explicit (isotropic_elastic)
# twin; the hill plane-stress/strain variants are default tier (the
# smoke gate budget is 10 min on the CPU box)
SMOKE_TWINS = {"small_J2", "isotropic_elastic"}


@pytest.mark.parametrize(
    "name,mesh,model,mats,bcs,gtype",
    [pytest.param(*c, marks=pytest.mark.smoke) if c[0] in SMOKE_TWINS
     else c for c in CASES if c[0] in FAST],
    ids=[c[0] for c in CASES if c[0] in FAST],
)
def test_pallas_twin_matches_generic(name, mesh, model, mats, bcs, gtype):
    _run_twin_case(name, mesh, model, mats, bcs, gtype)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,mesh,model,mats,bcs,gtype",
    [c for c in CASES if c[0] not in FAST],
    ids=[c[0] for c in CASES if c[0] not in FAST],
)
def test_pallas_twin_matches_generic_slow(name, mesh, model, mats, bcs, gtype):
    _run_twin_case(name, mesh, model, mats, bcs, gtype)


def _run_twin_case(name, mesh, model, mats, bcs, gtype):
    deck = case_deck((name, mesh, model, mats, bcs, gtype), num_steps=1)
    prob = Problem(load_deck(deck))
    a = prob.assembler
    assert pallas_assembly.supports_pallas(a), f"{name}: twin not wired"

    x, x_prev, xi_prev = _state(prob, 0.02)
    loc = a.local_solve(x, x_prev, xi_prev, prob.params0)
    # the state must exercise BOTH branches (pathless models excepted)
    paths = np.asarray(loc.path)
    if getattr(a.model, "uses_path", True):
        assert paths.min() == 0 and paths.max() == 1, (
            f"{name}: single-branch state (paths {np.unique(paths)})"
        )
    R0, J_e0, diag0 = a.residual_and_jacobian(
        x, x_prev, loc.xi, xi_prev, loc.path, prob.params0
    )

    assemble = pallas_assembly.make_pallas_assemble(
        a, block_e=128, interpret=True
    )
    R, J_e, diag, xi, path, nfail = assemble(x, x_prev, xi_prev, prob.params0)

    assert int(nfail) == 0
    np.testing.assert_array_equal(np.asarray(path), paths)
    np.testing.assert_allclose(
        np.asarray(xi), np.asarray(loc.xi), rtol=1e-8, atol=1e-10
    )
    scale_R = max(float(jnp.max(jnp.abs(R0))), 1e-12)
    np.testing.assert_allclose(
        np.asarray(R), np.asarray(R0), atol=1e-9 * scale_R
    )
    scale_J = max(float(jnp.max(jnp.abs(J_e0))), 1e-12)
    np.testing.assert_allclose(
        np.asarray(J_e), np.asarray(J_e0), atol=5e-7 * scale_J
    )
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(diag0), atol=5e-7 * scale_J
    )


def test_t_acos_matches_arccos():
    """The twin eig's polynomial arccos (Mosaic lowers NO inverse trig
    — probed on hardware, scripts/probe_mosaic_trig.py) must match
    jnp.arccos to machine accuracy in f64 (interpret-mode parity) and
    to rounding in f32 (the TPU kernel dtype), across the full clipped
    input range used by t_eig_sym33."""
    from calibr8_tpu.models.batched import t_acos

    x = np.linspace(-1.0 + 1e-14, 1.0 - 1e-14, 100001)
    err = np.abs(np.asarray(t_acos(jnp.asarray(x))) - np.arccos(x))
    assert err.max() < 1e-13
    # the eigenvalue-relevant quantity is cos(acos(x)/3); check the
    # round trip that bounds it
    cerr = np.abs(np.cos(np.asarray(t_acos(jnp.asarray(x)))) - x)
    assert cerr.max() < 5e-16
    xf = x.astype(np.float32)
    outf = np.asarray(t_acos(jnp.asarray(xf)))
    assert outf.dtype == np.float32
    cerrf = np.abs(np.cos(outf.astype(np.float64)) - xf.astype(np.float64))
    assert cerrf.max() < 5e-7

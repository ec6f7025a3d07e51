"""Yield surfaces and flow normals: Hill, Hosford, Barlat.

Re-design of the reference helpers (source/calibr8/src/yield_functions.hpp):
pure jnp functions on (3, 3) stress tensors.  The symmetric 3x3
eigendecomposition needed by Hosford/Barlat is the closed-form
trigonometric solver (the minitensor eig_spd_cos analog) with epsilon
guards so the unselected elastic branch (evaluated under jnp.where at
zero stress) produces finite values and tangents.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-30


def insert_2d_into_3d(t2):
    z = jnp.zeros((3, 3), t2.dtype)
    return z.at[:2, :2].set(t2)


def extract_2d_from_3d(t3):
    return t3[:2, :2]


# ----------------------------------------------------------------------
# Hill (reference: yield_functions.hpp:35-100)
# ----------------------------------------------------------------------


def hill_params(R00, R11, R22, R01, R02, R12):
    F = 0.5 * (R11**-2 + R22**-2 - R00**-2)
    G = 0.5 * (R22**-2 + R00**-2 - R11**-2)
    H = 0.5 * (R00**-2 + R11**-2 - R22**-2)
    L = 1.5 * R12**-2
    M = 1.5 * R02**-2
    N = 1.5 * R01**-2
    return jnp.stack([F, G, H, L, M, N])


def hill_value(TC, hp):
    F, G, H, L, M, N = hp
    val2 = (
        F * (TC[1, 1] - TC[2, 2]) ** 2
        + G * (TC[2, 2] - TC[0, 0]) ** 2
        + H * (TC[0, 0] - TC[1, 1]) ** 2
        + 2.0 * (L * TC[1, 2] ** 2 + M * TC[0, 2] ** 2 + N * TC[0, 1] ** 2)
    )
    return jnp.sqrt(val2 + _EPS)


def hill_normal(TC, hp, hill_val):
    F, G, H, L, M, N = hp
    n = jnp.zeros((3, 3), TC.dtype)
    n = n.at[0, 0].set((G + H) * TC[0, 0] - H * TC[1, 1] - G * TC[2, 2])
    n = n.at[1, 1].set((F + H) * TC[1, 1] - H * TC[0, 0] - F * TC[2, 2])
    n = n.at[2, 2].set((G + F) * TC[2, 2] - G * TC[0, 0] - F * TC[1, 1])
    n = n.at[0, 1].set(N * TC[0, 1])
    n = n.at[0, 2].set(M * TC[0, 2])
    n = n.at[1, 2].set(L * TC[1, 2])
    n = n.at[1, 0].set(n[0, 1])
    n = n.at[2, 0].set(n[0, 2])
    n = n.at[2, 1].set(n[1, 2])
    return n / jnp.maximum(hill_val, _EPS)


# ----------------------------------------------------------------------
# symmetric 3x3 eigendecomposition, closed form (eig_spd_cos analog)
# ----------------------------------------------------------------------


def eig_sym33(A, eps: float = 1e-12):
    """Eigenvalues (descending) and eigenvectors of a symmetric 3x3.

    Trigonometric closed form; guarded so that near-degenerate and zero
    matrices return finite values and finite tangents.  Columns of the
    returned matrix are the eigenvectors.
    """
    dtype = A.dtype
    q = jnp.trace(A) / 3.0
    B = A - q * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B) / 6.0
    p = jnp.sqrt(p2 + eps * eps)
    Bn = B / p
    r = jnp.linalg.det(Bn) / 2.0
    r = jnp.clip(r, -1.0 + 1e-14, 1.0 - 1e-14)
    phi = jnp.arccos(r) / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi)
    lam2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam1 = 3.0 * q - lam0 - lam2
    lams = jnp.stack([lam0, lam1, lam2])

    # eigenvector for lam_i: columns of (A - lam_j I)(A - lam_k I)
    def vec(lam_i, lam_j, lam_k):
        M = (A - lam_j * jnp.eye(3, dtype=dtype)) @ (
            A - lam_k * jnp.eye(3, dtype=dtype)
        )
        # pick the largest column robustly (sum of all columns is rank-1
        # aligned with v_i when nondegenerate); add scaled identity
        # fallback for the degenerate/zero case
        norms = jnp.sum(M * M, axis=0)
        idx = jnp.argmax(norms)
        v = M[:, idx]
        fallback = jnp.eye(3, dtype=dtype)[:, 0]
        v = jnp.where(jnp.sqrt(norms[idx]) > 1e3 * eps, v, fallback)
        return v / jnp.sqrt(jnp.sum(v * v) + eps * eps)

    v0 = vec(lam0, lam1, lam2)
    v1_raw = vec(lam1, lam2, lam0)
    # orthogonalize v1 against v0 to fight degeneracy, then v2 = v0 x v1
    v1_raw = v1_raw - jnp.dot(v1_raw, v0) * v0
    v1 = v1_raw / jnp.sqrt(jnp.sum(v1_raw * v1_raw) + eps * eps)
    v2 = jnp.cross(v0, v1)
    V = jnp.stack([v0, v1, v2], axis=1)
    return lams, V


# ----------------------------------------------------------------------
# Hosford (reference: small_hosford.cpp:226-266)
# ----------------------------------------------------------------------


def hosford_phi_and_normal(sigma, dev_sigma, a):
    """phi and d phi / d sigma for the Hosford yield surface.

    sigma: full Cauchy (3, 3); dev_sigma its deviator (used for the von
    Mises scaling that stabilizes the |.|^a powers).
    """
    vm = jnp.sqrt(1.5 * jnp.sum(dev_sigma * dev_sigma) + _EPS)
    lams, V = eig_sym33(sigma)
    sl = lams / vm
    # The vm-scaled eigenvalue differences are bounded by ~2.45 for any
    # stress state; clip so the |.|^a powers (a up to ~100) can never
    # overflow when sigma ~ 0 and the eig/vm epsilon floors mismatch
    # (the unselected plastic branch is evaluated there under jnp.where).
    d01 = jnp.clip(sl[0] - sl[1], -4.0, 4.0)
    d12 = jnp.clip(sl[1] - sl[2], -4.0, 4.0)
    d20 = jnp.clip(sl[2] - sl[0], -4.0, 4.0)

    def powa(x, e):
        return jnp.abs(x) ** e

    phi = vm * (
        0.5 * (powa(d01, a) + powa(d12, a) + powa(d20, a))
    ) ** (1.0 / a)

    pl = lams / jnp.maximum(phi, _EPS)
    p01 = jnp.clip(pl[0] - pl[1], -4.0, 4.0)
    p12 = jnp.clip(pl[1] - pl[2], -4.0, 4.0)
    p20 = jnp.clip(pl[2] - pl[0], -4.0, 4.0)
    f01 = p01 * powa(p01, a - 2.0)
    f12 = p12 * powa(p12, a - 2.0)
    f20 = p20 * powa(p20, a - 2.0)
    n = 0.5 * (
        (f01 - f20) * jnp.outer(V[:, 0], V[:, 0])
        + (f12 - f01) * jnp.outer(V[:, 1], V[:, 1])
        + (f20 - f12) * jnp.outer(V[:, 2], V[:, 2])
    )
    return phi, n


# ----------------------------------------------------------------------
# Barlat Yld2004-18p (reference: yield_functions.hpp:104-330)
# ----------------------------------------------------------------------


def flatten_stress(s):
    return jnp.stack([s[0, 0], s[1, 1], s[2, 2], s[0, 1], s[1, 2], s[2, 0]])


def unflatten_stress(v):
    return jnp.array(
        [
            [v[0], v[3], v[5]],
            [v[3], v[1], v[4]],
            [v[5], v[4], v[2]],
        ]
    )


def barlat_L(p):
    """Voigt 6x6 linear transformation from the 9 Barlat coefficients
    (p_01, p_02, p_10, p_12, p_20, p_21, p_33, p_44, p_55)."""
    p01, p02, p10, p12, p20, p21, p33, p44, p55 = p
    L = jnp.zeros((6, 6), p01.dtype if hasattr(p01, "dtype") else None)
    L = L.at[0, 0].set((p01 + p02) / 3.0)
    L = L.at[0, 1].set((-2.0 * p01 + p02) / 3.0)
    L = L.at[0, 2].set((p01 - 2.0 * p02) / 3.0)
    L = L.at[1, 0].set((-2.0 * p10 + p12) / 3.0)
    L = L.at[1, 1].set((p10 + p12) / 3.0)
    L = L.at[1, 2].set((p10 - 2.0 * p12) / 3.0)
    L = L.at[2, 0].set((-2.0 * p20 + p21) / 3.0)
    L = L.at[2, 1].set((p20 - 2.0 * p21) / 3.0)
    L = L.at[2, 2].set((p20 + p21) / 3.0)
    L = L.at[3, 3].set(p33)
    L = L.at[4, 4].set(p44)
    L = L.at[5, 5].set(p55)
    return L


def barlat_phi_and_normal(cauchy, sp_params, dp_params, a):
    """Barlat Yld2004-18p effective stress and flow normal
    (yield_functions.hpp evaluate_barlat_phi / evaluate_barlat_normal)."""
    dev = cauchy - jnp.trace(cauchy) / 3.0 * jnp.eye(3, dtype=cauchy.dtype)
    vm = jnp.sqrt(1.5 * jnp.sum(dev * dev) + _EPS)

    L_sp = barlat_L(sp_params)
    L_dp = barlat_L(dp_params)
    sp = unflatten_stress(L_sp @ flatten_stress(cauchy))
    dp = unflatten_stress(L_dp @ flatten_stress(cauchy))
    s_lam, s_V = eig_sym33(sp)
    d_lam, d_V = eig_sym33(dp)

    def powa(x, e):
        return jnp.abs(x) ** e

    ss = s_lam / vm
    dd = d_lam / vm
    # clip for the same overflow reason as the Hosford differences: the
    # Barlat-transformed, vm-scaled eigenvalue spreads are O(1)
    diffs = jnp.clip(ss[:, None] - dd[None, :], -8.0, 8.0)
    total = 0.25 * jnp.sum(powa(diffs, a))
    phi = vm * jnp.exp(jnp.log(jnp.maximum(total, _EPS)) / a)

    # normal: d phi / d cauchy via the scaled eigenvalues
    bs_s = s_lam / jnp.maximum(phi, _EPS)
    bs_d = d_lam / jnp.maximum(phi, _EPS)
    dmat = jnp.clip(bs_s[:, None] - bs_d[None, :], -8.0, 8.0)
    fac = dmat * powa(dmat, a - 2.0)
    sp_mult = 0.25 * jnp.sum(fac, axis=1)  # per sp eigenvalue
    dp_mult = -0.25 * jnp.sum(fac, axis=0)  # per dp eigenvalue
    sp_normal = sum(
        sp_mult[i] * jnp.outer(s_V[:, i], s_V[:, i]) for i in range(3)
    )
    dp_normal = sum(
        dp_mult[i] * jnp.outer(d_V[:, i], d_V[:, i]) for i in range(3)
    )
    flat = L_sp @ flatten_stress(sp_normal) + L_dp @ flatten_stress(dp_normal)
    return phi, unflatten_stress(flat)

"""Hypoelastic-plastic models with objective (unrotated) rates.

Reference implementations:
  hypo_hill               source/calibr8/src/hypo_hill.cpp (3D)
  hypo_hill_plane_strain  source/calibr8/src/hypo_hill_plane_strain.cpp
  hypo_hill_plane_stress  source/calibr8/src/hypo_hill_plane_stress.cpp
  hypo_hosford            source/calibr8/src/hypo_hosford.cpp (3D)
  hypo_barlat             source/calibr8/src/hypo_barlat.cpp (3D)

Shared kinematics (hypo_kinematics.hpp): unrotated rate of deformation
d = R^T sym((F - F_prev) F^{-1}) R with R the polar rotation of F; the
local state is the unrotated Cauchy stress TC (+ alpha, and for the
plane variants TC_zz or lambda_z); the Cauchy stress seen by the global
residual is the rotated-back R TC R^T.  Hypoelastic update
TC = TC_old + lambda tr(d) I + 2 mu d - 2 mu dgam n (plastic).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.models import register
from calibr8_tpu.models.base import (
    ELASTIC,
    PLASTIC,
    Kinematics,
    LocalModel,
    compute_kappa,
    compute_lambda,
    compute_mu,
    num_sym_comps,
    polar_rotation,
    sym_to_voigt,
    voigt_to_sym,
)
from calibr8_tpu.models import yield_fns as yf
from calibr8_tpu.models.yield_fns import extract_2d_from_3d, insert_2d_into_3d


def unrotated_rate(kin: Kinematics):
    """d = R^T sym((F - F_prev) F^{-1}) R (hypo_kinematics.hpp:10-17)."""
    F, F_prev = kin.F, kin.F_prev
    L = (F - F_prev) @ jnp.linalg.inv(F)
    D = 0.5 * (L + L.T)
    R = polar_rotation(F)
    return R.T @ D @ R, R


class _HypoBase(LocalModel):
    """Common xi = [TC voigt, alpha, (extra)] packing and elastic
    predictor TC_trial = TC_old + lambda tr(d) I + 2 mu d."""

    finite_deformation = True

    def _extra(self) -> int:
        return 0

    def nxi(self) -> int:
        return num_sym_comps(self.dim) + 1 + self._extra()

    def init_xi(self) -> np.ndarray:
        return np.zeros(self.nxi())

    def unpack(self, xi):
        nc = num_sym_comps(self.dim)
        return voigt_to_sym(xi[:nc], self.dim), xi[nc]

    def pack(self, TC, alpha, extra=None):
        parts = [sym_to_voigt(TC, self.dim), jnp.reshape(alpha, (1,))]
        if extra is not None:
            parts.append(jnp.reshape(extra, (-1,)))
        return jnp.concatenate(parts)

    # stress measures ---------------------------------------------------
    def rotated_cauchy(self, xi, kin):
        TC, _ = self.unpack(xi)
        R = polar_rotation(kin.F)
        return R @ TC @ R.T

    def dev_cauchy(self, xi, kin, params):
        RC = self.rotated_cauchy(xi, kin)
        d = self.dim
        return RC - self.hydro_cauchy(xi, kin, params) * jnp.eye(d, dtype=xi.dtype)

    def hydro_cauchy(self, xi, kin, params):
        return jnp.trace(self.rotated_cauchy(xi, kin)) / 3.0

    def cauchy(self, xi, kin, params, p):
        d = self.dim
        return self.dev_cauchy(xi, kin, params) - p * jnp.eye(d, dtype=xi.dtype)


@register
class HypoHill(_HypoBase):
    """3D Hill (hypo_hill.cpp); residual scaled by 1/mu in both
    branches (hypo_hill.cpp:266-268)."""

    name = "hypo_hill"
    param_names = ("E", "nu", "Y", "R00", "R11", "R22", "R01", "R02", "R12", "S", "D")

    def __init__(self, dim):
        super().__init__(dim)
        assert dim == 3, "hypo_hill is a 3D model; use the plane variants in 2D"

    def _hill_params(self, params):
        return yf.hill_params(*[params[i] for i in range(3, 9)])

    def _voce(self, alpha, params):
        Y, S, D = params[2], params[9], params[10]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def first_guess(self, xi_prev, kin, params):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        TC_old, alpha_old = self.unpack(xi_prev)
        d, _ = unrotated_rate(kin)
        TC = TC_old + lam * jnp.trace(d) * jnp.eye(3, dtype=xi_prev.dtype) + 2.0 * mu * d
        return self.pack(TC, alpha_old)

    def _f(self, xi, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        TC, alpha = self.unpack(xi)
        hp = self._hill_params(params)
        hill = yf.hill_value(TC, hp)
        return (hill - self._voce(alpha, params)) / mu

    def pathfn(self, xi, xi_prev, kin, params):
        return jnp.where(self._f(xi, params) >= -self.abs_tol, PLASTIC, ELASTIC).astype(
            jnp.int32
        )

    def residual(self, xi, xi_prev, kin, params, path):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        TC_old, alpha_old = self.unpack(xi_prev)
        TC, alpha = self.unpack(xi)
        I = jnp.eye(3, dtype=xi.dtype)
        d, _ = unrotated_rate(kin)
        R_TC = (TC - TC_old - lam * jnp.trace(d) * I - 2.0 * mu * d) / mu

        hp = self._hill_params(params)
        hill = yf.hill_value(TC, hp)
        f = (hill - self._voce(alpha, params)) / mu
        n = yf.hill_normal(TC, hp, hill)
        dgam = alpha - alpha_old

        R_TC_p = R_TC + (2.0 * mu * dgam * n) / mu
        R_a_p = f
        R_a_e = alpha - alpha_old

        plastic = path == PLASTIC
        return self.pack(
            jnp.where(plastic, R_TC_p, R_TC),
            jnp.where(plastic, R_a_p, R_a_e),
        )


@register
class HypoHillPlaneStrain(_HypoBase):
    """hypo_hill_plane_strain.cpp: xi = (TC 2x2, alpha, TC_zz); the
    polar rotation acts in-plane; hydro includes TC_zz."""

    name = "hypo_hill_plane_strain"
    param_names = ("E", "nu", "Y", "S", "D", "R00", "R11", "R22", "R01")

    def _extra(self) -> int:
        return 1

    def unpack3(self, xi):
        return voigt_to_sym(xi[:3], 2), xi[3], xi[4]

    def _hill_params(self, params):
        R00, R11, R22, R01 = params[5], params[6], params[7], params[8]
        one = jnp.ones_like(R00)
        return yf.hill_params(R00, R11, R22, R01, one, one)

    def _voce(self, alpha, params):
        Y, S, D = params[2], params[3], params[4]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def first_guess(self, xi_prev, kin, params):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        TC_old, alpha_old, TC_zz_old = self.unpack3(xi_prev)
        d, _ = unrotated_rate(kin)
        I2 = jnp.eye(2, dtype=xi_prev.dtype)
        TC = TC_old + lam * jnp.trace(d) * I2 + 2.0 * mu * d
        TC_zz = TC_zz_old + lam * jnp.trace(d)
        return self.pack(TC, alpha_old, TC_zz)

    def _f(self, xi, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        TC, alpha, TC_zz = self.unpack3(xi)
        TC3 = insert_2d_into_3d(TC).at[2, 2].set(TC_zz)
        hp = self._hill_params(params)
        phi = yf.hill_value(TC3, hp)
        return (phi - self._voce(alpha, params)) / mu, TC3, hp, phi

    def pathfn(self, xi, xi_prev, kin, params):
        f, _, _, _ = self._f(xi, params)
        return jnp.where(f >= -self.abs_tol, PLASTIC, ELASTIC).astype(jnp.int32)

    def residual(self, xi, xi_prev, kin, params, path):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        TC_old, alpha_old, TC_zz_old = self.unpack3(xi_prev)
        TC, alpha, TC_zz = self.unpack3(xi)
        I2 = jnp.eye(2, dtype=xi.dtype)
        d, _ = unrotated_rate(kin)

        R_TC = TC - TC_old - lam * jnp.trace(d) * I2 - 2.0 * mu * d
        R_zz = TC_zz - TC_zz_old - lam * jnp.trace(d)

        f, TC3, hp, phi = self._f(xi, params)
        n3 = yf.hill_normal(TC3, hp, phi)
        n2 = extract_2d_from_3d(n3)
        dgam = alpha - alpha_old
        dp2 = dgam * n2
        dp_zz = -jnp.trace(dp2)

        R_TC_p = R_TC + 2.0 * mu * dp2
        R_zz_p = R_zz + 2.0 * mu * dp_zz
        R_a_p = f
        R_a_e = alpha - alpha_old

        plastic = path == PLASTIC
        return self.pack(
            jnp.where(plastic, R_TC_p, R_TC),
            jnp.where(plastic, R_a_p, R_a_e),
            jnp.where(plastic, R_zz_p, R_zz),
        )

    def hydro_cauchy(self, xi, kin, params):
        RC = self.rotated_cauchy(xi, kin)
        TC_zz = xi[4]
        return (jnp.trace(RC) + TC_zz) / 3.0


@register
class HypoHillPlaneStress(_HypoBase):
    """hypo_hill_plane_stress.cpp: xi = (TC 2x2, alpha, lambda_z); a
    material-orientation rotation Q enters the rate and the rotated
    stress; the z-stretch evolves as
    lambda_z = lambda_z_old / (1 - (d_zz + corr))."""

    name = "hypo_hill_plane_stress"
    param_names = (
        "E",
        "nu",
        "Y",
        "S",
        "D",
        "R00",
        "R11",
        "R22",
        "R01",
        "Q00",
        "Q01",
        "Q10",
        "Q11",
    )
    z_stretch_idx = 4

    def _extra(self) -> int:
        return 1

    def init_xi(self) -> np.ndarray:
        # TC = 0, alpha = 0, lambda_z = 1
        # (hypo_hill_plane_stress.cpp init_variables_impl)
        return np.array([0.0, 0.0, 0.0, 0.0, 1.0])

    def unpack3(self, xi):
        return voigt_to_sym(xi[:3], 2), xi[3], xi[4]

    def _Q(self, params):
        return jnp.array(
            [[params[9], params[10]], [params[11], params[12]]]
        )

    def _hill_params(self, params):
        R00, R11, R22, R01 = params[5], params[6], params[7], params[8]
        one = jnp.ones_like(R00)
        return yf.hill_params(R00, R11, R22, R01, one, one)

    def _voce(self, alpha, params):
        Y, S, D = params[2], params[3], params[4]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def _d(self, kin, params):
        dQ, R = unrotated_rate(kin)
        Q = self._Q(params)
        return Q.T @ dQ @ Q

    def first_guess(self, xi_prev, kin, params):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        TC_old, alpha_old, lam_z_old = self.unpack3(xi_prev)
        d = self._d(kin, params)
        d_zz = -lam * jnp.trace(d) / (lam + 2.0 * mu)
        I2 = jnp.eye(2, dtype=xi_prev.dtype)
        TC = TC_old + lam * (jnp.trace(d) + d_zz) * I2 + 2.0 * mu * d
        lam_z = lam_z_old / (1.0 - d_zz)
        return self.pack(TC, alpha_old, lam_z)

    def _f(self, xi, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        TC, alpha, _ = self.unpack3(xi)
        TC3 = insert_2d_into_3d(TC)
        hp = self._hill_params(params)
        phi = yf.hill_value(TC3, hp)
        return (phi - self._voce(alpha, params)) / mu, TC3, hp, phi

    def pathfn(self, xi, xi_prev, kin, params):
        f, _, _, _ = self._f(xi, params)
        return jnp.where(f >= -self.abs_tol, PLASTIC, ELASTIC).astype(jnp.int32)

    def residual(self, xi, xi_prev, kin, params, path):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        TC_old, alpha_old, lam_z_old = self.unpack3(xi_prev)
        TC, alpha, lam_z = self.unpack3(xi)
        I2 = jnp.eye(2, dtype=xi.dtype)
        d = self._d(kin, params)
        d_zz = -lam * jnp.trace(d) / (lam + 2.0 * mu)
        R_TC = TC - TC_old - lam * (jnp.trace(d) + d_zz) * I2 - 2.0 * mu * d

        f, TC3, hp, phi = self._f(xi, params)
        n3 = yf.hill_normal(TC3, hp, phi)
        n2 = extract_2d_from_3d(n3)
        dgam = alpha - alpha_old
        dp2 = dgam * n2
        dp_zz = -jnp.trace(dp2)
        corr = 2.0 * mu * dp_zz / (2.0 * mu + lam)

        R_TC_p = R_TC.at[0, 0].add(2.0 * mu * dp2[0, 0] - lam * corr)
        R_TC_p = R_TC_p.at[1, 1].add(2.0 * mu * dp2[1, 1] - lam * corr)
        R_TC_p = R_TC_p.at[0, 1].add(2.0 * mu * dp2[0, 1])
        R_TC_p = R_TC_p.at[1, 0].set(R_TC_p[0, 1])
        R_TC_p = R_TC_p / mu  # (hypo_hill_plane_stress.cpp:325)
        R_a_p = f
        R_lam_p = lam_z - lam_z_old / (1.0 - (d_zz + corr))

        R_a_e = alpha - alpha_old
        R_lam_e = lam_z - lam_z_old / (1.0 - d_zz)

        plastic = path == PLASTIC
        return self.pack(
            jnp.where(plastic, R_TC_p, R_TC),
            jnp.where(plastic, R_a_p, R_a_e),
            jnp.where(plastic, R_lam_p, R_lam_e),
        )

    # the material rotation Q enters the rotated stress; Q depends on
    # params, so override the stress measures directly
    # (hypo_hill_plane_stress.cpp rotated_cauchy: R Q TC Q^T R^T)
    def cauchy(self, xi, kin, params, p=0.0):
        TC, _, _ = self.unpack3(xi)
        R = polar_rotation(kin.F)
        Q = self._Q(params)
        return R @ Q @ TC @ Q.T @ R.T

    def dev_cauchy(self, xi, kin, params):
        c = self.cauchy(xi, kin, params)
        return c - self.hydro_cauchy(xi, kin, params) * jnp.eye(2, dtype=xi.dtype)

    def hydro_cauchy(self, xi, kin, params):
        return jnp.trace(self.cauchy(xi, kin, params)) / 3.0

    def pressure_scale_factor(self, params):
        return 0.0


@register
class HypoHosford(_HypoBase):
    """hypo_hosford.cpp (3D): Hosford yield on the unrotated stress TC,
    flow Y + S (1 - e^{-D a}), scale factor 2 mu."""

    name = "hypo_hosford"
    freeze_path = True  # branch chosen at iterate 1, then forced
    param_names = ("E", "nu", "Y", "a", "K", "S", "D")

    def __init__(self, dim):
        super().__init__(dim)
        assert dim == 3, "hypo_hosford is a 3D model"

    def first_guess(self, xi_prev, kin, params):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        TC_old, alpha_old = self.unpack(xi_prev)
        d, _ = unrotated_rate(kin)
        TC = TC_old + lam * jnp.trace(d) * jnp.eye(3, dtype=xi_prev.dtype) + 2.0 * mu * d
        return self.pack(TC, alpha_old)

    def _phi_n(self, xi, params):
        a = params[3]
        TC, _ = self.unpack(xi)
        devTC = TC - jnp.trace(TC) / 3.0 * jnp.eye(3, dtype=xi.dtype)
        return yf.hosford_phi_and_normal(TC, devTC, a)

    def pathfn(self, xi, xi_prev, kin, params):
        E, nu, Y, a, K, S, D = (params[i] for i in range(7))
        mu = compute_mu(E, nu)
        _, alpha = self.unpack(xi)
        phi, _ = self._phi_n(xi, params)
        flow = Y + S * (1.0 - jnp.exp(-D * alpha))
        f = (phi - flow) / (2.0 * mu)
        return jnp.where(f >= -self.abs_tol, PLASTIC, ELASTIC).astype(jnp.int32)

    def residual(self, xi, xi_prev, kin, params, path):
        E, nu, Y, a, K, S, D = (params[i] for i in range(7))
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        scale = 2.0 * mu
        TC_old, alpha_old = self.unpack(xi_prev)
        TC, alpha = self.unpack(xi)
        I = jnp.eye(3, dtype=xi.dtype)
        d, _ = unrotated_rate(kin)
        R_TC = (TC - TC_old - lam * jnp.trace(d) * I - 2.0 * mu * d) / scale

        phi, n = self._phi_n(xi, params)
        flow = Y + S * (1.0 - jnp.exp(-D * alpha))
        f = (phi - flow) / scale
        dgam = alpha - alpha_old

        plastic = path == PLASTIC
        return self.pack(
            jnp.where(plastic, R_TC + dgam * n, R_TC),
            jnp.where(plastic, f, alpha - alpha_old),
        )


@register
class HypoBarlat(_HypoBase):
    """hypo_barlat.cpp (3D): Barlat Yld2004-18p yield on TC, hardening
    Y + K a + S (1 - e^{-D a}), scale factor 2 mu."""

    name = "hypo_barlat"
    freeze_path = True  # branch chosen at iterate 1, then forced
    param_names = (
        "E", "nu", "Y", "a", "K", "S", "D",
        "sp_01", "sp_02", "sp_10", "sp_12", "sp_20", "sp_21",
        "sp_33", "sp_44", "sp_55",
        "dp_01", "dp_02", "dp_10", "dp_12", "dp_20", "dp_21",
        "dp_33", "dp_44", "dp_55",
    )

    def __init__(self, dim):
        super().__init__(dim)
        assert dim == 3, "hypo_barlat is a 3D model"

    def first_guess(self, xi_prev, kin, params):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        TC_old, alpha_old = self.unpack(xi_prev)
        d, _ = unrotated_rate(kin)
        TC = TC_old + lam * jnp.trace(d) * jnp.eye(3, dtype=xi_prev.dtype) + 2.0 * mu * d
        return self.pack(TC, alpha_old)

    def _phi_n(self, xi, params):
        a = params[3]
        sp = params[7:16]
        dp = params[16:25]
        TC, _ = self.unpack(xi)
        return yf.barlat_phi_and_normal(TC, sp, dp, a)

    def _flow(self, alpha, params):
        Y, K, S, D = params[2], params[4], params[5], params[6]
        return Y + K * alpha + S * (1.0 - jnp.exp(-D * alpha))

    def pathfn(self, xi, xi_prev, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        _, alpha = self.unpack(xi)
        phi, _ = self._phi_n(xi, params)
        f = (phi - self._flow(alpha, params)) / (2.0 * mu)
        return jnp.where(f >= -self.abs_tol, PLASTIC, ELASTIC).astype(jnp.int32)

    def residual(self, xi, xi_prev, kin, params, path):
        E, nu = params[0], params[1]
        lam, mu = compute_lambda(E, nu), compute_mu(E, nu)
        scale = 2.0 * mu
        TC_old, alpha_old = self.unpack(xi_prev)
        TC, alpha = self.unpack(xi)
        I = jnp.eye(3, dtype=xi.dtype)
        d, _ = unrotated_rate(kin)
        R_TC = (TC - TC_old - lam * jnp.trace(d) * I - 2.0 * mu * d) / scale

        phi, n = self._phi_n(xi, params)
        f = (phi - self._flow(alpha, params)) / scale
        dgam = alpha - alpha_old

        plastic = path == PLASTIC
        return self.pack(
            jnp.where(plastic, R_TC + dgam * n, R_TC),
            jnp.where(plastic, f, alpha - alpha_old),
        )

"""Finite-deformation hyperelastic-plastic J2 models.

Reference implementations:
  hyper_J2               source/calibr8/src/hyper_J2.cpp
  hyper_J2_plane_strain  source/calibr8/src/hyper_J2_plane_strain.cpp
  hyper_J2_plane_stress  source/calibr8/src/hyper_J2_plane_stress.cpp

Multiplicative elastoplasticity on the isochoric elastic left
Cauchy-Green tensor: local state (zeta = dev(be_bar), Ie = tr(be_bar)/3,
[lambda_z,] alpha); trial state by pushing forward with the relative
deformation gradient rF_bar = rF / det(rF)^{1/3}; plastic return with
radial flow n = s/|s|, s = mu zeta, det(be_bar) = 1 enforced; Kirchhoff
dev stress tau = mu zeta so dev_cauchy = mu zeta / J; hydrostatic
kappa/2 (J - 1/J).
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
    compute_mu,
    dev,
    num_sym_comps,
    safe_norm,
    sym_to_voigt,
    voigt_to_sym,
)
from calibr8_tpu.models.yield_fns import insert_2d_into_3d

SQRT_23 = float(np.sqrt(2.0 / 3.0))  # python float: a np.float64 scalar is STRONG f64 under x64 and silently promotes f32 model math
SQRT_32 = float(np.sqrt(3.0 / 2.0))
POWER_LAW_OFFSET = 1e-12


def _rel_def_grad_bar(F, F_prev):
    """rF_bar = rF / det(rF)^(1/3) (hyper_J2.cpp eval_be_bar)."""
    rF = F @ jnp.linalg.inv(F_prev)
    det_rF = jnp.linalg.det(rF)
    return rF / jnp.cbrt(det_rF), det_rF


@register
class HyperJ2(LocalModel):
    """hyper_J2 (reference: hyper_J2.cpp): hardening
    Y + S (1 - e^{-D a}) + A (a + eps)^n + K a."""

    name = "hyper_J2"
    param_names = ("E", "nu", "Y", "S", "D", "A", "n", "K")
    finite_deformation = True

    def nxi(self) -> int:
        return num_sym_comps(self.dim) + 2

    def init_xi(self) -> np.ndarray:
        xi = np.zeros(self.nxi())
        xi[num_sym_comps(self.dim)] = 1.0  # Ie = 1
        return xi

    def unpack(self, xi):
        nc = num_sym_comps(self.dim)
        return voigt_to_sym(xi[:nc], self.dim), xi[nc], xi[nc + 1]

    def pack(self, zeta, Ie, alpha):
        return jnp.concatenate(
            [
                sym_to_voigt(zeta, self.dim),
                jnp.reshape(Ie, (1,)),
                jnp.reshape(alpha, (1,)),
            ]
        )

    def _be_bar(self, zeta, Ie, kin: Kinematics):
        d = self.dim
        rF_bar, _ = _rel_def_grad_bar(kin.F, kin.F_prev)
        return rF_bar @ (zeta + Ie * jnp.eye(d, dtype=zeta.dtype)) @ rF_bar.T

    def first_guess(self, xi_prev, kin, params):
        zeta_old, Ie_old, alpha_old = self.unpack(xi_prev)
        be_bar_trial = self._be_bar(zeta_old, Ie_old, kin)
        zeta = dev(be_bar_trial)
        Ie = jnp.trace(be_bar_trial) / 3.0
        return self.pack(zeta, Ie, alpha_old)

    def _sigma_yield(self, alpha, params):
        Y, S, D, A, n, K = (params[i] for i in range(2, 8))
        return (
            Y
            + S * (1.0 - jnp.exp(-D * alpha))
            + A * (alpha + POWER_LAW_OFFSET) ** n
            + K * alpha
        )

    def pathfn(self, xi, xi_prev, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        zeta, Ie, alpha = self.unpack(xi)
        s_mag = safe_norm(mu * zeta)
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, params)) / mu
        return jnp.where(f >= -self.abs_tol, PLASTIC, ELASTIC).astype(jnp.int32)

    def residual(self, xi, xi_prev, kin, params, path):
        d = self.dim
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        zeta_old, Ie_old, alpha_old = self.unpack(xi_prev)
        zeta, Ie, alpha = self.unpack(xi)
        I = jnp.eye(d, dtype=xi.dtype)

        be_bar_trial = self._be_bar(zeta_old, Ie_old, kin)
        s = mu * zeta
        s_mag = safe_norm(s)
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, params)) / mu

        n = s / s_mag
        dgam = SQRT_32 * (alpha - alpha_old)
        R_zeta_p = zeta - dev(be_bar_trial) + 2.0 * dgam * Ie * n
        R_Ie_p = jnp.linalg.det(zeta + Ie * I) - 1.0
        R_a_p = f

        R_zeta_e = zeta - dev(be_bar_trial)
        R_Ie_e = Ie - jnp.trace(be_bar_trial) / 3.0
        R_a_e = alpha - alpha_old

        plastic = path == PLASTIC
        return self.pack(
            jnp.where(plastic, R_zeta_p, R_zeta_e),
            jnp.where(plastic, R_Ie_p, R_Ie_e),
            jnp.where(plastic, R_a_p, R_a_e),
        )

    def dev_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        zeta, _, _ = self.unpack(xi)
        J = jnp.linalg.det(kin.F)
        return mu * zeta / J

    def hydro_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        kappa = compute_kappa(E, nu)
        J = jnp.linalg.det(kin.F)
        return kappa / 2.0 * (J - 1.0 / J)


@register
class HyperJ2PlaneStrain(LocalModel):
    """hyper_J2_plane_strain (reference: hyper_J2_plane_strain.cpp):
    2D in-plane zeta with zeta_zz = -tr(zeta); hardening
    Y + K a + (Y_inf - Y)(1 - e^{-delta a})."""

    name = "hyper_J2_plane_strain"
    param_names = ("E", "nu", "K", "Y", "Y_inf", "delta")
    finite_deformation = True

    def nxi(self) -> int:
        return 5  # zeta (3), Ie, alpha

    def init_xi(self) -> np.ndarray:
        return np.array([0.0, 0.0, 0.0, 1.0, 0.0])

    def unpack(self, xi):
        return voigt_to_sym(xi[:3], 2), xi[3], xi[4]

    def pack(self, zeta, Ie, alpha):
        return jnp.concatenate(
            [sym_to_voigt(zeta, 2), jnp.reshape(Ie, (1,)), jnp.reshape(alpha, (1,))]
        )

    def _be_bar_3d(self, zeta, Ie, kin: Kinematics):
        """3D be_bar with the plane-strain zz embedding
        (hyper_J2_plane_strain.cpp eval_be_bar_plane_strain)."""
        I2 = jnp.eye(2, dtype=zeta.dtype)
        rF = kin.F @ jnp.linalg.inv(kin.F_prev)
        det_rF = jnp.linalg.det(rF)
        c = jnp.cbrt(det_rF)
        rF_bar = rF / c
        be_2d = rF_bar @ (zeta + Ie * I2) @ rF_bar.T
        zeta_zz = -jnp.trace(zeta)
        be_zz = (zeta_zz + Ie) / (c * c)
        return insert_2d_into_3d(be_2d).at[2, 2].set(be_zz)

    def first_guess(self, xi_prev, kin, params):
        zeta_old, Ie_old, alpha_old = self.unpack(xi_prev)
        be3 = self._be_bar_3d(zeta_old, Ie_old, kin)
        Ie_trial = jnp.trace(be3) / 3.0
        zeta_trial = be3[:2, :2] - Ie_trial * jnp.eye(2, dtype=xi_prev.dtype)
        return self.pack(zeta_trial, Ie_trial, alpha_old)

    def _sigma_yield(self, alpha, params):
        K, Y, Y_inf, delta = (params[i] for i in range(2, 6))
        return Y + K * alpha + (Y_inf - Y) * (1.0 - jnp.exp(-delta * alpha))

    def _f_and_smag(self, xi, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        zeta, Ie, alpha = self.unpack(xi)
        zeta3 = insert_2d_into_3d(zeta).at[2, 2].set(-jnp.trace(zeta))
        s_mag = safe_norm(mu * zeta3)
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, params)) / mu
        return f, s_mag

    def pathfn(self, xi, xi_prev, kin, params):
        f, _ = self._f_and_smag(xi, params)
        return jnp.where(f >= -self.abs_tol, PLASTIC, ELASTIC).astype(jnp.int32)

    def residual(self, xi, xi_prev, kin, params, path):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        zeta_old, Ie_old, alpha_old = self.unpack(xi_prev)
        zeta, Ie, alpha = self.unpack(xi)
        I2 = jnp.eye(2, dtype=xi.dtype)
        I3 = jnp.eye(3, dtype=xi.dtype)

        be3_trial = self._be_bar_3d(zeta_old, Ie_old, kin)
        Ie_trial = jnp.trace(be3_trial) / 3.0
        zeta_trial = be3_trial[:2, :2] - Ie_trial * I2

        zeta3 = insert_2d_into_3d(zeta).at[2, 2].set(-jnp.trace(zeta))
        be3 = zeta3 + Ie * I3
        f, s_mag = self._f_and_smag(xi, params)

        n2 = mu * zeta / s_mag
        dgam = SQRT_32 * (alpha - alpha_old)
        R_zeta_p = zeta - zeta_trial + 2.0 * dgam * Ie * n2
        R_Ie_p = jnp.linalg.det(be3) - 1.0
        R_a_p = f

        R_zeta_e = zeta - zeta_trial
        R_Ie_e = Ie - Ie_trial
        R_a_e = alpha - alpha_old

        plastic = path == PLASTIC
        return self.pack(
            jnp.where(plastic, R_zeta_p, R_zeta_e),
            jnp.where(plastic, R_Ie_p, R_Ie_e),
            jnp.where(plastic, R_a_p, R_a_e),
        )

    def dev_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        zeta, _, _ = self.unpack(xi)
        J = jnp.linalg.det(kin.F)
        return mu * zeta / J

    def hydro_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        kappa = compute_kappa(E, nu)
        J = jnp.linalg.det(kin.F)
        return kappa / 2.0 * (J - 1.0 / J)


@register
class HyperJ2PlaneStress(LocalModel):
    """hyper_J2_plane_stress (reference: hyper_J2_plane_stress.cpp):
    carries the out-of-plane stretch lambda_z as a local variable
    enforcing sigma_zz = 0; displacement formulation
    ('mechanics_plane_stress') with full cauchy =
    mu zeta / J + kappa/2 (J - 1/J) I, J = det(F_2D) lambda_z."""

    name = "hyper_J2_plane_stress"
    param_names = ("E", "nu", "Y", "S", "D", "A", "n", "K")
    finite_deformation = True
    z_stretch_idx = 4

    def nxi(self) -> int:
        return 6  # zeta (3), Ie, lambda_z, alpha

    def init_xi(self) -> np.ndarray:
        return np.array([0.0, 0.0, 0.0, 1.0, 1.0, 0.0])

    def unpack(self, xi):
        return voigt_to_sym(xi[:3], 2), xi[3], xi[4], xi[5]

    def pack(self, zeta, Ie, lam_z, alpha):
        return jnp.concatenate(
            [
                sym_to_voigt(zeta, 2),
                jnp.reshape(Ie, (1,)),
                jnp.reshape(lam_z, (1,)),
                jnp.reshape(alpha, (1,)),
            ]
        )

    def _be_bar_3d(self, zeta2, Ie, lam_z_prev, lam_z, kin: Kinematics):
        """(hyper_J2_plane_stress.cpp eval_be_bar_plane_stress)"""
        F3 = insert_2d_into_3d(kin.F).at[2, 2].set(lam_z)
        Fp3 = insert_2d_into_3d(kin.F_prev).at[2, 2].set(lam_z_prev)
        rF = F3 @ jnp.linalg.inv(Fp3)
        rF_bar = rF / jnp.cbrt(jnp.linalg.det(rF))
        zeta3 = insert_2d_into_3d(zeta2).at[2, 2].set(-jnp.trace(zeta2))
        I3 = jnp.eye(3, dtype=zeta2.dtype)
        return rF_bar @ (zeta3 + Ie * I3) @ rF_bar.T

    def first_guess(self, xi_prev, kin, params):
        zeta_old, Ie_old, lam_z_old, alpha_old = self.unpack(xi_prev)
        be3 = self._be_bar_3d(zeta_old, Ie_old, lam_z_old, lam_z_old, kin)
        Ie_trial = jnp.trace(be3) / 3.0
        zeta3_trial = be3 - Ie_trial * jnp.eye(3, dtype=xi_prev.dtype)
        return self.pack(zeta3_trial[:2, :2], Ie_trial, lam_z_old, alpha_old)

    def _sigma_yield(self, alpha, params):
        Y, S, D, A, n, K = (params[i] for i in range(2, 8))
        return (
            Y
            + S * (1.0 - jnp.exp(-D * alpha))
            + A * (alpha + POWER_LAW_OFFSET) ** n
            + K * alpha
        )

    def pathfn(self, xi, xi_prev, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        zeta, Ie, lam_z, alpha = self.unpack(xi)
        zeta3 = insert_2d_into_3d(zeta).at[2, 2].set(-jnp.trace(zeta))
        s_mag = safe_norm(mu * zeta3)
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, params)) / mu
        return jnp.where(f >= -self.abs_tol, PLASTIC, ELASTIC).astype(jnp.int32)

    def residual(self, xi, xi_prev, kin, params, path):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        kappa = compute_kappa(E, nu)
        zeta_old, Ie_old, lam_z_old, alpha_old = self.unpack(xi_prev)
        zeta, Ie, lam_z, alpha = self.unpack(xi)
        I3 = jnp.eye(3, dtype=xi.dtype)

        J_2D = jnp.linalg.det(kin.F)
        be3_trial = self._be_bar_3d(zeta_old, Ie_old, lam_z_old, lam_z, kin)
        Ie_trial = jnp.trace(be3_trial) / 3.0
        zeta_trial = (be3_trial - Ie_trial * I3)[:2, :2]

        zeta_zz = -jnp.trace(zeta)
        zeta3 = insert_2d_into_3d(zeta).at[2, 2].set(zeta_zz)
        be3 = zeta3 + Ie * I3
        s_mag = safe_norm(mu * zeta3)
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, params)) / mu

        # plane-stress constraint on the out-of-plane stretch
        mat_factor = kappa / (2.0 * mu)
        R_lam = lam_z - jnp.sqrt(
            jnp.maximum((1.0 - zeta_zz / mat_factor) / (J_2D * J_2D), 1e-30)
        )

        n2 = mu * zeta / s_mag
        dgam = SQRT_32 * (alpha - alpha_old)
        R_zeta_p = zeta - zeta_trial + 2.0 * dgam * Ie * n2
        R_Ie_p = jnp.linalg.det(be3) - 1.0
        R_a_p = f

        R_zeta_e = zeta - zeta_trial
        R_Ie_e = Ie - Ie_trial
        R_a_e = alpha - alpha_old

        plastic = path == PLASTIC
        return self.pack(
            jnp.where(plastic, R_zeta_p, R_zeta_e),
            jnp.where(plastic, R_Ie_p, R_Ie_e),
            R_lam,
            jnp.where(plastic, R_a_p, R_a_e),
        )

    def cauchy(self, xi, kin, params, p=0.0):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        kappa = compute_kappa(E, nu)
        zeta, _, lam_z, _ = self.unpack(xi)
        J = jnp.linalg.det(kin.F) * lam_z
        return mu * zeta / J + kappa / 2.0 * (J - 1.0 / J) * jnp.eye(
            2, dtype=xi.dtype
        )

    def dev_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        zeta, _, lam_z, _ = self.unpack(xi)
        J = jnp.linalg.det(kin.F) * lam_z
        return mu * zeta / J

    def hydro_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        kappa = compute_kappa(E, nu)
        _, _, lam_z, _ = self.unpack(xi)
        J = jnp.linalg.det(kin.F) * lam_z
        return kappa / 2.0 * (J - 1.0 / J)

    def pressure_scale_factor(self, params):
        return 0.0

"""Small-strain elastoplastic local models.

Reference implementations:
  small_J2                  source/calibr8/src/small_J2.cpp
  small_hill                source/calibr8/src/small_hill.cpp (3D)
  small_hill_plane_strain   source/calibr8/src/small_hill_plane_strain.cpp
  small_hill_plane_stress   source/calibr8/src/small_hill_plane_stress.cpp
  small_hosford             source/calibr8/src/small_hosford.cpp (3D)

Shared structure: local state xi = (pstrain sym tensor, alpha scalar);
elastic trial branch keeps Delta pstrain = Delta alpha = 0; the plastic
branch enforces associative flow pstrain - pstrain_old = dgam * n and
the yield condition f = 0, with f normalized by mu for conditioning.
The branch is selected from the *current* iterate each Newton iteration
(f >= -tol), recorded as `path`, and can be forced during recomputation
(adjoint/error estimation) exactly like the reference's force_path.
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
    dev3,
    num_sym_comps,
    safe_norm,
    sym_to_voigt,
    voigt_to_sym,
)
from calibr8_tpu.models import yield_fns as yf

SQRT_23 = float(np.sqrt(2.0 / 3.0))  # python float: a np.float64 scalar is STRONG f64 under x64 and silently promotes f32 model math
SQRT_32 = float(np.sqrt(3.0 / 2.0))


def small_strain(kin: Kinematics):
    gu = kin.grad_u
    return 0.5 * (gu + gu.swapaxes(-1, -2))


class _SmallStrainPlastic(LocalModel):
    """Common xi packing: [pstrain voigt, alpha]."""

    finite_deformation = False
    abs_tol = 1e-12  # overwritten from the deck's local-residual tolerances

    def nxi(self) -> int:
        return num_sym_comps(self.dim) + 1

    def init_xi(self) -> np.ndarray:
        return np.zeros(self.nxi())

    def unpack(self, xi):
        nc = num_sym_comps(self.dim)
        return voigt_to_sym(xi[:nc], self.dim), xi[nc]

    def pack(self, pstrain, alpha):
        return jnp.concatenate(
            [sym_to_voigt(pstrain, self.dim), jnp.reshape(alpha, (1,))]
        )

    # deviatoric stress shared by J2/Hill small-strain models
    def dev_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        pstrain, _ = self.unpack(xi)
        eps = small_strain(kin)
        return 2.0 * mu * (dev3(eps) - pstrain)

    def hydro_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        kappa = compute_kappa(E, nu)
        eps = small_strain(kin)
        return kappa * jnp.trace(eps) - self._thermal_term(params)

    def _thermal_term(self, params):
        return 0.0

    def pathfn(self, xi, xi_prev, kin, params):
        f = self._yield_f(xi, kin, params)
        return jnp.where(f >= -self.abs_tol, PLASTIC, ELASTIC).astype(jnp.int32)

    def residual(self, xi, xi_prev, kin, params, path):
        pstrain, alpha = self.unpack(xi)
        pstrain_old, alpha_old = self.unpack(xi_prev)
        f = self._yield_f(xi, kin, params)
        n = self._flow_normal(xi, kin, params)
        dgam = self._dgam_scale() * (alpha - alpha_old)
        R_p_plastic = pstrain - pstrain_old - dgam * n
        R_p_plastic = self._plastic_pstrain_post(R_p_plastic, pstrain)
        R_a_plastic = f
        R_p_elastic = pstrain - pstrain_old
        R_a_elastic = alpha - alpha_old
        plastic = path == PLASTIC
        R_p = jnp.where(plastic, R_p_plastic, R_p_elastic)
        R_a = jnp.where(plastic, R_a_plastic, R_a_elastic)
        return self.pack(R_p, R_a)

    # hooks -------------------------------------------------------------
    def _dgam_scale(self):
        return 1.0

    def _plastic_pstrain_post(self, R_p, pstrain):
        return R_p

    def _yield_f(self, xi, kin, params):
        raise NotImplementedError

    def _flow_normal(self, xi, kin, params):
        raise NotImplementedError


@register
class SmallJ2(_SmallStrainPlastic):
    """Radial-return J2 with linear hardening sigma_y = Y + K alpha
    (reference: small_J2.cpp:186-246)."""

    name = "small_J2"
    param_names = ("E", "nu", "K", "Y", "cte", "delta_T")

    def _thermal_term(self, params):
        E, nu, cte, dT = params[0], params[1], params[4], params[5]
        return cte * dT * E / (1.0 - 2.0 * nu)

    def _dgam_scale(self):
        return SQRT_32

    def _yield_f(self, xi, kin, params):
        E, nu, K, Y = params[0], params[1], params[2], params[3]
        mu = compute_mu(E, nu)
        _, alpha = self.unpack(xi)
        s = self.dev_cauchy(xi, kin, params)
        s_mag = safe_norm(s)
        sigma_yield = Y + K * alpha
        return (s_mag - SQRT_23 * sigma_yield) / mu

    def _flow_normal(self, xi, kin, params):
        s = self.dev_cauchy(xi, kin, params)
        return s / safe_norm(s)


class _SmallHillBase(_SmallStrainPlastic):
    """Hill anisotropic yield on the deviatoric stress with Voce
    hardening Y + S (1 - exp(-D alpha)) (small_hill.cpp:195-275)."""

    def _hill_params(self, params):
        raise NotImplementedError

    def _hill_stress_3d(self, xi, kin, params):
        """The 3D tensor the Hill function is evaluated on."""
        raise NotImplementedError

    def _voce(self, alpha, params):
        raise NotImplementedError

    def _yield_f(self, xi, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        _, alpha = self.unpack(xi)
        hp = self._hill_params(params)
        s3 = self._hill_stress_3d(xi, kin, params)
        hill = yf.hill_value(s3, hp)
        return (hill - self._voce(alpha, params)) / mu

    def _flow_normal(self, xi, kin, params):
        hp = self._hill_params(params)
        s3 = self._hill_stress_3d(xi, kin, params)
        hill = yf.hill_value(s3, hp)
        n3 = yf.hill_normal(s3, hp, hill)
        if self.dim == 2:
            return yf.extract_2d_from_3d(n3)
        return n3


@register
class SmallHill(_SmallHillBase):
    """3D Hill (small_hill.cpp); the plastic pstrain residual replaces
    the zz equation with incompressibility tr(pstrain) = 0
    (small_hill.cpp:240)."""

    name = "small_hill"
    param_names = ("E", "nu", "Y", "R00", "R11", "R22", "R01", "R02", "R12", "S", "D")

    def _hill_params(self, params):
        return yf.hill_params(*[params[i] for i in range(3, 9)])

    def _voce(self, alpha, params):
        Y, S, D = params[2], params[9], params[10]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def _hill_stress_3d(self, xi, kin, params):
        return self.dev_cauchy(xi, kin, params)

    def _plastic_pstrain_post(self, R_p, pstrain):
        return R_p.at[2, 2].set(jnp.trace(pstrain))


@register
class SmallHillPlaneStrain(_SmallHillBase):
    """2D plane strain Hill (small_hill_plane_strain.cpp): the 2x2
    in-plane deviator is embedded in 3D with
    s_zz = 2 mu (-tr(eps)/3 + tr(pstrain))."""

    name = "small_hill_plane_strain"
    param_names = ("E", "nu", "Y", "S", "D", "R00", "R11", "R22", "R01")

    def _hill_params(self, params):
        R00, R11, R22, R01 = params[5], params[6], params[7], params[8]
        one = jnp.ones_like(R00)
        return yf.hill_params(R00, R11, R22, R01, one, one)

    def _voce(self, alpha, params):
        Y, S, D = params[2], params[3], params[4]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def _hill_stress_3d(self, xi, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        pstrain, _ = self.unpack(xi)
        eps = small_strain(kin)
        s2 = self.dev_cauchy(xi, kin, params)
        s_zz = 2.0 * mu * (-jnp.trace(eps) / 3.0 + jnp.trace(pstrain))
        return yf.insert_2d_into_3d(s2).at[2, 2].set(s_zz)


@register
class SmallHillPlaneStress(_SmallHillBase):
    """2D plane stress Hill (small_hill_plane_stress.cpp): displacement
    formulation (used with 'mechanics_plane_stress'); the out-of-plane
    strain eliminates sigma_zz = 0 in closed form; the yield function is
    evaluated on the FULL in-plane Cauchy stress."""

    name = "small_hill_plane_stress"
    param_names = ("E", "nu", "Y", "S", "D", "R00", "R11", "R22", "R01")

    def _hill_params(self, params):
        R00, R11, R22, R01 = params[5], params[6], params[7], params[8]
        one = jnp.ones_like(R00)
        return yf.hill_params(R00, R11, R22, R01, one, one)

    def _voce(self, alpha, params):
        Y, S, D = params[2], params[3], params[4]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def epsilon_zz(self, xi, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        lam = compute_lambda(E, nu)
        pstrain, _ = self.unpack(xi)
        eps = small_strain(kin)
        return -(lam * jnp.trace(eps) + 2.0 * mu * jnp.trace(pstrain)) / (
            lam + 2.0 * mu
        )

    def cauchy(self, xi, kin, params, p=0.0):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        lam = compute_lambda(E, nu)
        pstrain, _ = self.unpack(xi)
        eps = small_strain(kin)
        eps_kk = jnp.trace(eps) + self.epsilon_zz(xi, kin, params)
        return lam * eps_kk * jnp.eye(2, dtype=xi.dtype) + 2.0 * mu * (
            eps - pstrain
        )

    def dev_cauchy(self, xi, kin, params):
        c = self.cauchy(xi, kin, params)
        return c - self.hydro_cauchy(xi, kin, params) * jnp.eye(2, dtype=xi.dtype)

    def hydro_cauchy(self, xi, kin, params):
        return jnp.trace(self.cauchy(xi, kin, params)) / 3.0

    def pressure_scale_factor(self, params):
        return 0.0

    def _hill_stress_3d(self, xi, kin, params):
        return yf.insert_2d_into_3d(self.cauchy(xi, kin, params))


@register
class SmallHosford(_SmallStrainPlastic):
    """3D Hosford yield with combined hardening
    Y + K alpha + S (1 - exp(-D alpha)) and f normalized by 2 mu
    (small_hosford.cpp:160-224)."""

    name = "small_hosford"
    freeze_path = True  # branch chosen at iterate 1, then forced
    param_names = ("E", "nu", "Y", "a", "K", "S", "D")

    def _yield_f(self, xi, kin, params):
        E, nu, Y, a, K, S, D = (params[i] for i in range(7))
        mu = compute_mu(E, nu)
        _, alpha = self.unpack(xi)
        sigma = self.cauchy_full(xi, kin, params)
        s = self.dev_cauchy(xi, kin, params)
        phi, _ = yf.hosford_phi_and_normal(sigma, s, a)
        flow = Y + K * alpha + S * (1.0 - jnp.exp(-D * alpha))
        return (phi - flow) / (2.0 * mu)

    def _flow_normal(self, xi, kin, params):
        a = params[3]
        sigma = self.cauchy_full(xi, kin, params)
        s = self.dev_cauchy(xi, kin, params)
        _, n = yf.hosford_phi_and_normal(sigma, s, a)
        return n

    def cauchy_full(self, xi, kin, params):
        """The mixed-formulation 'cauchy' needs the pressure; inside the
        local residual the reference uses cauchy(global) with the
        CURRENT global pressure.  The Hosford yield is pressure
        insensitive only through the eigen differences, and the
        reference genuinely evaluates it on dev - p I; we mirror by
        passing the interpolated pressure through kinematics aux."""
        # NOTE: the pressure enters eigenvalues uniformly, so the
        # eigen-differences (and hence phi and n) are identical with or
        # without the -p I shift; evaluate on the deviator.
        return self.dev_cauchy(xi, kin, params)

"""Linear elastic local models (no internal state).

`elastic` — mixed-formulation small-strain elasticity with thermal strain
(reference: source/calibr8/src/elastic.cpp): sigma = 2 mu dev(eps) - p I,
hydrostatic constraint kappa tr(eps) - 3 kappa cte dT.

`isotropic_elastic` — displacement-only isotropic elasticity
(reference: source/calibr8/src/isotropic_elastic.cpp): full sigma from
lambda tr(eps) I + 2 mu eps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.models.base import (
    ELASTIC,
    Kinematics,
    LocalModel,
    compute_kappa,
    compute_lambda,
    compute_mu,
    dev3,
    eye,
)


def small_strain(kin: Kinematics) -> jnp.ndarray:
    gu = kin.grad_u
    return 0.5 * (gu + gu.swapaxes(-1, -2))


class Elastic(LocalModel):
    """Mixed u/p linear elasticity with a dummy scalar local variable
    (reference: elastic.cpp:28-44 keeps a 1-dof 'dummy' slot)."""

    name = "elastic"
    param_names = ("E", "nu", "cte", "delta_T")
    finite_deformation = False
    uses_path = False

    def nxi(self) -> int:
        return 1

    def init_xi(self) -> np.ndarray:
        return np.zeros(1)

    def needs_local_newton(self) -> bool:
        return False

    def residual(self, xi, xi_prev, kin, params, path):
        return xi  # dummy: xi = 0

    def dev_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        eps = small_strain(kin)
        return 2.0 * mu * dev3(eps)

    def hydro_cauchy(self, xi, kin, params):
        E, nu, cte, dT = params[0], params[1], params[2], params[3]
        kappa = compute_kappa(E, nu)
        eps = small_strain(kin)
        return kappa * jnp.trace(eps) - cte * dT * E / (1.0 - 2.0 * nu)


class IsotropicElastic(LocalModel):
    """Displacement-formulation isotropic elasticity
    (reference: isotropic_elastic.cpp — cauchy = lambda tr(eps) I + 2 mu eps)."""

    name = "isotropic_elastic"
    param_names = ("E", "nu")
    finite_deformation = False
    uses_path = False

    def nxi(self) -> int:
        return 1

    def init_xi(self) -> np.ndarray:
        return np.zeros(1)

    def needs_local_newton(self) -> bool:
        return False

    def residual(self, xi, xi_prev, kin, params, path):
        return xi

    def cauchy(self, xi, kin, params, p):
        E, nu = params[0], params[1]
        lam = compute_lambda(E, nu)
        mu = compute_mu(E, nu)
        eps = small_strain(kin)
        d = self.dim
        return lam * jnp.trace(eps) * eye(d, xi.dtype) + 2.0 * mu * eps

    def dev_cauchy(self, xi, kin, params):
        return dev3(self.cauchy(xi, kin, params, 0.0))

    def hydro_cauchy(self, xi, kin, params):
        E, nu = params[0], params[1]
        kappa = compute_kappa(E, nu)
        eps = small_strain(kin)
        return kappa * jnp.trace(eps)

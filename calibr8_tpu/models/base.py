"""Local (constitutive) model interface — pure functions over flat state.

Re-design of the reference's LocalResidual<T> class hierarchy
(reference: source/calibr8/src/local_residual.{hpp,cpp}): instead of a
gather/seed/evaluate/scatter object protocol at three AD scalar types,
each material model is a set of pure JAX functions over a flat local
state vector xi.  All derivative seedings (wrt xi, xi_prev, x, params)
that the reference realizes with Sacado FADT/DFADT become jax.jacfwd /
jax.jvp / jax.vjp calls on these same functions; vmap batches them over
integration points.

State packing: sym tensors are stored in Voigt-like order
[xx, yy, xy] (2D) / [xx, yy, zz, xy, xz, yz] (3D), scalars appended —
matching the reference's variable slot layout
(local_residual.hpp:40-53, fields.hpp:13-23).

Branch paths: rate-independent plasticity has an elastic/plastic branch
per integration point per step (reference records these "path" ints for
verification — evaluations.cpp:95-99, local_residual.hpp:130-138).  Here
`residual(..., path)` evaluates the branch selected by the integer path
with jnp.where, so recomputation (adjoint, error estimation) can force
the primal branch exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

ELASTIC = 0
PLASTIC = 1


class Kinematics(NamedTuple):
    """Per-integration-point kinematic inputs to local models.

    grad_u, grad_u_prev : (d, d) displacement gradients at this point.
    Models derive F = I + grad_u, strain, rates, etc. themselves
    (reference caches F, cof F, det F, polar R on the global residual —
    global_residual.hpp:295-305; here they are cheap pure functions).
    """

    grad_u: jnp.ndarray
    grad_u_prev: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.grad_u.shape[-1]

    @property
    def F(self) -> jnp.ndarray:
        return self.grad_u + jnp.eye(self.dim, dtype=self.grad_u.dtype)

    @property
    def F_prev(self) -> jnp.ndarray:
        return self.grad_u_prev + jnp.eye(self.dim, dtype=self.grad_u.dtype)


# ----------------------------------------------------------------------
# small tensor helpers (the minitensor analog, on (d, d) jnp arrays)
# ----------------------------------------------------------------------


def eye(d: int, dtype=jnp.float64) -> jnp.ndarray:
    return jnp.eye(d, dtype=dtype)


def trace(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.trace(a, axis1=-2, axis2=-1)


def dev(a: jnp.ndarray) -> jnp.ndarray:
    d = a.shape[-1]
    return a - (trace(a) / d) * jnp.eye(d, dtype=a.dtype)


def dev3(a: jnp.ndarray) -> jnp.ndarray:
    """Deviator with the 3D trace factor even for 2D tensors — the
    reference's small-strain models always divide the trace by 3
    (e.g. small_J2.cpp dev_cauchy: eps - tr(eps)/3 * I in any dim)."""
    d = a.shape[-1]
    return a - (trace(a) / 3.0) * jnp.eye(d, dtype=a.dtype)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=(-2, -1)))


def safe_norm(a: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Norm guarded for differentiability at 0 (the unselected plastic
    branch may be evaluated at s = 0 under jnp.where)."""
    return jnp.sqrt(jnp.sum(a * a, axis=(-2, -1)) + eps)


def cofactor(F: jnp.ndarray) -> jnp.ndarray:
    """cof(F) = det(F) F^{-T}, computed explicitly like the reference
    (mechanics.cpp:82-101) to avoid inverse()."""
    d = F.shape[-1]
    if d == 2:
        return jnp.stack(
            [
                jnp.stack([F[..., 1, 1], -F[..., 1, 0]], axis=-1),
                jnp.stack([-F[..., 0, 1], F[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
    c = jnp.linalg.det(F)[..., None, None] * jnp.linalg.inv(F).swapaxes(-1, -2)
    return c


def polar_rotation(F: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Rotation factor of the polar decomposition F = R U via Higham's
    scaled Newton iteration R <- (s R + (s R)^{-T}) / 2 (differentiable,
    fixed iteration count; quadratically convergent, and F ~ I + O(strain)
    for the quasi-static steps here).  Replaces minitensor::polar_rotation
    (reference: global_residual.hpp:303)."""

    def body(_, R):
        Rit = jnp.linalg.inv(R).swapaxes(-1, -2)
        # determinant scaling accelerates convergence
        s = jnp.abs(jnp.linalg.det(R)) ** (-1.0 / R.shape[-1])
        s = jnp.where(jnp.isfinite(s), s, 1.0)
        return 0.5 * (s[..., None, None] * R + Rit / s[..., None, None])

    return jax.lax.fori_loop(0, iters, body, F)


# Voigt packing ---------------------------------------------------------


def sym_to_voigt(a: jnp.ndarray, d: int) -> jnp.ndarray:
    if d == 2:
        return jnp.stack([a[..., 0, 0], a[..., 1, 1], a[..., 0, 1]], axis=-1)
    return jnp.stack(
        [
            a[..., 0, 0],
            a[..., 1, 1],
            a[..., 2, 2],
            a[..., 0, 1],
            a[..., 0, 2],
            a[..., 1, 2],
        ],
        axis=-1,
    )


def voigt_to_sym(v: jnp.ndarray, d: int) -> jnp.ndarray:
    if d == 2:
        row0 = jnp.stack([v[..., 0], v[..., 2]], axis=-1)
        row1 = jnp.stack([v[..., 2], v[..., 1]], axis=-1)
        return jnp.stack([row0, row1], axis=-2)
    row0 = jnp.stack([v[..., 0], v[..., 3], v[..., 4]], axis=-1)
    row1 = jnp.stack([v[..., 3], v[..., 1], v[..., 5]], axis=-1)
    row2 = jnp.stack([v[..., 4], v[..., 5], v[..., 2]], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def num_sym_comps(d: int) -> int:
    return 3 if d == 2 else 6


# ----------------------------------------------------------------------
# Model base class
# ----------------------------------------------------------------------


class LocalModel:
    """Base for constitutive models.

    Subclasses define:
      name            registry string (reference: local_residual.cpp:893-935)
      param_names     ordered material parameter names
      finite_deformation  whether the momentum residual uses PK1 = sigma cof(F)
      nxi(dim)        flat local state size
      init_xi(dim)    initial local state (step 0)
      first_guess(xi_prev, kin, params)       Newton initial iterate
      residual(xi, xi_prev, kin, params, path)  branchwise residual C
      pathfn(xi, xi_prev, kin, params)        branch selector at the
                                              current iterate (int path)
      cauchy / dev_cauchy / hydro_cauchy      stress measures
      pressure_scale_factor(params)
    """

    name: str = "base"
    param_names: tuple[str, ...] = ()
    finite_deformation: bool = False
    # models whose local state is 3D tensors even in 2D problems
    # (plane strain/stress variants) override kinematic embedding.
    uses_path: bool = True
    # index of the out-of-plane stretch in xi for finite-deformation
    # plane-stress models (reference: local_residual.hpp:451-452)
    z_stretch_idx: int | None = None
    # local Newton absolute tolerance doubles as the branch-selection
    # tolerance (f >= -tol -> plastic); set from the deck
    abs_tol: float = 1e-12

    def __init__(self, dim: int):
        self.dim = dim

    # -- metadata ------------------------------------------------------
    @property
    def n_params(self) -> int:
        return len(self.param_names)

    def nxi(self) -> int:
        raise NotImplementedError

    def init_xi(self) -> np.ndarray:
        raise NotImplementedError

    # -- pure functions ------------------------------------------------
    def first_guess(self, xi_prev, kin: Kinematics, params):
        return xi_prev

    def residual(self, xi, xi_prev, kin: Kinematics, params, path):
        raise NotImplementedError

    def pathfn(self, xi, xi_prev, kin: Kinematics, params):
        """Integer branch for the current iterate (ELASTIC/PLASTIC)."""
        return jnp.asarray(ELASTIC)

    def needs_local_newton(self) -> bool:
        return True

    def cauchy(self, xi, kin: Kinematics, params, p):
        """Full Cauchy stress; mixed-formulation models use sigma =
        dev_cauchy - p I (reference: e.g. small_J2.cpp cauchy)."""
        d = self.dim
        return self.dev_cauchy(xi, kin, params) - p * jnp.eye(d, dtype=xi.dtype)

    def dev_cauchy(self, xi, kin: Kinematics, params):
        raise NotImplementedError

    def hydro_cauchy(self, xi, kin: Kinematics, params):
        raise NotImplementedError

    def pressure_scale_factor(self, params):
        E, nu = params[0], params[1]
        return compute_kappa(E, nu)


# material parameter helpers (reference: material_params.hpp) ----------


def compute_mu(E, nu):
    return E / (2.0 * (1.0 + nu))


def compute_kappa(E, nu):
    return E / (3.0 * (1.0 - 2.0 * nu))


def compute_lambda(E, nu):
    return E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))

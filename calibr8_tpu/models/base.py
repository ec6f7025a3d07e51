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


def sub_diag(a: jnp.ndarray, s) -> jnp.ndarray:
    """a - s * I built with explicit stacks: `s * jnp.eye(d)` makes
    vmap broadcast an unbatched constant against batched operands,
    which crashes Mosaic layout inference inside Pallas kernels."""
    d = a.shape[-1]
    if d == 2:
        row0 = jnp.stack([a[..., 0, 0] - s, a[..., 0, 1]], axis=-1)
        row1 = jnp.stack([a[..., 1, 0], a[..., 1, 1] - s], axis=-1)
        return jnp.stack([row0, row1], axis=-2)
    row0 = jnp.stack([a[..., 0, 0] - s, a[..., 0, 1], a[..., 0, 2]], axis=-1)
    row1 = jnp.stack([a[..., 1, 0], a[..., 1, 1] - s, a[..., 1, 2]], axis=-1)
    row2 = jnp.stack([a[..., 2, 0], a[..., 2, 1], a[..., 2, 2] - s], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def add_diag(a: jnp.ndarray, s) -> jnp.ndarray:
    return sub_diag(a, -s)


def dev(a: jnp.ndarray) -> jnp.ndarray:
    d = a.shape[-1]
    return sub_diag(a, trace(a) / d)


def dev3(a: jnp.ndarray) -> jnp.ndarray:
    """Deviator with the 3D trace factor even for 2D tensors — the
    reference's small-strain models always divide the trace by 3
    (e.g. small_J2.cpp dev_cauchy: eps - tr(eps)/3 * I in any dim)."""
    return sub_diag(a, trace(a) / 3.0)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=(-2, -1)))


def safe_norm(a: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Norm guarded for differentiability at 0 (the unselected plastic
    branch may be evaluated at s = 0 under jnp.where)."""
    return jnp.sqrt(jnp.sum(a * a, axis=(-2, -1)) + eps)


def det_small(F: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 2x2/3x3 determinant (jnp.linalg.det lowers to LU,
    which Pallas/Mosaic cannot lower and which is slow per element)."""
    d = F.shape[-1]
    if d == 2:
        return F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]
    return (
        F[..., 0, 0] * (F[..., 1, 1] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 1])
        - F[..., 0, 1] * (F[..., 1, 0] * F[..., 2, 2] - F[..., 1, 2] * F[..., 2, 0])
        + F[..., 0, 2] * (F[..., 1, 0] * F[..., 2, 1] - F[..., 1, 1] * F[..., 2, 0])
    )


def inv_small(F: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 2x2/3x3 inverse via the adjugate."""
    d = F.shape[-1]
    det = det_small(F)
    if d == 2:
        row0 = jnp.stack([F[..., 1, 1], -F[..., 0, 1]], axis=-1)
        row1 = jnp.stack([-F[..., 1, 0], F[..., 0, 0]], axis=-1)
        adj = jnp.stack([row0, row1], axis=-2)
        return adj / det[..., None, None]
    c = cofactor3(F)
    return c.swapaxes(-1, -2) / det[..., None, None]


def mm_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Tiny (..., d, d) matmul as broadcast multiply+sum — Mosaic
    (Pallas TPU) cannot lower the trailing-batch dot_generals that
    vmap(@, out_axes=-1) produces."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def cofactor3(F: jnp.ndarray) -> jnp.ndarray:
    def m(i1, j1, i2, j2):
        return F[..., i1, j1] * F[..., i2, j2] - F[..., i1, j2] * F[..., i2, j1]

    rows = [
        jnp.stack([m(1, 1, 2, 2), -m(1, 0, 2, 2), m(1, 0, 2, 1)], axis=-1),
        jnp.stack([-m(0, 1, 2, 2), m(0, 0, 2, 2), -m(0, 0, 2, 1)], axis=-1),
        jnp.stack([m(0, 1, 1, 2), -m(0, 0, 1, 2), m(0, 0, 1, 1)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


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
    return cofactor3(F)


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
        return sub_diag(self.dev_cauchy(xi, kin, params), p)

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

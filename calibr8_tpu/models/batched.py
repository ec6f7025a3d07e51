"""Hand-batched (trailing element axis) constitutive implementations
for the Pallas assembly fast path.

Why these exist: the generic path vmaps per-element model functions,
and inside Pallas kernels vmap's batching rules emit broadcasts of
unbatched constants (scalar selects, `jnp.eye`, stacked slices) that
crash Mosaic layout inference on TPU.  Everything here is written
directly on full-rank trailing-layout arrays — shapes (..., E) with
the element axis on the TPU lanes — using only ops verified to lower
(elementwise, stacks/concats of full-rank arrays, full-rank selects,
broadcasted_iota masks, gauss_solve_T).

A model that provides a batched twin is eligible for the fused Pallas
assembly kernel (fem/pallas_assembly.py); all other models use the XLA
path.  Numerics are identical: `residual` evaluates the same branchwise
equations as the per-element model (small_strain.py), and the closed
form local solve reproduces the local Newton's converged state exactly
(the J2 radial return with linear isotropic hardening is analytic —
reference small_J2.cpp:186-246 solves it with Newton; same root).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SQRT_23 = float(np.sqrt(2.0 / 3.0))  # python float: a np.float64 scalar is STRONG f64 under x64 and silently promotes f32 model math
SQRT_32 = float(np.sqrt(3.0 / 2.0))


def usum(x, axis: int):
    """Unrolled sum over a small leading/static axis.  Mosaic rejects
    vector.multi_reduction over dimensions whose layout has non-zero
    offsets (which strided slices like xm[:, d] produce), so kernel-path
    code sums tiny axes with explicit adds instead of jnp.sum."""
    n = x.shape[axis]
    idx = [slice(None)] * x.ndim
    idx[axis] = 0
    acc = x[tuple(idx)]
    for k in range(1, n):
        idx[axis] = k
        acc = acc + x[tuple(idx)]
    return acc


# -- trailing-layout small-tensor helpers (all full-rank) ---------------


def t_voigt_to_sym(v, d: int):
    """(nc, E) -> (d, d, E) via full-rank stacks."""
    if d == 2:
        r0 = jnp.stack([v[0], v[2]], axis=0)
        r1 = jnp.stack([v[2], v[1]], axis=0)
        return jnp.stack([r0, r1], axis=0)
    r0 = jnp.stack([v[0], v[3], v[4]], axis=0)
    r1 = jnp.stack([v[3], v[1], v[5]], axis=0)
    r2 = jnp.stack([v[4], v[5], v[2]], axis=0)
    return jnp.stack([r0, r1, r2], axis=0)


def t_sym_to_voigt(a, d: int):
    if d == 2:
        return jnp.stack([a[0, 0], a[1, 1], a[0, 1]], axis=0)
    return jnp.stack(
        [a[0, 0], a[1, 1], a[2, 2], a[0, 1], a[0, 2], a[1, 2]], axis=0
    )


def t_trace(a):
    d = a.shape[0]
    t = a[0, 0]
    for i in range(1, d):
        t = t + a[i, i]
    return t


def t_sub_diag(a, s):
    """a - s*I on (d, d, E) without eye constants."""
    d = a.shape[0]
    rows = []
    for i in range(d):
        cols = [a[i, j] - s if i == j else a[i, j] for j in range(d)]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def t_dev3(a):
    return t_sub_diag(a, t_trace(a) / 3.0)


def t_norm(a, eps=1e-30):
    aa = a * a
    return jnp.sqrt(usum(usum(aa, 0), 0) + eps)


def t_sym(a):
    return 0.5 * (a + a.swapaxes(0, 1))


def t_mm(A, B):
    """(d, d, E) @ (d, d, E) with unrolled rank-1 FMAs."""
    d = A.shape[0]
    rows = []
    for i in range(d):
        cols = []
        for j in range(d):
            acc = A[i, 0] * B[0, j]
            for k in range(1, d):
                acc = acc + A[i, k] * B[k, j]
            cols.append(acc)
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)


def t_transpose(a):
    return a.swapaxes(0, 1)


def t_det(a):
    d = a.shape[0]
    if d == 2:
        return a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    return (
        a[0, 0] * (a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1])
        - a[0, 1] * (a[1, 0] * a[2, 2] - a[1, 2] * a[2, 0])
        + a[0, 2] * (a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0])
    )


def t_cof(a):
    """Cofactor matrix (d, d, E), so inv = cof^T / det."""
    d = a.shape[0]
    if d == 2:
        r0 = jnp.stack([a[1, 1], -a[1, 0]], 0)
        r1 = jnp.stack([-a[0, 1], a[0, 0]], 0)
        return jnp.stack([r0, r1], 0)

    def m(i1, j1, i2, j2):
        return a[i1, j1] * a[i2, j2] - a[i1, j2] * a[i2, j1]

    r0 = jnp.stack([m(1, 1, 2, 2), -m(1, 0, 2, 2), m(1, 0, 2, 1)], 0)
    r1 = jnp.stack([-m(0, 1, 2, 2), m(0, 0, 2, 2), -m(0, 0, 2, 1)], 0)
    r2 = jnp.stack([m(0, 1, 1, 2), -m(0, 0, 1, 2), m(0, 0, 1, 1)], 0)
    return jnp.stack([r0, r1, r2], 0)


def t_inv(a):
    return t_transpose(t_cof(a)) / t_det(a)


def t_add_diag(a, s):
    return t_sub_diag(a, -s)


def t_F(gu):
    """F = I + grad_u without eye constants."""
    one = jnp.ones_like(gu[0, 0])
    return t_add_diag(gu, one)


class BatchedSmallJ2:
    """Trailing-layout twin of SmallJ2 (models/small_strain.py).

    xi packing (7, E): [pstrain voigt (6), alpha]; params (6, E):
    [E, nu, K, Y, cte, delta_T].
    """

    name = "small_J2"

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        self.nc = 3 if self.dim == 2 else 6
        self.nxi = model.nxi()
        self.abs_tol = model.abs_tol

    # shared pieces ------------------------------------------------------
    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _strain(self, kinT):
        return t_sym(kinT.grad_u)

    def dev_cauchy(self, xiT, kinT, parT):
        mu = self._mu(parT)
        ps = t_voigt_to_sym(xiT[: self.nc], self.dim)
        eps = self._strain(kinT)
        return 2.0 * mu * (t_dev3(eps) - ps)

    def _yield_f(self, xiT, kinT, parT):
        mu = self._mu(parT)
        K, Y = parT[2], parT[3]
        alpha = xiT[self.nc]
        s = self.dev_cauchy(xiT, kinT, parT)
        return (t_norm(s) - SQRT_23 * (Y + K * alpha)) / mu

    # the fused-kernel interface ------------------------------------------
    def local_solve(self, xipT, kinT, parT):
        """Closed-form radial return.  Returns (xiT, path (E,) int32,
        failed (E,) int32)."""
        mu = self._mu(parT)
        K, Y = parT[2], parT[3]
        ps_prev = t_voigt_to_sym(xipT[: self.nc], self.dim)
        alpha_prev = xipT[self.nc]
        eps = self._strain(kinT)
        s_tr = 2.0 * mu * (t_dev3(eps) - ps_prev)
        s_mag = t_norm(s_tr)
        f_tr = (s_mag - SQRT_23 * (Y + K * alpha_prev)) / mu
        plastic = f_tr >= -self.abs_tol
        dgam = jnp.maximum(f_tr, 0.0) * mu / (2.0 * mu + (2.0 / 3.0) * K)
        n_tr = s_tr / s_mag
        ps = ps_prev + jnp.where(plastic, dgam, 0.0) * n_tr
        alpha = alpha_prev + jnp.where(plastic, SQRT_23 * dgam, 0.0)
        xiT = jnp.concatenate(
            [t_sym_to_voigt(ps, self.dim), alpha[None, :]], axis=0
        )
        path = plastic.astype(jnp.int32)
        return xiT, path, jnp.zeros_like(path)

    def residual(self, xiT, xipT, kinT, parT, path):
        """Branchwise C in trailing layout; path (E,) int32 forces the
        branch (same equations as SmallJ2.residual)."""
        ps = t_voigt_to_sym(xiT[: self.nc], self.dim)
        alpha = xiT[self.nc]
        ps_old = t_voigt_to_sym(xipT[: self.nc], self.dim)
        alpha_old = xipT[self.nc]
        f = self._yield_f(xiT, kinT, parT)
        s = self.dev_cauchy(xiT, kinT, parT)
        n = s / t_norm(s)
        dgam = SQRT_32 * (alpha - alpha_old)
        plastic = (path == 1).astype(xiT.dtype)
        R_ps = ps - ps_old - (plastic * dgam) * n
        R_a = plastic * f + (1.0 - plastic) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_ps, self.dim), R_a[None, :]], axis=0
        )

    # stress measures for the batched mechanics residual -----------------
    analytic_solve = True

    def cauchy(self, xiT, kinT, parT, pT):
        """sigma = dev_cauchy - p I, (d, d, E)."""
        return t_sub_diag(self.dev_cauchy(xiT, kinT, parT), pT)

    def hydro_cauchy(self, xiT, kinT, parT):
        Em, nu, cte, dT = parT[0], parT[1], parT[4], parT[5]
        kappa = Em / (3.0 * (1.0 - 2.0 * nu))
        thermal = cte * dT * Em / (1.0 - 2.0 * nu)
        return kappa * t_trace(self._strain(kinT)) - thermal

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))

    finite_deformation = False


class BatchedElastic:
    """Trailing-layout twin of Elastic (models/elastic.py, reference
    elastic.cpp): mixed u/p linear elasticity with the reference's
    1-dof dummy local slot (xi = 0, C = xi).  Analytic kernel mode —
    the local 'solve' is the identity zero.

    xi (1, E): [dummy]; params (4, E): [E, nu, cte, delta_T].
    """

    name = "elastic"
    analytic_solve = True
    finite_deformation = False

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        self.nxi = 1
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def local_solve(self, xipT, kinT, parT):
        xiT = jnp.zeros_like(xipT)
        path = jnp.zeros(xipT.shape[-1], jnp.int32)
        return xiT, path, jnp.zeros_like(path)

    def residual(self, xiT, xipT, kinT, parT, path):
        return xiT

    def dev_cauchy(self, xiT, kinT, parT):
        mu = self._mu(parT)
        return 2.0 * mu * t_dev3(t_sym(kinT.grad_u))

    def cauchy(self, xiT, kinT, parT, pT):
        return t_sub_diag(self.dev_cauchy(xiT, kinT, parT), pT)

    def hydro_cauchy(self, xiT, kinT, parT):
        Em, nu, cte, dT = parT[0], parT[1], parT[2], parT[3]
        kappa = Em / (3.0 * (1.0 - 2.0 * nu))
        thermal = cte * dT * Em / (1.0 - 2.0 * nu)
        return kappa * t_trace(t_sym(kinT.grad_u)) - thermal

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))


class BatchedHyperJ2:
    """Trailing-layout twin of HyperJ2 (models/hyper_j2.py, reference
    hyper_J2.cpp): finite-deformation multiplicative J2 on the isochoric
    elastic left Cauchy-Green tensor.  The local system is NOT closed
    form (det(be_bar)=1 constraint + nonlinear hardening), so
    local_solve runs a fixed-iteration batched Newton with convergence
    masking; the fused kernel then condenses dxi/dgu implicitly
    (fem/pallas_assembly.py implicit mode).

    xi packing (8, E): [zeta voigt (6), Ie, alpha]; params (8, E):
    [E, nu, Y, S, D, A, n, K].
    """

    name = "hyper_J2"
    finite_deformation = True
    analytic_solve = False
    newton_iters = 16

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 3
        self.nc = 6
        self.nxi = 8
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _sigma_yield(self, alpha, parT):
        Y, S, D, A, n, K = (parT[i] for i in range(2, 8))
        return (
            Y
            + S * (1.0 - jnp.exp(-D * alpha))
            + A * (alpha + 1e-12) ** n
            + K * alpha
        )

    def _be_bar_trial(self, xipT, kinT):
        zeta_old = t_voigt_to_sym(xipT[: self.nc], 3)
        Ie_old = xipT[self.nc]
        F = t_F(kinT.grad_u)
        F_prev = t_F(kinT.grad_u_prev)
        rF = t_mm(F, t_inv(F_prev))
        # cbrt has no Mosaic lowering; dets are positive here
        rF_bar = rF * jnp.exp(-jnp.log(t_det(rF)) / 3.0)
        return t_mm(t_mm(rF_bar, t_add_diag(zeta_old, Ie_old)), t_transpose(rF_bar))

    def first_guess(self, xipT, kinT, parT):
        be_tr = self._be_bar_trial(xipT, kinT)
        zeta = t_dev3(be_tr)
        Ie = t_trace(be_tr) / 3.0
        return jnp.concatenate(
            [t_sym_to_voigt(zeta, 3), Ie[None, :], xipT[self.nc + 1][None, :]],
            axis=0,
        )

    def pathfn(self, xiT, xipT, kinT, parT):
        mu = self._mu(parT)
        zeta = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc + 1]
        f = (t_norm(mu * zeta) - SQRT_23 * self._sigma_yield(alpha, parT)) / mu
        return (f >= -self.abs_tol).astype(jnp.int32)

    def residual(self, xiT, xipT, kinT, parT, path):
        """Branchwise C, trailing layout (hyper_J2.cpp evaluate)."""
        mu = self._mu(parT)
        zeta = t_voigt_to_sym(xiT[: self.nc], 3)
        Ie = xiT[self.nc]
        alpha = xiT[self.nc + 1]
        alpha_old = xipT[self.nc + 1]
        be_tr = self._be_bar_trial(xipT, kinT)

        s = mu * zeta
        s_mag = t_norm(s)
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, parT)) / mu
        n = s / s_mag
        dgam = SQRT_32 * (alpha - alpha_old)

        dev_tr = t_dev3(be_tr)
        R_z_p = zeta - dev_tr + (2.0 * dgam * Ie) * n
        R_Ie_p = t_det(t_add_diag(zeta, Ie)) - 1.0
        R_a_p = f

        R_z_e = zeta - dev_tr
        R_Ie_e = Ie - t_trace(be_tr) / 3.0
        R_a_e = alpha - alpha_old

        w = (path == 1).astype(xiT.dtype)
        R_z = w * R_z_p + (1.0 - w) * R_z_e
        R_Ie = w * R_Ie_p + (1.0 - w) * R_Ie_e
        R_a = w * R_a_p + (1.0 - w) * R_a_e
        return jnp.concatenate(
            [t_sym_to_voigt(R_z, 3), R_Ie[None, :], R_a[None, :]], axis=0
        )

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)

    # stress measures ----------------------------------------------------
    def dev_cauchy(self, xiT, kinT, parT):
        mu = self._mu(parT)
        zeta = t_voigt_to_sym(xiT[: self.nc], 3)
        J = t_det(t_F(kinT.grad_u))
        return (mu / J) * zeta

    def cauchy(self, xiT, kinT, parT, pT):
        return t_sub_diag(self.dev_cauchy(xiT, kinT, parT), pT)

    def hydro_cauchy(self, xiT, kinT, parT):
        Em, nu = parT[0], parT[1]
        kappa = Em / (3.0 * (1.0 - 2.0 * nu))
        J = t_det(t_F(kinT.grad_u))
        return 0.5 * kappa * (J - 1.0 / J)

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))


def t_hill_from_ratios(R00, R11, R22, R01, R02, R12):
    F = 0.5 * (R11**-2 + R22**-2 - R00**-2)
    G = 0.5 * (R22**-2 + R00**-2 - R11**-2)
    H = 0.5 * (R00**-2 + R11**-2 - R22**-2)
    L = 1.5 * R12**-2
    M = 1.5 * R02**-2
    N = 1.5 * R01**-2
    return F, G, H, L, M, N


def t_hill_params(parT, idx):
    """(F, G, H, L, M, N) from the six R ratios at parT[idx:idx+6]."""
    return t_hill_from_ratios(*(parT[idx + k] for k in range(6)))


def t_hill_params_2d(parT, idx):
    """Plane variants carry 4 ratios (R00, R11, R22, R01); R02 = R12 = 1
    (small_hill_plane_*.cpp, hypo_hill_plane_*.cpp)."""
    R00, R11, R22, R01 = (parT[idx + k] for k in range(4))
    one = jnp.ones_like(R00)
    return t_hill_from_ratios(R00, R11, R22, R01, one, one)


def t_hill_value(s, hp, eps=1e-30):
    F, G, H, L, M, N = hp
    v2 = (
        F * (s[1, 1] - s[2, 2]) ** 2
        + G * (s[2, 2] - s[0, 0]) ** 2
        + H * (s[0, 0] - s[1, 1]) ** 2
        + 2.0 * (L * s[1, 2] ** 2 + M * s[0, 2] ** 2 + N * s[0, 1] ** 2)
    )
    return jnp.sqrt(v2 + eps)


def t_hill_normal(s, hp, hval, eps=1e-30):
    F, G, H, L, M, N = hp
    n00 = (G + H) * s[0, 0] - H * s[1, 1] - G * s[2, 2]
    n11 = (F + H) * s[1, 1] - H * s[0, 0] - F * s[2, 2]
    n22 = (G + F) * s[2, 2] - G * s[0, 0] - F * s[1, 1]
    n01 = N * s[0, 1]
    n02 = M * s[0, 2]
    n12 = L * s[1, 2]
    r0 = jnp.stack([n00, n01, n02], 0)
    r1 = jnp.stack([n01, n11, n12], 0)
    r2 = jnp.stack([n02, n12, n22], 0)
    return jnp.stack([r0, r1, r2], 0) / jnp.maximum(hval, eps)


class BatchedSmallHill:
    """Trailing-layout twin of SmallHill (models/small_strain.py,
    reference small_hill.cpp): Hill anisotropic yield on the deviatoric
    stress, Voce hardening, plastic pstrain-zz equation replaced by
    incompressibility.  Implicit kernel mode (no closed-form return for
    anisotropic flow).

    xi (7, E): [pstrain voigt (6), alpha];
    params (11, E): [E, nu, Y, R00, R11, R22, R01, R02, R12, S, D].
    """

    name = "small_hill"
    finite_deformation = False
    analytic_solve = False
    newton_iters = 16

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 3
        self.nc = 6
        self.nxi = 7
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _voce(self, alpha, parT):
        Y, S, D = parT[2], parT[9], parT[10]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def dev_cauchy(self, xiT, kinT, parT):
        mu = self._mu(parT)
        ps = t_voigt_to_sym(xiT[: self.nc], 3)
        return 2.0 * mu * (t_dev3(t_sym(kinT.grad_u)) - ps)

    def cauchy(self, xiT, kinT, parT, pT):
        return t_sub_diag(self.dev_cauchy(xiT, kinT, parT), pT)

    def hydro_cauchy(self, xiT, kinT, parT):
        Em, nu = parT[0], parT[1]
        kappa = Em / (3.0 * (1.0 - 2.0 * nu))
        return kappa * t_trace(t_sym(kinT.grad_u))

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))

    def _f_and_n(self, xiT, kinT, parT):
        mu = self._mu(parT)
        alpha = xiT[self.nc]
        hp = t_hill_params(parT, 3)
        s = self.dev_cauchy(xiT, kinT, parT)
        hval = t_hill_value(s, hp)
        f = (hval - self._voce(alpha, parT)) / mu
        return f, t_hill_normal(s, hp, hval)

    def first_guess(self, xipT, kinT, parT):
        return xipT

    def pathfn(self, xiT, xipT, kinT, parT):
        f, _ = self._f_and_n(xiT, kinT, parT)
        return (f >= -self.abs_tol).astype(jnp.int32)

    def residual(self, xiT, xipT, kinT, parT, path):
        ps = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc]
        ps_old = t_voigt_to_sym(xipT[: self.nc], 3)
        alpha_old = xipT[self.nc]
        f, n = self._f_and_n(xiT, kinT, parT)
        dgam = alpha - alpha_old
        R_p = ps - ps_old - dgam * n
        # plastic zz equation -> incompressibility tr(pstrain) = 0
        # (small_hill.cpp:240)
        Rp00, Rp11 = R_p[0, 0], R_p[1, 1]
        Rp22_p = t_trace(ps)
        R_e = ps - ps_old
        w = (path == 1).astype(xiT.dtype)
        r00 = w * Rp00 + (1.0 - w) * R_e[0, 0]
        r11 = w * Rp11 + (1.0 - w) * R_e[1, 1]
        r22 = w * Rp22_p + (1.0 - w) * R_e[2, 2]
        r01 = w * R_p[0, 1] + (1.0 - w) * R_e[0, 1]
        r02 = w * R_p[0, 2] + (1.0 - w) * R_e[0, 2]
        r12 = w * R_p[1, 2] + (1.0 - w) * R_e[1, 2]
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.stack([r00, r11, r22, r01, r02, r12, R_a], axis=0)

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)


def _implicit_newton(bm, xipT, kinT, parT, rows_io=None):
    """Shared fixed-iteration masked batched Newton for implicit-mode
    twins (Mosaic cannot lower vector-condition while loops).

    Twins exposing `precompute`/`residual_aux` get their xi-independent
    kinematics work (e.g. the hypo family's polar decomposition +
    unrotated rate) hoisted OUT of the Newton body — inside the loop it
    would otherwise be retraced into every iteration AND every
    linearize tangent pass, which blows up the Mosaic compile.

    Twins with `freeze_path = True` (the Hosford/Barlat family,
    reference small_hosford.cpp / hypo_barlat.cpp solve_nonlinear)
    select the branch ONCE at the first-guess state and keep it; with
    `local_line_search = True` the update is damped by the same
    4-halving Armijo backtracking on 1/2||C||^2 the generic per-point
    solver uses (models/newton.py), batched per lane."""
    import jax

    from calibr8_tpu.utils.smallsolve import gauss_solve_T

    nxi = bm.nxi
    xi0 = bm.first_guess(xipT, kinT, parT)
    dtype = xi0.dtype
    E = xi0.shape[-1]
    freeze_path = getattr(bm, "freeze_path", False)
    use_ls = getattr(bm, "local_line_search", freeze_path)
    if rows_io is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (nxi, E), 0)
    else:
        rows = rows_io[:nxi]

    if hasattr(bm, "precompute"):
        aux = bm.precompute(kinT, parT)

        def resid(z, path):
            return bm.residual_aux(z, xipT, aux, parT, path)

    else:

        def resid(z, path):
            return bm.residual(z, xipT, kinT, parT, path)

    path0 = bm.pathfn(xi0, xipT, kinT, parT) if freeze_path else None

    def body(state):
        xi, done, it = state
        path = path0 if freeze_path else bm.pathfn(xi, xipT, kinT, parT)

        def C(z):
            return resid(z, path)

        R, lin = jax.linearize(C, xi)
        rnorm = jnp.sqrt(usum(R * R, 0))
        done = jnp.maximum(done, (rnorm < bm.abs_tol).astype(jnp.int32))
        cols = [lin((rows == k).astype(dtype)) for k in range(nxi)]
        J = jnp.stack(
            [jnp.stack([cols[k][i] for k in range(nxi)], 0) for i in range(nxi)],
            0,
        )
        dxi = gauss_solve_T(J, -R[:, None, :])[:, 0, :]
        fin = jnp.isfinite(dxi).astype(dtype)
        ok = fin[0]
        for kk in range(1, nxi):
            ok = ok * fin[kk]
        if use_ls:
            # batched Armijo backtracking (models/newton.py ls_body):
            # per-lane step alpha halved up to 4 times on the merit
            # 1/2||C||^2; the final alpha is used even when never
            # accepted (matching the generic fori_loop semantics)
            phi0 = 0.5 * rnorm * rnorm
            c1 = 1.0e-4
            alpha = jnp.ones(E, dtype)
            accepted = jnp.zeros(E, jnp.int32)
            for _ in range(4):
                Rt = resid(xi + (alpha * ok) * dxi, path)
                phit = 0.5 * usum(Rt * Rt, 0)
                fint = jnp.isfinite(Rt).astype(jnp.int32)
                allfin = fint[0]
                for kk in range(1, nxi):
                    allfin = allfin * fint[kk]
                good = (
                    (phit <= phi0 * (1.0 - 2.0 * c1 * alpha)).astype(
                        jnp.int32
                    )
                    * allfin
                )
                keep = jnp.maximum(good, accepted).astype(dtype)
                alpha = keep * alpha + (1.0 - keep) * (0.5 * alpha)
                accepted = jnp.maximum(accepted, good)
            dxi = alpha * dxi
        gate = (1 - done).astype(dtype) * ok
        return (xi + gate * dxi, done, it + 1)

    def cond(state):
        _, done, it = state
        # SCALAR while condition: Mosaic lowers these (vector-valued
        # conditions it does not); early exit once every lane converged.
        # `done` is i32 and the reduction is jnp.min — dtype-PRESERVING.
        # Under jax_enable_x64 both jnp.any(x == 0.0) and
        # jnp.sum(..., dtype=int32) sneak an i64/f64 convert into the
        # cond jaxpr, which Mosaic refuses to lower (64-bit scalars).
        return jnp.logical_and(it < bm.newton_iters, jnp.min(done) < 1)

    xi, done, _ = jax.lax.while_loop(
        cond, body, (xi0, jnp.zeros(E, jnp.int32), jnp.asarray(0, jnp.int32))
    )
    path = path0 if freeze_path else bm.pathfn(xi, xipT, kinT, parT)
    Rf = resid(xi, path)
    rnorm = jnp.sqrt(usum(Rf * Rf, 0))
    failed = (rnorm >= jnp.maximum(bm.abs_tol * 10.0, 1e-30)).astype(jnp.int32)
    return xi, path, failed


# -- hypo family (objective unrotated rates) ----------------------------


def t_polar(F, iters: int = 6):
    """Rotation factor of F = R U via Higham's scaled Newton iteration in
    trailing layout (models/base.py:polar_rotation twin).  Quadratic
    convergence: 6 iterations reach roundoff for any |strain| < ~0.5, so
    the result matches the generic path's 12-iteration fixed point; the
    shorter unroll halves the Mosaic compile of kernels that
    differentiate through it.  cbrt and vector-exponent pow have no
    Mosaic lowering -> exp(log()/d)."""
    d = F.shape[0]
    R = F
    for _ in range(iters):
        # inv(R)^T = (cof(R)^T / det)^T = cof(R) / det
        Rit = t_cof(R) / t_det(R)
        s = jnp.exp(-jnp.log(jnp.abs(t_det(R)) + 1e-300) / d)
        s = jnp.where(jnp.isfinite(s), s, 1.0)
        R = 0.5 * (s * R + Rit / s)
    return R


def t_unrotated_rate(kinT):
    """d = R^T sym((F - F_prev) F^{-1}) R (hypo_kinematics.hpp:10-17),
    trailing layout.  Returns (d, R)."""
    F = t_F(kinT.grad_u)
    F_prev = t_F(kinT.grad_u_prev)
    L = t_mm(F - F_prev, t_inv(F))
    D = t_sym(L)
    R = t_polar(F)
    return t_mm(t_mm(t_transpose(R), D), R), R


class BatchedHypoHill:
    """Trailing-layout twin of HypoHill (models/hypo.py, reference
    hypo_hill.cpp — and hypo_J2 via unit ratios): hypoelastic update of
    the unrotated Cauchy stress TC with Hill yield + Voce hardening,
    residual scaled by 1/mu (hypo_hill.cpp:266-268).  Implicit kernel
    mode (the anisotropic return has no closed form); the polar rotation
    is the same fixed-iteration Higham Newton as the generic path.

    xi (7, E): [TC voigt (6), alpha];
    params (11, E): [E, nu, Y, R00, R11, R22, R01, R02, R12, S, D].
    """

    name = "hypo_hill"
    finite_deformation = True
    analytic_solve = False
    newton_iters = 20
    # heavy per-element state (polar intermediates under 16 tangent
    # seeds): a 1024-element block overflows the 16 MB VMEM stack
    block_e = 256

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 3
        self.nc = 6
        self.nxi = 7
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _lam(self, parT):
        E, nu = parT[0], parT[1]
        return E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))

    def _voce(self, alpha, parT):
        Y, S, D = parT[2], parT[9], parT[10]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def _elastic_update(self, TC_old, d, parT):
        lam, mu = self._lam(parT), self._mu(parT)
        return t_add_diag(TC_old + 2.0 * mu * d, lam * t_trace(d))

    def first_guess(self, xipT, kinT, parT):
        TC_old = t_voigt_to_sym(xipT[: self.nc], 3)
        d, _ = t_unrotated_rate(kinT)
        TC = self._elastic_update(TC_old, d, parT)
        return jnp.concatenate(
            [t_sym_to_voigt(TC, 3), xipT[self.nc][None, :]], axis=0
        )

    def _f_and_n(self, xiT, parT):
        mu = self._mu(parT)
        TC = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc]
        hp = t_hill_params(parT, 3)
        hval = t_hill_value(TC, hp)
        f = (hval - self._voce(alpha, parT)) / mu
        return f, t_hill_normal(TC, hp, hval)

    def pathfn(self, xiT, xipT, kinT, parT):
        f, _ = self._f_and_n(xiT, parT)
        return (f >= -self.abs_tol).astype(jnp.int32)

    # the unrotated rate d (polar decomposition + tensor products) is
    # xi-INDEPENDENT: precompute/residual_aux let the batched Newton
    # hoist it out of every iteration and tangent pass (it dominates
    # the Mosaic compile and VMEM pressure otherwise)
    def precompute(self, kinT, parT):
        d, _ = t_unrotated_rate(kinT)
        return d

    def residual_aux(self, xiT, xipT, d, parT, path):
        mu = self._mu(parT)
        TC = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc]
        TC_old = t_voigt_to_sym(xipT[: self.nc], 3)
        alpha_old = xipT[self.nc]
        R_TC = (TC - self._elastic_update(TC_old, d, parT)) / mu
        f, n = self._f_and_n(xiT, parT)
        dgam = alpha - alpha_old
        w = (path == 1).astype(xiT.dtype)
        # plastic: R_TC + (2 mu dgam n)/mu (hypo_hill.cpp residual)
        R_out = R_TC + (w * 2.0 * dgam) * n
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_out, 3), R_a[None, :]], axis=0
        )

    def residual(self, xiT, xipT, kinT, parT, path):
        return self.residual_aux(
            xiT, xipT, self.precompute(kinT, parT), parT, path
        )

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)

    # stress measures (rotated back: RC = R TC R^T) ----------------------
    def _rotated(self, xiT, kinT):
        TC = t_voigt_to_sym(xiT[: self.nc], 3)
        R = t_polar(t_F(kinT.grad_u))
        return t_mm(t_mm(R, TC), t_transpose(R))

    def hydro_cauchy(self, xiT, kinT, parT):
        return t_trace(self._rotated(xiT, kinT)) / 3.0

    def dev_cauchy(self, xiT, kinT, parT):
        RC = self._rotated(xiT, kinT)
        return t_sub_diag(RC, t_trace(RC) / 3.0)

    def cauchy(self, xiT, kinT, parT, pT):
        RC = self._rotated(xiT, kinT)
        return t_sub_diag(RC, t_trace(RC) / 3.0 + pT)

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))


class BatchedSmallHillPlaneStress:
    """Trailing-layout twin of SmallHillPlaneStress
    (models/small_strain.py, reference small_hill_plane_stress.cpp):
    displacement-only plane stress — sigma_zz eliminated in closed form
    via epsilon_zz, Hill yield on the 3D embedding of the full in-plane
    Cauchy stress, Voce hardening.  Implicit kernel mode; used with the
    'mechanics_plane_stress' global residual (the kernel's non-mixed
    plane-stress path, fem/pallas_assembly.py).

    xi (4, E): [pstrain voigt (3), alpha];
    params (9, E): [E, nu, Y, S, D, R00, R11, R22, R01].
    """

    name = "small_hill_plane_stress"
    finite_deformation = False
    analytic_solve = False
    plane_stress = True
    newton_iters = 16

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 2
        self.nc = 3
        self.nxi = 4
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _lam(self, parT):
        E, nu = parT[0], parT[1]
        return E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))

    def _voce(self, alpha, parT):
        Y, S, D = parT[2], parT[3], parT[4]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def cauchy(self, xiT, kinT, parT, pT=None):
        """Full in-plane Cauchy with sigma_zz = 0 eliminated
        (small_hill_plane_stress.cpp cauchy)."""
        lam, mu = self._lam(parT), self._mu(parT)
        ps = t_voigt_to_sym(xiT[: self.nc], 2)
        eps = t_sym(kinT.grad_u)
        eps_zz = -(lam * t_trace(eps) + 2.0 * mu * t_trace(ps)) / (
            lam + 2.0 * mu
        )
        return t_add_diag(
            2.0 * mu * (eps - ps), lam * (t_trace(eps) + eps_zz)
        )

    def _embed3(self, c2):
        z = jnp.zeros_like(c2[0, 0])
        r0 = jnp.stack([c2[0, 0], c2[0, 1], z], 0)
        r1 = jnp.stack([c2[1, 0], c2[1, 1], z], 0)
        r2 = jnp.stack([z, z, z], 0)
        return jnp.stack([r0, r1, r2], 0)

    def _f_and_n2(self, xiT, kinT, parT):
        mu = self._mu(parT)
        alpha = xiT[self.nc]
        s3 = self._embed3(self.cauchy(xiT, kinT, parT))
        hp = t_hill_params_2d(parT, 5)
        hval = t_hill_value(s3, hp)
        f = (hval - self._voce(alpha, parT)) / mu
        n3 = t_hill_normal(s3, hp, hval)
        n0 = jnp.stack([n3[0, 0], n3[0, 1]], 0)
        n1 = jnp.stack([n3[1, 0], n3[1, 1]], 0)
        return f, jnp.stack([n0, n1], 0)

    def first_guess(self, xipT, kinT, parT):
        return xipT

    def pathfn(self, xiT, xipT, kinT, parT):
        f, _ = self._f_and_n2(xiT, kinT, parT)
        return (f >= -self.abs_tol).astype(jnp.int32)

    def residual(self, xiT, xipT, kinT, parT, path):
        ps = t_voigt_to_sym(xiT[: self.nc], 2)
        alpha = xiT[self.nc]
        ps_old = t_voigt_to_sym(xipT[: self.nc], 2)
        alpha_old = xipT[self.nc]
        f, n = self._f_and_n2(xiT, kinT, parT)
        dgam = alpha - alpha_old
        w = (path == 1).astype(xiT.dtype)
        R_p = ps - ps_old - (w * dgam) * n
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_p, 2), R_a[None, :]], axis=0
        )

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)

    # (non-mixed global residual: hydro/psf never called)
    def hydro_cauchy(self, xiT, kinT, parT):
        return t_trace(self._embed3(self.cauchy(xiT, kinT, parT))) / 3.0

    def pressure_scale_factor(self, parT):
        return jnp.zeros_like(parT[0])


class BatchedSmallHillPlaneStrain:
    """Trailing-layout twin of SmallHillPlaneStrain
    (models/small_strain.py, reference small_hill_plane_strain.cpp):
    2D MIXED plane strain — the in-plane deviator is embedded in 3D with
    s_zz = 2 mu (-tr(eps)/3 + tr(pstrain)), Hill yield with 4 ratios
    (R02 = R12 = 1), Voce hardening.  Implicit kernel mode; exercises
    the fused kernel's 2D mixed u/p path.

    xi (4, E): [pstrain voigt (3), alpha];
    params (9, E): [E, nu, Y, S, D, R00, R11, R22, R01].
    """

    name = "small_hill_plane_strain"
    finite_deformation = False
    analytic_solve = False
    newton_iters = 16

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 2
        self.nc = 3
        self.nxi = 4
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _voce(self, alpha, parT):
        Y, S, D = parT[2], parT[3], parT[4]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def dev_cauchy(self, xiT, kinT, parT):
        mu = self._mu(parT)
        ps = t_voigt_to_sym(xiT[: self.nc], 2)
        return 2.0 * mu * (t_dev3(t_sym(kinT.grad_u)) - ps)

    def cauchy(self, xiT, kinT, parT, pT):
        return t_sub_diag(self.dev_cauchy(xiT, kinT, parT), pT)

    def hydro_cauchy(self, xiT, kinT, parT):
        Em, nu = parT[0], parT[1]
        kappa = Em / (3.0 * (1.0 - 2.0 * nu))
        return kappa * t_trace(t_sym(kinT.grad_u))

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))

    def _s3(self, xiT, kinT, parT):
        """3D embedding with the plane-strain out-of-plane deviator
        s_zz = 2 mu (-tr(eps)/3 + tr(pstrain))
        (small_hill_plane_strain.cpp)."""
        mu = self._mu(parT)
        ps = t_voigt_to_sym(xiT[: self.nc], 2)
        s2 = self.dev_cauchy(xiT, kinT, parT)
        s_zz = 2.0 * mu * (
            -t_trace(t_sym(kinT.grad_u)) / 3.0 + t_trace(ps)
        )
        z = jnp.zeros_like(s_zz)
        r0 = jnp.stack([s2[0, 0], s2[0, 1], z], 0)
        r1 = jnp.stack([s2[1, 0], s2[1, 1], z], 0)
        r2 = jnp.stack([z, z, s_zz], 0)
        return jnp.stack([r0, r1, r2], 0)

    def _f_and_n2(self, xiT, kinT, parT):
        mu = self._mu(parT)
        alpha = xiT[self.nc]
        s3 = self._s3(xiT, kinT, parT)
        hp = t_hill_params_2d(parT, 5)
        hval = t_hill_value(s3, hp)
        f = (hval - self._voce(alpha, parT)) / mu
        n3 = t_hill_normal(s3, hp, hval)
        n0 = jnp.stack([n3[0, 0], n3[0, 1]], 0)
        n1 = jnp.stack([n3[1, 0], n3[1, 1]], 0)
        return f, jnp.stack([n0, n1], 0)

    def first_guess(self, xipT, kinT, parT):
        return xipT

    def pathfn(self, xiT, xipT, kinT, parT):
        f, _ = self._f_and_n2(xiT, kinT, parT)
        return (f >= -self.abs_tol).astype(jnp.int32)

    def residual(self, xiT, xipT, kinT, parT, path):
        ps = t_voigt_to_sym(xiT[: self.nc], 2)
        alpha = xiT[self.nc]
        ps_old = t_voigt_to_sym(xipT[: self.nc], 2)
        alpha_old = xipT[self.nc]
        f, n = self._f_and_n2(xiT, kinT, parT)
        dgam = alpha - alpha_old
        w = (path == 1).astype(xiT.dtype)
        R_p = ps - ps_old - (w * dgam) * n
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_p, 2), R_a[None, :]], axis=0
        )

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)


def t_insert2_zz(a2, zz):
    """(2, 2, E) + (E,) -> (3, 3, E) with zero off-plane couplings
    (yield_fns.insert_2d_into_3d + .at[2, 2].set twin)."""
    z = jnp.zeros_like(zz)
    r0 = jnp.stack([a2[0, 0], a2[0, 1], z], 0)
    r1 = jnp.stack([a2[1, 0], a2[1, 1], z], 0)
    r2 = jnp.stack([z, z, zz], 0)
    return jnp.stack([r0, r1, r2], 0)


class BatchedHypoHillPlaneStrain:
    """Trailing-layout twin of HypoHillPlaneStrain (models/hypo.py,
    reference hypo_hill_plane_strain.cpp): 2D MIXED plane strain with
    the unrotated stress TC plus the out-of-plane TC_zz as extra local
    state; the polar rotation acts in-plane.  Implicit kernel mode.

    xi (5, E): [TC voigt (3), alpha, TC_zz];
    params (9, E): [E, nu, Y, S, D, R00, R11, R22, R01].
    """

    name = "hypo_hill_plane_strain"
    finite_deformation = True
    analytic_solve = False
    newton_iters = 20
    block_e = 256

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 2
        self.nc = 3
        self.nxi = 5
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _lam(self, parT):
        E, nu = parT[0], parT[1]
        return E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))

    def _voce(self, alpha, parT):
        Y, S, D = parT[2], parT[3], parT[4]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def precompute(self, kinT, parT):
        d, _ = t_unrotated_rate(kinT)
        return d

    def first_guess(self, xipT, kinT, parT):
        lam, mu = self._lam(parT), self._mu(parT)
        TC_old = t_voigt_to_sym(xipT[: self.nc], 2)
        d = self.precompute(kinT, parT)
        TC = t_add_diag(TC_old + 2.0 * mu * d, lam * t_trace(d))
        TC_zz = xipT[self.nc + 1] + lam * t_trace(d)
        return jnp.concatenate(
            [t_sym_to_voigt(TC, 2), xipT[self.nc][None, :], TC_zz[None, :]],
            axis=0,
        )

    def _f_and_n2(self, xiT, parT):
        mu = self._mu(parT)
        TC = t_voigt_to_sym(xiT[: self.nc], 2)
        alpha = xiT[self.nc]
        TC_zz = xiT[self.nc + 1]
        TC3 = t_insert2_zz(TC, TC_zz)
        hp = t_hill_params_2d(parT, 5)
        hval = t_hill_value(TC3, hp)
        f = (hval - self._voce(alpha, parT)) / mu
        n3 = t_hill_normal(TC3, hp, hval)
        n0 = jnp.stack([n3[0, 0], n3[0, 1]], 0)
        n1 = jnp.stack([n3[1, 0], n3[1, 1]], 0)
        return f, jnp.stack([n0, n1], 0)

    def pathfn(self, xiT, xipT, kinT, parT):
        f, _ = self._f_and_n2(xiT, parT)
        return (f >= -self.abs_tol).astype(jnp.int32)

    def residual_aux(self, xiT, xipT, d, parT, path):
        lam, mu = self._lam(parT), self._mu(parT)
        TC = t_voigt_to_sym(xiT[: self.nc], 2)
        alpha = xiT[self.nc]
        TC_zz = xiT[self.nc + 1]
        TC_old = t_voigt_to_sym(xipT[: self.nc], 2)
        alpha_old = xipT[self.nc]
        TC_zz_old = xipT[self.nc + 1]
        R_TC = t_sub_diag(TC - TC_old - 2.0 * mu * d, lam * t_trace(d))
        R_zz = TC_zz - TC_zz_old - lam * t_trace(d)
        f, n2 = self._f_and_n2(xiT, parT)
        dgam = alpha - alpha_old
        dp2 = dgam * n2
        dp_zz = -t_trace(dp2)
        w = (path == 1).astype(xiT.dtype)
        R_out = R_TC + (w * 2.0 * mu) * dp2
        R_zz_out = R_zz + w * 2.0 * mu * dp_zz
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_out, 2), R_a[None, :], R_zz_out[None, :]],
            axis=0,
        )

    def residual(self, xiT, xipT, kinT, parT, path):
        return self.residual_aux(
            xiT, xipT, self.precompute(kinT, parT), parT, path
        )

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)

    # stress measures (in-plane rotation; hydro includes TC_zz) ----------
    def _rotated(self, xiT, kinT):
        TC = t_voigt_to_sym(xiT[: self.nc], 2)
        R = t_polar(t_F(kinT.grad_u))
        return t_mm(t_mm(R, TC), t_transpose(R))

    def hydro_cauchy(self, xiT, kinT, parT):
        RC = self._rotated(xiT, kinT)
        return (t_trace(RC) + xiT[self.nc + 1]) / 3.0

    def dev_cauchy(self, xiT, kinT, parT):
        RC = self._rotated(xiT, kinT)
        return t_sub_diag(RC, self.hydro_cauchy(xiT, kinT, parT))

    def cauchy(self, xiT, kinT, parT, pT):
        RC = self._rotated(xiT, kinT)
        return t_sub_diag(RC, self.hydro_cauchy(xiT, kinT, parT) + pT)

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))


class BatchedHyperJ2PlaneStrain:
    """Trailing-layout twin of HyperJ2PlaneStrain (models/hyper_j2.py,
    reference hyper_J2_plane_strain.cpp): multiplicative J2 with the
    in-plane isochoric zeta and the plane-strain zz embedding
    zeta_zz = -tr(zeta).  Implicit kernel mode, 2D mixed u/p path.

    xi (5, E): [zeta voigt (3), Ie, alpha];
    params (6, E): [E, nu, K, Y, Y_inf, delta].
    """

    name = "hyper_J2_plane_strain"
    finite_deformation = True
    analytic_solve = False
    newton_iters = 16
    block_e = 256

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 2
        self.nc = 3
        self.nxi = 5
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _sigma_yield(self, alpha, parT):
        K, Y, Y_inf, delta = (parT[i] for i in range(2, 6))
        return Y + K * alpha + (Y_inf - Y) * (1.0 - jnp.exp(-delta * alpha))

    def _be_bar_3d(self, xipT, kinT):
        """(hyper_J2_plane_strain.cpp eval_be_bar_plane_strain)."""
        zeta_old = t_voigt_to_sym(xipT[: self.nc], 2)
        Ie_old = xipT[self.nc]
        F = t_F(kinT.grad_u)
        F_prev = t_F(kinT.grad_u_prev)
        rF = t_mm(F, t_inv(F_prev))
        c = jnp.exp(jnp.log(t_det(rF)) / 3.0)  # cbrt: no Mosaic lowering
        rF_bar = rF / c
        be2 = t_mm(
            t_mm(rF_bar, t_add_diag(zeta_old, Ie_old)), t_transpose(rF_bar)
        )
        zeta_zz = -t_trace(zeta_old)
        be_zz = (zeta_zz + Ie_old) / (c * c)
        return t_insert2_zz(be2, be_zz)

    def first_guess(self, xipT, kinT, parT):
        be3 = self._be_bar_3d(xipT, kinT)
        Ie_tr = t_trace(be3) / 3.0
        z0 = jnp.stack([be3[0, 0] - Ie_tr, be3[0, 1]], 0)
        z1 = jnp.stack([be3[1, 0], be3[1, 1] - Ie_tr], 0)
        zeta_tr = jnp.stack([z0, z1], 0)
        return jnp.concatenate(
            [
                t_sym_to_voigt(zeta_tr, 2),
                Ie_tr[None, :],
                xipT[self.nc + 1][None, :],
            ],
            axis=0,
        )

    def _zeta3(self, xiT):
        zeta = t_voigt_to_sym(xiT[: self.nc], 2)
        return t_insert2_zz(zeta, -t_trace(zeta))

    def pathfn(self, xiT, xipT, kinT, parT):
        mu = self._mu(parT)
        alpha = xiT[self.nc + 1]
        s_mag = t_norm(mu * self._zeta3(xiT))
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, parT)) / mu
        return (f >= -self.abs_tol).astype(jnp.int32)

    def residual(self, xiT, xipT, kinT, parT, path):
        mu = self._mu(parT)
        zeta = t_voigt_to_sym(xiT[: self.nc], 2)
        Ie = xiT[self.nc]
        alpha = xiT[self.nc + 1]
        alpha_old = xipT[self.nc + 1]

        be3_tr = self._be_bar_3d(xipT, kinT)
        Ie_tr = t_trace(be3_tr) / 3.0
        z0 = jnp.stack([be3_tr[0, 0] - Ie_tr, be3_tr[0, 1]], 0)
        z1 = jnp.stack([be3_tr[1, 0], be3_tr[1, 1] - Ie_tr], 0)
        zeta_tr = jnp.stack([z0, z1], 0)

        zeta3 = self._zeta3(xiT)
        s_mag = t_norm(mu * zeta3)
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, parT)) / mu
        n2 = (mu / s_mag) * zeta
        dgam = SQRT_32 * (alpha - alpha_old)

        R_z_p = zeta - zeta_tr + (2.0 * dgam * Ie) * n2
        R_Ie_p = t_det(t_add_diag(zeta3, Ie)) - 1.0
        R_a_p = f

        R_z_e = zeta - zeta_tr
        R_Ie_e = Ie - Ie_tr
        R_a_e = alpha - alpha_old

        w = (path == 1).astype(xiT.dtype)
        R_z = w * R_z_p + (1.0 - w) * R_z_e
        R_Ie = w * R_Ie_p + (1.0 - w) * R_Ie_e
        R_a = w * R_a_p + (1.0 - w) * R_a_e
        return jnp.concatenate(
            [t_sym_to_voigt(R_z, 2), R_Ie[None, :], R_a[None, :]], axis=0
        )

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)

    # stress measures ----------------------------------------------------
    def dev_cauchy(self, xiT, kinT, parT):
        mu = self._mu(parT)
        zeta = t_voigt_to_sym(xiT[: self.nc], 2)
        J = t_det(t_F(kinT.grad_u))
        return (mu / J) * zeta

    def cauchy(self, xiT, kinT, parT, pT):
        return t_sub_diag(self.dev_cauchy(xiT, kinT, parT), pT)

    def hydro_cauchy(self, xiT, kinT, parT):
        Em, nu = parT[0], parT[1]
        kappa = Em / (3.0 * (1.0 - 2.0 * nu))
        J = t_det(t_F(kinT.grad_u))
        return 0.5 * kappa * (J - 1.0 / J)

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))


class BatchedHypoHillPlaneStress(BatchedHypoHillPlaneStrain):
    """Trailing-layout twin of HypoHillPlaneStress (models/hypo.py,
    reference hypo_hill_plane_stress.cpp): displacement plane stress
    with a material-orientation rotation Q in the rate and the rotated
    stress, and the out-of-plane stretch lambda_z evolving as
    lambda_z = lambda_z_old / (1 - (d_zz + corr)).

    xi (5, E): [TC voigt (3), alpha, lambda_z];
    params (13, E): [E, nu, Y, S, D, R00, R11, R22, R01, Q00, Q01,
    Q10, Q11].
    """

    name = "hypo_hill_plane_stress"
    plane_stress = True
    z_stretch_idx = 4
    newton_iters = 20
    block_e = 256

    def _Q(self, parT):
        r0 = jnp.stack([parT[9], parT[10]], 0)
        r1 = jnp.stack([parT[11], parT[12]], 0)
        return jnp.stack([r0, r1], 0)

    def precompute(self, kinT, parT):
        dQ, _ = t_unrotated_rate(kinT)
        Q = self._Q(parT)
        return t_mm(t_mm(t_transpose(Q), dQ), Q)

    def first_guess(self, xipT, kinT, parT):
        lam, mu = self._lam(parT), self._mu(parT)
        TC_old = t_voigt_to_sym(xipT[: self.nc], 2)
        d = self.precompute(kinT, parT)
        d_zz = -lam * t_trace(d) / (lam + 2.0 * mu)
        TC = t_add_diag(
            TC_old + 2.0 * mu * d, lam * (t_trace(d) + d_zz)
        )
        lam_z = xipT[self.nc + 1] / (1.0 - d_zz)
        return jnp.concatenate(
            [t_sym_to_voigt(TC, 2), xipT[self.nc][None, :], lam_z[None, :]],
            axis=0,
        )

    def _f_and_n2(self, xiT, parT):
        mu = self._mu(parT)
        TC = t_voigt_to_sym(xiT[: self.nc], 2)
        alpha = xiT[self.nc]
        TC3 = t_insert2_zz(TC, jnp.zeros_like(alpha))
        hp = t_hill_params_2d(parT, 5)
        hval = t_hill_value(TC3, hp)
        f = (hval - self._voce(alpha, parT)) / mu
        n3 = t_hill_normal(TC3, hp, hval)
        n0 = jnp.stack([n3[0, 0], n3[0, 1]], 0)
        n1 = jnp.stack([n3[1, 0], n3[1, 1]], 0)
        return f, jnp.stack([n0, n1], 0)

    def residual_aux(self, xiT, xipT, d, parT, path):
        lam, mu = self._lam(parT), self._mu(parT)
        TC = t_voigt_to_sym(xiT[: self.nc], 2)
        alpha = xiT[self.nc]
        lam_z = xiT[self.nc + 1]
        TC_old = t_voigt_to_sym(xipT[: self.nc], 2)
        alpha_old = xipT[self.nc]
        lam_z_old = xipT[self.nc + 1]
        d_zz = -lam * t_trace(d) / (lam + 2.0 * mu)
        R_TC = t_sub_diag(
            TC - TC_old - 2.0 * mu * d, lam * (t_trace(d) + d_zz)
        )
        f, n2 = self._f_and_n2(xiT, parT)
        dgam = alpha - alpha_old
        dp2 = dgam * n2
        dp_zz = -t_trace(dp2)
        corr = 2.0 * mu * dp_zz / (2.0 * mu + lam)
        w = (path == 1).astype(xiT.dtype)
        # plastic in-plane: += 2 mu dp2 - lam corr on the diagonal; the
        # whole row then / mu (hypo_hill_plane_stress.cpp:325)
        R_p = t_sub_diag(R_TC + 2.0 * mu * dp2, lam * corr) / mu
        R_TC_out = w * R_p + (1.0 - w) * R_TC
        R_lam_p = lam_z - lam_z_old / (1.0 - (d_zz + corr))
        R_lam_e = lam_z - lam_z_old / (1.0 - d_zz)
        R_lam = w * R_lam_p + (1.0 - w) * R_lam_e
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_TC_out, 2), R_a[None, :], R_lam[None, :]],
            axis=0,
        )

    # stress measures: RC = R Q TC Q^T R^T
    # (hypo_hill_plane_stress.cpp rotated_cauchy)
    def cauchy(self, xiT, kinT, parT, pT=None):
        TC = t_voigt_to_sym(xiT[: self.nc], 2)
        R = t_polar(t_F(kinT.grad_u))
        Q = self._Q(parT)
        RQ = t_mm(R, Q)
        return t_mm(t_mm(RQ, TC), t_transpose(RQ))

    def hydro_cauchy(self, xiT, kinT, parT):
        return t_trace(self.cauchy(xiT, kinT, parT)) / 3.0

    def dev_cauchy(self, xiT, kinT, parT):
        c = self.cauchy(xiT, kinT, parT)
        return t_sub_diag(c, self.hydro_cauchy(xiT, kinT, parT))

    def pressure_scale_factor(self, parT):
        return jnp.zeros_like(parT[0])


class BatchedHyperJ2PlaneStress:
    """Trailing-layout twin of HyperJ2PlaneStress (models/hyper_j2.py,
    reference hyper_J2_plane_stress.cpp): the out-of-plane stretch
    lambda_z is a local variable enforcing sigma_zz = 0; displacement
    plane-stress kernel path with the z-stretch PK1 pullback.

    xi (6, E): [zeta voigt (3), Ie, lambda_z, alpha];
    params (8, E): [E, nu, Y, S, D, A, n, K].
    """

    name = "hyper_J2_plane_stress"
    finite_deformation = True
    analytic_solve = False
    plane_stress = True
    z_stretch_idx = 4
    newton_iters = 20
    block_e = 256

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 2
        self.nc = 3
        self.nxi = 6
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _kappa(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))

    def _sigma_yield(self, alpha, parT):
        Y, S, D, A, n, K = (parT[i] for i in range(2, 8))
        return (
            Y
            + S * (1.0 - jnp.exp(-D * alpha))
            + A * (alpha + 1e-12) ** n
            + K * alpha
        )

    def _embed_F3(self, F2, zz):
        return t_insert2_zz(F2, zz)

    def _be_bar_3d(self, xipT, kinT, lam_z):
        """(hyper_J2_plane_stress.cpp eval_be_bar_plane_stress) with
        the CURRENT lambda_z in F3 and the previous one in Fp3."""
        zeta_old = t_voigt_to_sym(xipT[: self.nc], 2)
        Ie_old = xipT[self.nc]
        lam_z_old = xipT[self.nc + 1]
        F3 = self._embed_F3(t_F(kinT.grad_u), lam_z)
        Fp3 = self._embed_F3(t_F(kinT.grad_u_prev), lam_z_old)
        rF = t_mm(F3, t_inv(Fp3))
        rF_bar = rF * jnp.exp(-jnp.log(t_det(rF)) / 3.0)
        zeta3 = t_insert2_zz(zeta_old, -t_trace(zeta_old))
        return t_mm(
            t_mm(rF_bar, t_add_diag(zeta3, Ie_old)), t_transpose(rF_bar)
        )

    def first_guess(self, xipT, kinT, parT):
        lam_z_old = xipT[self.nc + 1]
        be3 = self._be_bar_3d(xipT, kinT, lam_z_old)
        Ie_tr = t_trace(be3) / 3.0
        z0 = jnp.stack([be3[0, 0] - Ie_tr, be3[0, 1]], 0)
        z1 = jnp.stack([be3[1, 0], be3[1, 1] - Ie_tr], 0)
        zeta_tr = jnp.stack([z0, z1], 0)
        return jnp.concatenate(
            [
                t_sym_to_voigt(zeta_tr, 2),
                Ie_tr[None, :],
                lam_z_old[None, :],
                xipT[self.nc + 2][None, :],
            ],
            axis=0,
        )

    def _zeta3(self, xiT):
        zeta = t_voigt_to_sym(xiT[: self.nc], 2)
        return t_insert2_zz(zeta, -t_trace(zeta))

    def pathfn(self, xiT, xipT, kinT, parT):
        mu = self._mu(parT)
        alpha = xiT[self.nc + 2]
        s_mag = t_norm(mu * self._zeta3(xiT))
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, parT)) / mu
        return (f >= -self.abs_tol).astype(jnp.int32)

    def residual(self, xiT, xipT, kinT, parT, path):
        mu = self._mu(parT)
        kappa = self._kappa(parT)
        zeta = t_voigt_to_sym(xiT[: self.nc], 2)
        Ie = xiT[self.nc]
        lam_z = xiT[self.nc + 1]
        alpha = xiT[self.nc + 2]
        alpha_old = xipT[self.nc + 2]

        J_2D = t_det(t_F(kinT.grad_u))
        be3_tr = self._be_bar_3d(xipT, kinT, lam_z)
        Ie_tr = t_trace(be3_tr) / 3.0
        z0 = jnp.stack([be3_tr[0, 0] - Ie_tr, be3_tr[0, 1]], 0)
        z1 = jnp.stack([be3_tr[1, 0], be3_tr[1, 1] - Ie_tr], 0)
        zeta_tr = jnp.stack([z0, z1], 0)

        zeta_zz = -t_trace(zeta)
        zeta3 = t_insert2_zz(zeta, zeta_zz)
        s_mag = t_norm(mu * zeta3)
        f = (s_mag - SQRT_23 * self._sigma_yield(alpha, parT)) / mu

        mat_factor = kappa / (2.0 * mu)
        R_lam = lam_z - jnp.sqrt(
            jnp.maximum(
                (1.0 - zeta_zz / mat_factor) / (J_2D * J_2D), 1e-30
            )
        )

        n2 = (mu / s_mag) * zeta
        dgam = SQRT_32 * (alpha - alpha_old)
        R_z_p = zeta - zeta_tr + (2.0 * dgam * Ie) * n2
        R_Ie_p = t_det(t_add_diag(zeta3, Ie)) - 1.0
        R_a_p = f

        R_z_e = zeta - zeta_tr
        R_Ie_e = Ie - Ie_tr
        R_a_e = alpha - alpha_old

        w = (path == 1).astype(xiT.dtype)
        R_z = w * R_z_p + (1.0 - w) * R_z_e
        R_Ie = w * R_Ie_p + (1.0 - w) * R_Ie_e
        R_a = w * R_a_p + (1.0 - w) * R_a_e
        return jnp.concatenate(
            [
                t_sym_to_voigt(R_z, 2),
                R_Ie[None, :],
                R_lam[None, :],
                R_a[None, :],
            ],
            axis=0,
        )

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)

    # stress measures ----------------------------------------------------
    def cauchy(self, xiT, kinT, parT, pT=None):
        mu = self._mu(parT)
        kappa = self._kappa(parT)
        zeta = t_voigt_to_sym(xiT[: self.nc], 2)
        lam_z = xiT[self.nc + 1]
        J = t_det(t_F(kinT.grad_u)) * lam_z
        return t_add_diag((mu / J) * zeta, 0.5 * kappa * (J - 1.0 / J))

    def dev_cauchy(self, xiT, kinT, parT):
        mu = self._mu(parT)
        zeta = t_voigt_to_sym(xiT[: self.nc], 2)
        lam_z = xiT[self.nc + 1]
        J = t_det(t_F(kinT.grad_u)) * lam_z
        return (mu / J) * zeta

    def hydro_cauchy(self, xiT, kinT, parT):
        kappa = self._kappa(parT)
        lam_z = xiT[self.nc + 1]
        J = t_det(t_F(kinT.grad_u)) * lam_z
        return 0.5 * kappa * (J - 1.0 / J)

    def pressure_scale_factor(self, parT):
        return jnp.zeros_like(parT[0])


# -- eigensolver yield surfaces (Hosford / Barlat) ----------------------
#
# Trailing-layout twins of models/yield_fns.py: the closed-form
# trigonometric symmetric 3x3 eigendecomposition (eig_spd_cos analog)
# with the argmax column pick replaced by branchless pairwise selects
# (Mosaic has no argmax/dynamic-index lowering), and every
# vector-exponent pow written as exp(e * log|x|) (no Mosaic pow
# lowering for non-scalar exponents).


def t_outer(v):
    """(3, E) -> v v^T (3, 3, E)."""
    rows = []
    for i in range(3):
        rows.append(jnp.stack([v[i] * v[j] for j in range(3)], 0))
    return jnp.stack(rows, 0)


def t_powa(x, e, tiny=1e-300):
    """|x|^e with a per-lane exponent (Mosaic-safe exp/log form)."""
    return jnp.exp(e * jnp.log(jnp.abs(x) + tiny))


def t_acos(x):
    """Branchless polynomial arccos (Mosaic has NO inverse-trig
    lowering: acos/asin/atan/atan2 all fail in the TC kernel type —
    probed on the real chip, scripts/probe_mosaic_trig.py).

    Abramowitz & Stegun 4.4.45: arccos(t) = sqrt(1-t) * P7(t) on
    [0, 1] with |err| <= 2e-8 (below f32 rounding; the twins are
    f32-only on TPU), reflected to [-1, 0] via arccos(x) = pi -
    arccos(-x) with an arithmetic mask instead of a branch, then two
    Newton corrections on cos(a) = x (sin/cos DO lower) so the f64
    interpret-mode parity tests see near-machine accuracy too."""
    t = jnp.abs(x)
    p = -0.0012624911
    for c in (
        0.0066700901,
        -0.0170881256,
        0.0308918810,
        -0.0501743046,
        0.0889789874,
        -0.2145988016,
        1.5707963050,
    ):
        p = p * t + c
    ac = jnp.sqrt(jnp.maximum(1.0 - t, 0.0)) * p
    neg = (x < 0.0).astype(x.dtype)
    ac = neg * (jnp.pi - ac) + (1.0 - neg) * ac
    for _ in range(2):
        ac = ac + (jnp.cos(ac) - x) / jnp.maximum(jnp.sin(ac), 1e-30)
    return ac


def t_eig_sym33(A, eps=1e-12):
    """Eigenvalues (descending) + eigenvectors of symmetric (3, 3, E).

    Twin of yield_fns.eig_sym33 — identical guards so the two paths
    agree to rounding on any state (including the zero-stress
    unselected branch evaluated under jnp.where)."""
    q = t_trace(A) / 3.0
    B = t_sub_diag(A, q)
    p2 = usum(usum(B * B, 0), 0) / 6.0
    p = jnp.sqrt(p2 + eps * eps)
    Bn = B / p
    r = jnp.clip(t_det(Bn) / 2.0, -1.0 + 1e-14, 1.0 - 1e-14)
    phi = t_acos(r) / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi)
    lam2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam1 = 3.0 * q - lam0 - lam2

    def vec(lam_j, lam_k):
        M = t_mm(t_sub_diag(A, lam_j), t_sub_diag(A, lam_k))
        cols = [jnp.stack([M[0, m], M[1, m], M[2, m]], 0) for m in range(3)]
        norms = [usum(cols[m] * cols[m], 0) for m in range(3)]
        # branchless first-max over the three columns (argmax analog:
        # strict > keeps the earlier column on ties)
        pick1 = (norms[1] > norms[0]).astype(A.dtype)
        va = pick1 * cols[1] + (1.0 - pick1) * cols[0]
        na = pick1 * norms[1] + (1.0 - pick1) * norms[0]
        pick2 = (norms[2] > na).astype(A.dtype)
        v = pick2 * cols[2] + (1.0 - pick2) * va
        nmax = pick2 * norms[2] + (1.0 - pick2) * na
        ok = (jnp.sqrt(nmax) > 1e3 * eps).astype(A.dtype)
        # degenerate fallback e0 (yield_fns.eig_sym33 vec())
        one = jnp.ones_like(v[0])
        zero = jnp.zeros_like(v[0])
        fb = jnp.stack([one, zero, zero], 0)
        v = ok * v + (1.0 - ok) * fb
        return v / jnp.sqrt(usum(v * v, 0) + eps * eps)

    v0 = vec(lam1, lam2)
    v1r = vec(lam2, lam0)
    v1r = v1r - usum(v1r * v0, 0) * v0
    v1 = v1r / jnp.sqrt(usum(v1r * v1r, 0) + eps * eps)
    v2 = jnp.stack(
        [
            v0[1] * v1[2] - v0[2] * v1[1],
            v0[2] * v1[0] - v0[0] * v1[2],
            v0[0] * v1[1] - v0[1] * v1[0],
        ],
        0,
    )
    return (lam0, lam1, lam2), (v0, v1, v2)


def t_hosford_phi_n(sigma, dev_sigma, a, eps=1e-30):
    """Hosford effective stress + flow normal, trailing layout
    (yield_fns.hosford_phi_and_normal twin; reference
    small_hosford.cpp:226-266)."""
    vm = jnp.sqrt(1.5 * usum(usum(dev_sigma * dev_sigma, 0), 0) + eps)
    (l0, l1, l2), (v0, v1, v2) = t_eig_sym33(sigma)
    sl0, sl1, sl2 = l0 / vm, l1 / vm, l2 / vm
    d01 = jnp.clip(sl0 - sl1, -4.0, 4.0)
    d12 = jnp.clip(sl1 - sl2, -4.0, 4.0)
    d20 = jnp.clip(sl2 - sl0, -4.0, 4.0)
    total = 0.5 * (t_powa(d01, a) + t_powa(d12, a) + t_powa(d20, a))
    phi = vm * jnp.exp(jnp.log(jnp.maximum(total, eps)) / a)

    ps = jnp.maximum(phi, eps)
    p01 = jnp.clip(l0 / ps - l1 / ps, -4.0, 4.0)
    p12 = jnp.clip(l1 / ps - l2 / ps, -4.0, 4.0)
    p20 = jnp.clip(l2 / ps - l0 / ps, -4.0, 4.0)
    f01 = p01 * t_powa(p01, a - 2.0)
    f12 = p12 * t_powa(p12, a - 2.0)
    f20 = p20 * t_powa(p20, a - 2.0)
    n = 0.5 * (
        (f01 - f20) * t_outer(v0)
        + (f12 - f01) * t_outer(v1)
        + (f20 - f12) * t_outer(v2)
    )
    return phi, n


def t_flatten_stress(s):
    """(3, 3, E) -> 6 lanes [00, 11, 22, 01, 12, 20]
    (yield_fns.flatten_stress order)."""
    return (s[0, 0], s[1, 1], s[2, 2], s[0, 1], s[1, 2], s[2, 0])


def t_unflatten_stress(v):
    r0 = jnp.stack([v[0], v[3], v[5]], 0)
    r1 = jnp.stack([v[3], v[1], v[4]], 0)
    r2 = jnp.stack([v[5], v[4], v[2]], 0)
    return jnp.stack([r0, r1, r2], 0)


def t_barlat_L_apply(p, s):
    """Apply the Yld2004-18p linear transform (yield_fns.barlat_L) to a
    flattened stress tuple; p = 9 per-lane coefficients."""
    p01, p02, p10, p12, p20, p21, p33, p44, p55 = p
    s0, s1, s2, s3, s4, s5 = s
    o0 = ((p01 + p02) * s0 + (-2.0 * p01 + p02) * s1 + (p01 - 2.0 * p02) * s2) / 3.0
    o1 = ((-2.0 * p10 + p12) * s0 + (p10 + p12) * s1 + (p10 - 2.0 * p12) * s2) / 3.0
    o2 = ((-2.0 * p20 + p21) * s0 + (p20 - 2.0 * p21) * s1 + (p20 + p21) * s2) / 3.0
    return (o0, o1, o2, p33 * s3, p44 * s4, p55 * s5)


def t_barlat_phi_n(TC, sp, dp, a, eps=1e-30):
    """Barlat Yld2004-18p effective stress + flow normal, trailing
    layout (yield_fns.barlat_phi_and_normal twin; reference
    yield_functions.hpp:104-330)."""
    dev = t_dev3(TC)
    vm = jnp.sqrt(1.5 * usum(usum(dev * dev, 0), 0) + eps)
    flat = t_flatten_stress(TC)
    sp_t = t_unflatten_stress(t_barlat_L_apply(sp, flat))
    dp_t = t_unflatten_stress(t_barlat_L_apply(dp, flat))
    s_lam, s_V = t_eig_sym33(sp_t)
    d_lam, d_V = t_eig_sym33(dp_t)

    total = None
    for i in range(3):
        for j in range(3):
            dd = jnp.clip(s_lam[i] / vm - d_lam[j] / vm, -8.0, 8.0)
            term = t_powa(dd, a)
            total = term if total is None else total + term
    total = 0.25 * total
    phi = vm * jnp.exp(jnp.log(jnp.maximum(total, eps)) / a)

    ps = jnp.maximum(phi, eps)
    fac = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            dm = jnp.clip(s_lam[i] / ps - d_lam[j] / ps, -8.0, 8.0)
            fac[i][j] = dm * t_powa(dm, a - 2.0)
    sp_normal = None
    dp_normal = None
    for i in range(3):
        smul = 0.25 * (fac[i][0] + fac[i][1] + fac[i][2])
        dmul = -0.25 * (fac[0][i] + fac[1][i] + fac[2][i])
        so = smul * t_outer(s_V[i])
        do = dmul * t_outer(d_V[i])
        sp_normal = so if sp_normal is None else sp_normal + so
        dp_normal = do if dp_normal is None else dp_normal + do
    out = tuple(
        x + y
        for x, y in zip(
            t_barlat_L_apply(sp, t_flatten_stress(sp_normal)),
            t_barlat_L_apply(dp, t_flatten_stress(dp_normal)),
        )
    )
    return phi, t_unflatten_stress(out)


class BatchedSmallHosford:
    """Trailing-layout twin of SmallHosford (models/small_strain.py,
    reference small_hosford.cpp:160-266): 3D Hosford yield on the
    deviatoric stress, combined hardening Y + K a + S (1 - e^{-D a}),
    f scaled by 2 mu.  Implicit kernel mode with the reference's
    freeze-the-branch + local line search solve_nonlinear semantics.

    xi (7, E): [pstrain voigt (6), alpha];
    params (7, E): [E, nu, Y, a, K, S, D].
    """

    name = "small_hosford"
    finite_deformation = False
    analytic_solve = False
    freeze_path = True
    newton_iters = 30
    block_e = 256  # eig under 7 tangent seeds: VMEM-heavy

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        assert self.dim == 3
        self.nc = 6
        self.nxi = 7
        self.abs_tol = model.abs_tol

    def _mu(self, parT):
        return parT[0] / (2.0 * (1.0 + parT[1]))

    def _flow(self, alpha, parT):
        Y, K, S, D = parT[2], parT[4], parT[5], parT[6]
        return Y + K * alpha + S * (1.0 - jnp.exp(-D * alpha))

    def dev_cauchy(self, xiT, kinT, parT):
        mu = self._mu(parT)
        ps = t_voigt_to_sym(xiT[: self.nc], 3)
        return 2.0 * mu * (t_dev3(t_sym(kinT.grad_u)) - ps)

    def cauchy(self, xiT, kinT, parT, pT):
        return t_sub_diag(self.dev_cauchy(xiT, kinT, parT), pT)

    def hydro_cauchy(self, xiT, kinT, parT):
        Em, nu = parT[0], parT[1]
        kappa = Em / (3.0 * (1.0 - 2.0 * nu))
        return kappa * t_trace(t_sym(kinT.grad_u))

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))

    def _f_and_n(self, xiT, kinT, parT):
        mu = self._mu(parT)
        a = parT[3]
        alpha = xiT[self.nc]
        # the Hosford yield is pressure-insensitive through the eigen
        # differences; evaluate on the deviator (small_strain.py
        # cauchy_full NOTE)
        s = self.dev_cauchy(xiT, kinT, parT)
        phi, n = t_hosford_phi_n(s, s, a)
        f = (phi - self._flow(alpha, parT)) / (2.0 * mu)
        return f, n

    def first_guess(self, xipT, kinT, parT):
        return xipT

    def pathfn(self, xiT, xipT, kinT, parT):
        f, _ = self._f_and_n(xiT, kinT, parT)
        return (f >= -self.abs_tol).astype(jnp.int32)

    def residual(self, xiT, xipT, kinT, parT, path):
        ps = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc]
        ps_old = t_voigt_to_sym(xipT[: self.nc], 3)
        alpha_old = xipT[self.nc]
        f, n = self._f_and_n(xiT, kinT, parT)
        dgam = alpha - alpha_old
        w = (path == 1).astype(xiT.dtype)
        R_s = (ps - ps_old) - (w * dgam) * n
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_s, 3), R_a[None, :]], axis=0
        )

    def local_solve(self, xipT, kinT, parT, rows_io=None):
        return _implicit_newton(self, xipT, kinT, parT, rows_io)


class BatchedHypoHosford(BatchedHypoHill):
    """Trailing-layout twin of HypoHosford (models/hypo.py, reference
    hypo_hosford.cpp): Hosford yield on the unrotated stress TC, flow
    Y + S (1 - e^{-D a}), residual scale 2 mu, freeze-the-branch +
    line-search local solve.  Inherits the hypo kinematics
    (precompute/residual_aux hoisting) from the Hill twin.

    xi (7, E): [TC voigt (6), alpha];
    params (7, E): [E, nu, Y, a, K, S, D]   (K unused, as in the
    reference's flow rule).
    """

    name = "hypo_hosford"
    freeze_path = True
    newton_iters = 30
    block_e = 128  # eig + polar intermediates under 7 tangent seeds

    def _flow(self, alpha, parT):
        Y, S, D = parT[2], parT[5], parT[6]
        return Y + S * (1.0 - jnp.exp(-D * alpha))

    def _f_and_n(self, xiT, parT):
        mu = self._mu(parT)
        a = parT[3]
        TC = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc]
        phi, n = t_hosford_phi_n(TC, t_dev3(TC), a)
        f = (phi - self._flow(alpha, parT)) / (2.0 * mu)
        return f, n

    def residual_aux(self, xiT, xipT, d, parT, path):
        mu = self._mu(parT)
        scale = 2.0 * mu
        TC = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc]
        TC_old = t_voigt_to_sym(xipT[: self.nc], 3)
        alpha_old = xipT[self.nc]
        R_TC = (TC - self._elastic_update(TC_old, d, parT)) / scale
        f, n = self._f_and_n(xiT, parT)
        dgam = alpha - alpha_old
        w = (path == 1).astype(xiT.dtype)
        # plastic: R_TC + dgam n (hypo_hosford.cpp residual; the 2 mu
        # flow factor is absorbed by the scale)
        R_out = R_TC + (w * dgam) * n
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_out, 3), R_a[None, :]], axis=0
        )


class BatchedHypoBarlat(BatchedHypoHill):
    """Trailing-layout twin of HypoBarlat (models/hypo.py, reference
    hypo_barlat.cpp — the costliest model in the reference, 617 LoC):
    Barlat Yld2004-18p yield on TC (two linear transforms + two
    eigendecompositions per evaluation), hardening
    Y + K a + S (1 - e^{-D a}), residual scale 2 mu.

    xi (7, E); params (25, E): [E, nu, Y, a, K, S, D, sp_* (9), dp_* (9)].
    """

    name = "hypo_barlat"
    freeze_path = True
    newton_iters = 30
    # two eigs + polar under 7 tangent seeds are VMEM-heavy, but 128
    # is the floor: Mosaic rejects any minor-most block dim that is
    # not a lane multiple (observed "array shape (16, 24576)" BlockSpec
    # error on chip with block_e=64).
    block_e = 128

    def _flow(self, alpha, parT):
        Y, K, S, D = parT[2], parT[4], parT[5], parT[6]
        return Y + K * alpha + S * (1.0 - jnp.exp(-D * alpha))

    def _f_and_n(self, xiT, parT):
        mu = self._mu(parT)
        a = parT[3]
        TC = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc]
        sp = tuple(parT[7 + k] for k in range(9))
        dp = tuple(parT[16 + k] for k in range(9))
        phi, n = t_barlat_phi_n(TC, sp, dp, a)
        f = (phi - self._flow(alpha, parT)) / (2.0 * mu)
        return f, n

    def residual_aux(self, xiT, xipT, d, parT, path):
        mu = self._mu(parT)
        scale = 2.0 * mu
        TC = t_voigt_to_sym(xiT[: self.nc], 3)
        alpha = xiT[self.nc]
        TC_old = t_voigt_to_sym(xipT[: self.nc], 3)
        alpha_old = xipT[self.nc]
        R_TC = (TC - self._elastic_update(TC_old, d, parT)) / scale
        f, n = self._f_and_n(xiT, parT)
        dgam = alpha - alpha_old
        w = (path == 1).astype(xiT.dtype)
        R_out = R_TC + (w * dgam) * n
        R_a = w * f + (1.0 - w) * (alpha - alpha_old)
        return jnp.concatenate(
            [t_sym_to_voigt(R_out, 3), R_a[None, :]], axis=0
        )


class BatchedHybridHyperJ2PlaneStress(BatchedHyperJ2PlaneStress):
    """Trailing-layout twin of HybridHyperJ2PlaneStress
    (models/hybrid.py, reference hybrid_hyper_J2_plane_stress.cpp):
    the finite-deformation plane-stress J2 twin with the hardening
    curve replaced by the embedded feed-forward network,

        sigma_yield(alpha) = Y + out_scale*(NN(in_scale*alpha) - NN(0))

    (hybrid_hyper_J2_plane_stress.cpp:187-194).  The NN weights ride
    in parT rows n_base.. (the same flat packing as models/nn.py FFNN:
    per layer W row-major then b), and the forward pass unrolls per
    unit as lane FMAs + activation — a scalar-chain network (topology
    [1, H, 1]) costs ~3H vector ops per local-Newton residual, all
    Mosaic-lowerable (exp only).  The implicit local solve and its
    kernel-side linearization come from the parent twin unchanged:
    derivatives flow through the traced NN just like the analytic Voce
    branch (the reference needs a separate dynamic-FAD type for this,
    evaluations.cpp:870-880).
    """

    name = "hybrid_hyper_J2_plane_stress"

    def __init__(self, model):
        super().__init__(model)
        self.nn = model.nn
        self.n_base = len(model.base_param_names)
        self.in_scale = model.nn_input_scale
        self.out_scale = model.nn_output_scale

    def _nn_eval(self, x, parT):
        """FFNN forward over lane vectors: x (E,) -> (E,).  Weights
        are parT rows (scalar per element); hidden layers use the
        activation, the output layer is affine (models/nn.py FFNN)."""
        act = self.nn.act
        idx = self.n_base
        h = [x]
        n_layers = len(self.nn.shapes)
        for li, (r, c) in enumerate(self.nn.shapes):
            W = parT[idx : idx + r * c]
            b = parT[idx + r * c : idx + r * c + r]
            idx += r * c + r
            out = []
            for i in range(r):
                acc = W[i * c] * h[0] + b[i]
                for j in range(1, c):
                    acc = acc + W[i * c + j] * h[j]
                out.append(acc if li == n_layers - 1 else act(acc))
            h = out
        return h[0]

    def _sigma_yield(self, alpha, parT):
        Y = parT[2]
        dnn = self._nn_eval(
            self.in_scale * alpha, parT
        ) - self._nn_eval(jnp.zeros_like(alpha), parT)
        return Y + self.out_scale * dnn


class BatchedIsotropicElastic:
    """Trailing-layout twin of IsotropicElastic (models/elastic.py,
    reference isotropic_elastic.cpp): DISPLACEMENT-only isotropic
    elasticity — the full Cauchy stress lambda tr(eps) I + 2 mu eps
    with the reference's 1-dof dummy local slot (xi = 0, C = xi).
    Analytic kernel mode; the Pallas path uses the displacement-only
    momentum rows (no pressure columns).

    xi (1, E): [dummy]; params (2, E): [E, nu].
    """

    name = "isotropic_elastic"
    analytic_solve = True
    finite_deformation = False
    displacement_only = True

    def __init__(self, model):
        self.model = model
        self.dim = model.dim
        self.nxi = 1
        self.abs_tol = model.abs_tol

    def local_solve(self, xipT, kinT, parT):
        xiT = jnp.zeros_like(xipT)
        path = jnp.zeros(xipT.shape[-1], jnp.int32)
        return xiT, path, jnp.zeros_like(path)

    def residual(self, xiT, xipT, kinT, parT, path):
        return xiT

    def cauchy(self, xiT, kinT, parT, pT):
        """Full sigma (pT is ignored — no pressure dof)."""
        Em, nu = parT[0], parT[1]
        lam = Em * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
        mu = Em / (2.0 * (1.0 + nu))
        eps = t_sym(kinT.grad_u)
        return t_add_diag(2.0 * mu * eps, lam * t_trace(eps))

    def dev_cauchy(self, xiT, kinT, parT):
        return t_dev3(self.cauchy(xiT, kinT, parT, None))

    def hydro_cauchy(self, xiT, kinT, parT):
        Em, nu = parT[0], parT[1]
        kappa = Em / (3.0 * (1.0 - 2.0 * nu))
        return kappa * t_trace(t_sym(kinT.grad_u))

    def pressure_scale_factor(self, parT):
        return parT[0] / (3.0 * (1.0 - 2.0 * parT[1]))


BATCHED_MODELS = {
    "elastic": BatchedElastic,
    "isotropic_elastic": BatchedIsotropicElastic,
    "hybrid_hyper_J2_plane_stress": BatchedHybridHyperJ2PlaneStress,
    "small_J2": BatchedSmallJ2,
    "hyper_J2": BatchedHyperJ2,
    "small_hill": BatchedSmallHill,
    "hypo_hill": BatchedHypoHill,
    "small_hill_plane_stress": BatchedSmallHillPlaneStress,
    "small_hill_plane_strain": BatchedSmallHillPlaneStrain,
    "small_hosford": BatchedSmallHosford,
    "hypo_hosford": BatchedHypoHosford,
    "hypo_barlat": BatchedHypoBarlat,
    "hypo_hill_plane_strain": BatchedHypoHillPlaneStrain,
    "hyper_J2_plane_strain": BatchedHyperJ2PlaneStrain,
    "hyper_J2_plane_stress": BatchedHyperJ2PlaneStress,
    "hypo_hill_plane_stress": BatchedHypoHillPlaneStress,
}


def get_batched_model(model):
    cls = BATCHED_MODELS.get(getattr(model, "name", None))
    return cls(model) if cls is not None else None

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

SQRT_23 = np.sqrt(2.0 / 3.0)
SQRT_32 = np.sqrt(3.0 / 2.0)


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
    linearize tangent pass, which blows up the Mosaic compile."""
    import jax

    from calibr8_tpu.utils.smallsolve import gauss_solve_T

    nxi = bm.nxi
    xi0 = bm.first_guess(xipT, kinT, parT)
    dtype = xi0.dtype
    E = xi0.shape[-1]
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

    def body(state):
        xi, done, it = state
        path = bm.pathfn(xi, xipT, kinT, parT)

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
    path = bm.pathfn(xi, xipT, kinT, parT)
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


BATCHED_MODELS = {
    "small_J2": BatchedSmallJ2,
    "hyper_J2": BatchedHyperJ2,
    "small_hill": BatchedSmallHill,
    "hypo_hill": BatchedHypoHill,
    "small_hill_plane_stress": BatchedSmallHillPlaneStress,
    "small_hill_plane_strain": BatchedSmallHillPlaneStrain,
}


def get_batched_model(model):
    cls = BATCHED_MODELS.get(getattr(model, "name", None))
    return cls(model) if cls is not None else None

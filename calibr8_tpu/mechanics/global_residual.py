"""The 'mechanics' global residual: quasi-static balance of linear
momentum, optionally mixed u/p with GLS-type pressure stabilization.

Re-design of the reference Mechanics<T> global residual
(reference: source/calibr8/src/mechanics.cpp):

  * momentum (ip set 0, quadrature order 1):
      R_u[n, i] += sigma(i, j) dN_n/dx_j w dv
    with sigma -> PK1 = sigma cof(F) for finite-deformation models
    (mechanics.cpp:129-144);
  * mixed pressure equation, split over two integration point sets
    exactly as the reference does (mechanics.cpp:41-47):
      ip set 0 (order 1): R_p[n] -= (hydro_cauchy / psf) N_n w dv
                          R_p[n] -= dN_n/dx_i tau_ij dp/dx_j w dv
        with tau = c * h^2 / (2 mu) (GLS stabilization,
        mechanics.cpp:187-213) and the finite-deformation pullback
        tau (cof F)^T (cof F) / det F;
      ip set 1 (order 2): R_p[n] -= (p / psf) N_n w dv.

For P1 simplices all ip-set-0 quantities are single-point (centroid)
evaluations with constant gradients — the whole element residual is a
handful of tiny tensor contractions, vmapped over elements.

Element DOF packing: x_e = [u (npe*d), p (npe)] (mixed) or [u] only.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.fem import basis
from calibr8_tpu.models.base import (
    Kinematics,
    cofactor,
    compute_mu,
    det_small,
    mm_small,
)

PARENT_MEASURE = {2: 0.5, 3: 1.0 / 6.0}


@dataclass(frozen=True)
class MechanicsSpec:
    """Static configuration of the mechanics residual."""

    dim: int
    mixed: bool = True
    stab_multiplier: float = 1.0
    # 'mechanics_plane_stress' (reference: mechanics_plane_stress.cpp):
    # displacement-only, thickness-weighted, PK1 built with the local
    # z-stretch variable for finite-deformation models
    plane_stress: bool = False
    thickness: float = 1.0

    @property
    def npe(self) -> int:
        return self.dim + 1

    @property
    def neq_u(self) -> int:
        return self.dim

    @property
    def ndofs_per_node(self) -> int:
        return self.dim + (1 if self.mixed else 0)

    @property
    def ndofs_elem(self) -> int:
        return self.npe * self.ndofs_per_node

    # Element dof vectors are NODE-INTERLEAVED: x_e.reshape(npe, ndpn)
    # with columns [u_0..u_{d-1}, p].  This layout makes the hot
    # gather/scatter row-based ((n_nodes, ndpn) row gathers are ~5x
    # faster than scalar dof gathers on TPU) — see fem/assembly.py.
    def unpack(self, x_e: jnp.ndarray):
        """Split flat element dofs into (u_e (npe, d), p_e (npe,) or None)."""
        xm = x_e.reshape(self.npe, self.ndofs_per_node)
        u = xm[:, : self.dim]
        p = xm[:, self.dim] if self.mixed else None
        return u, p

    def pack(self, u_e, p_e=None):
        if self.mixed:
            xm = jnp.concatenate(
                [u_e.reshape(self.npe, self.dim), p_e.reshape(self.npe, 1)],
                axis=1,
            )
        else:
            xm = u_e.reshape(self.npe, self.dim)
        return xm.reshape(-1)


def elem_kinematics(spec: MechanicsSpec, x_e, x_prev_e, grad_N) -> Kinematics:
    """grad_u[i, j] = sum_n u[n, i] dN_n/dx_j at the (single) ip-set-0
    point; constant over the element for P1."""
    u, _ = spec.unpack(x_e)
    u_prev, _ = spec.unpack(x_prev_e)
    # multiply+sum (not einsum/@): Mosaic cannot lower trailing-batch
    # dot_generals when this is vmapped with the element axis last
    gu = jnp.sum(u[:, :, None] * grad_N[:, None, :], axis=0)
    gu_prev = jnp.sum(u_prev[:, :, None] * grad_N[:, None, :], axis=0)
    return Kinematics(grad_u=gu, grad_u_prev=gu_prev)


def make_elem_residual(model, spec: MechanicsSpec, tables=None):
    """Build the pure per-element residual function.

    Returns f(x_e, x_prev_e, xi, geom, params) -> R_e (ndofs_elem,)
    where geom = (grad_N (npe, d), detJ scalar, h scalar).

    `tables` optionally supplies the (N0, N1, q1_wts) quadrature arrays
    as traced values — required inside Pallas kernels, which reject
    captured array constants (fem/pallas_assembly.py).
    """
    d = spec.dim
    npe = spec.npe
    meas0 = PARENT_MEASURE[d]
    # ip set 1 tables (pressure linear term, order 2)
    q1_pts, q1_wts = basis.quadrature(d, 2)
    N1 = basis.shape_values(d, q1_pts)  # (npts1, npe)
    # ip set 0 point (centroid): N = 1/npe
    N0 = np.full((npe,), 1.0 / npe)
    if tables is not None:
        N0, N1, q1_wts = tables

    def f(x_e, x_prev_e, xi, geom, params):
        grad_N, detJ, h = geom
        dtype = x_e.dtype
        kin = elem_kinematics(spec, x_e, x_prev_e, grad_N)
        u_e, p_e = spec.unpack(x_e)
        wdv0 = detJ * meas0  # w * dv at the single order-1 point

        if spec.mixed:
            # multiply+sum instead of vector dots: Mosaic (Pallas TPU)
            # cannot lower rank-1 dot_generals
            p_ip = jnp.sum(jnp.asarray(N0).astype(dtype) * p_e)
        else:
            p_ip = jnp.zeros((), dtype)

        sigma = model.cauchy(xi, kin, params, p_ip)
        if spec.plane_stress:
            # PK1 = z_stretch * J * sigma * cof(F)/det(F) = zs*sigma*cofF
            # since J * F^{-T} = cof(F) (mechanics_plane_stress.cpp:66-84)
            if model.finite_deformation:
                zs = xi[model.z_stretch_idx]
                sigma = zs * mm_small(sigma, cofactor(kin.F))
            R_u = (
                jnp.sum(sigma[None, :, :] * grad_N[:, None, :], axis=2)
                * wdv0
                * spec.thickness
            )
            return R_u.reshape(-1)

        if model.finite_deformation:
            sigma = mm_small(sigma, cofactor(kin.F))

        # momentum: R_u[n, i] = sigma[i, j] grad_N[n, j] wdv
        R_u = jnp.sum(sigma[None, :, :] * grad_N[:, None, :], axis=2) * wdv0

        if not spec.mixed:
            return R_u.reshape(-1)

        E, nu = params[0], params[1]
        mu = compute_mu(E, nu)
        psf = model.pressure_scale_factor(params)

        # pressure, ip set 0: constant part + stabilization
        hydro = model.hydro_cauchy(xi, kin, params)
        R_p = -(hydro / psf) * jnp.asarray(N0).astype(dtype) * wdv0

        grad_p = jnp.sum(p_e[:, None] * grad_N, axis=0)  # (d,)
        tau = spec.stab_multiplier * 0.5 * h * h / mu
        # no tau*eye: unbatched-constant broadcasts crash Mosaic
        if model.finite_deformation:
            cof = cofactor(kin.F)
            ctc = mm_small(cof.swapaxes(-1, -2), cof)
            stab_gp = (tau / det_small(kin.F)) * jnp.sum(
                ctc * grad_p[None, :], axis=1
            )
        else:
            stab_gp = tau * grad_p  # (d,)
        R_p = R_p - jnp.sum(grad_N * stab_gp[None, :], axis=1) * wdv0

        # pressure, ip set 1 (order 2): -(p / psf) N_n w dv
        N1j = jnp.asarray(N1).astype(dtype)
        p_q = jnp.sum(N1j * p_e[None, :], axis=1)  # (npts1,)
        w1 = jnp.asarray(q1_wts).astype(dtype) * detJ
        R_p = R_p - jnp.sum(((p_q / psf) * w1)[:, None] * N1j, axis=0)

        return spec.pack(R_u, R_p)

    return f

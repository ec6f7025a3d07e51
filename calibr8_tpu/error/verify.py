"""Adjoint-based a-posteriori error estimation on nested refinements.

Re-design of the reference error/verification drivers
(source/calibr8/src/main_verify.cpp:19-205, main_error.cpp,
evaluations.cpp eval_error_contributions :930-1074 /
eval_linearization_errors :1075-1461):

  1. solve the primal on the coarse space            -> J^H
  2. uniformly refine; prolong the coarse solution
  3. solve the primal on the fine space (recording branch paths),
     with the stabilization length h frozen at the BASE mesh value
     (global_residual.hpp:288, mechanics.cpp:189-195)  -> J^h
  4. solve the fine adjoint about the PROLONGED COARSE state with the
     fine branch paths forced
  5. error estimate (adjoint-weighted residuals at the prolonged
     coarse state):
       eta = sum_steps sum_e [ z_e . R_e + phi_e . C_e ]
  6. exact-verification linearization remainders:
       E_lin_R = sum z . (-R - dR/dx dx - dR/dxi dxi)
       E_lin_C = sum phi . (-C - dC/dx dx - dC/dxi dxi
                            - dC/dx_prev dx_prev - dC/dxi_prev dxi_prev)
     with d* = (fine - prolonged coarse) differences
  7. the nested-space identity (for a linear QoI):
       (eta + E_lin_R + E_lin_C) / (J^h - J^H) = 1   to ~1e-8
     (the reference regression: main_verify.cpp:195-204)

Error localization onto base-mesh elements (for mesh adaptivity) comes
from restricting the per-element contributions through the refinement.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.mechanics.global_residual import elem_kinematics
from calibr8_tpu.mesh.refine import uniform_refine
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg
from calibr8_tpu.solve.primal import Trajectory


@dataclass
class VerifyResult:
    J_H: float
    J_h: float
    eta: float
    eta_R: float
    eta_C: float
    E_lin_R: float
    E_lin_C: float
    elem_error: np.ndarray  # per COARSE element |R+C| localization

    @property
    def E_exact(self) -> float:
        return self.J_h - self.J_H

    @property
    def effectivity(self) -> float:
        return (self.eta + self.E_lin_R + self.E_lin_C) / self.E_exact

    @property
    def eta_bound(self) -> float:
        return float(np.sum(np.abs(self.elem_error)))


def _prolong_traj(ref, coarse_disc, fine_disc, traj_H) -> Trajectory:
    xs, xis = [], []
    d = coarse_disc.spec.dim
    for x, xi in zip(traj_H.x, traj_H.xi):
        u, p = coarse_disc.split(x)
        u_f = ref.prolong_nodal(np.asarray(u))
        if coarse_disc.spec.mixed:
            p_f = ref.prolong_nodal(np.asarray(p))
            x_f = fine_disc.join(
                jnp.asarray(u_f, fine_disc.dtype), jnp.asarray(p_f, fine_disc.dtype)
            )
        else:
            x_f = fine_disc.join(jnp.asarray(u_f, fine_disc.dtype))
        xs.append(x_f)
        # children inherit the parent's integration-point state; note
        # the fine elements may be reordered by elem-set sorting — both
        # meshes here use a single contiguous ordering per set
        xis.append(jnp.asarray(ref.prolong_elemwise(np.asarray(xi)), fine_disc.dtype))
    return Trajectory(x=xs, xi=xis, path=list(traj_H.path), qoi_values=[])


class _ErrorKernels:
    """Vmapped per-element error and linearization evaluations."""

    def __init__(self, assembler):
        self.a = assembler
        self.eval_eta = jax.jit(self._eta_impl)
        self.eval_elin = jax.jit(self._elin_impl)

    def _eta_impl(self, x, x_prev, xi, xi_prev, path, params_all, z, phi):
        a = self.a
        disc = a.disc
        model, spec = a.model, a.spec
        x_e = a.gather(x)
        xp_e = a.gather(x_prev)
        z_e = disc.gather_elem(z)
        pars = a.params_per_elem(params_all)

        def one(x_e_, xp_e_, xi_, xip_, path_, z_e_, phi_, gN, dJ, h, par):
            geom = (gN, dJ, h)
            R_e = a.elem_res(x_e_, xp_e_, xi_, geom, par)
            kin = elem_kinematics(spec, x_e_, xp_e_, gN)
            C_e = model.residual(xi_, xip_, kin, par, path_)
            return jnp.dot(z_e_, R_e), jnp.dot(phi_, C_e)

        eR, eC = jax.vmap(one)(
            x_e, xp_e, xi, xi_prev, path, z_e, phi,
            disc.grad_N, disc.detJ, disc.h, pars,
        )
        return eR, eC

    def _elin_impl(
        self, x, x_prev, xi, xi_prev, path, params_all, z, phi, dx, dx_prev,
        dxi, dxi_prev,
    ):
        a = self.a
        disc = a.disc
        model, spec = a.model, a.spec
        x_e = a.gather(x)
        xp_e = a.gather(x_prev)
        z_e = disc.gather_elem(z)
        dx_e = disc.gather_elem(dx)
        dxp_e = disc.gather_elem(dx_prev)
        pars = a.params_per_elem(params_all)

        def one(x_e_, xp_e_, xi_, xip_, path_, z_e_, phi_, dx_e_, dxp_e_,
                dxi_, dxip_, gN, dJ, h, par):
            geom = (gN, dJ, h)

            def R(xe__, xi__):
                return a.elem_res(xe__, xp_e_, xi__, geom, par)

            def C(xi__, xe__, xpe__, xip__):
                kin = elem_kinematics(spec, xe__, xpe__, gN)
                return model.residual(xi__, xip__, kin, par, path_)

            R0 = R(x_e_, xi_)
            dR_dx = jax.jacfwd(R, 0)(x_e_, xi_)
            dR_dxi = jax.jacfwd(R, 1)(x_e_, xi_)
            C0 = C(xi_, x_e_, xp_e_, xip_)
            dC_dxi = jax.jacfwd(C, 0)(xi_, x_e_, xp_e_, xip_)
            dC_dx = jax.jacfwd(C, 1)(xi_, x_e_, xp_e_, xip_)
            dC_dxprev = jax.jacfwd(C, 2)(xi_, x_e_, xp_e_, xip_)
            dC_dxiprev = jax.jacfwd(C, 3)(xi_, x_e_, xp_e_, xip_)

            ELR = -R0 - dR_dx @ dx_e_ - dR_dxi @ dxi_
            ELC = (
                -C0
                - dC_dx @ dx_e_
                - dC_dxi @ dxi_
                - dC_dxprev @ dxp_e_
                - dC_dxiprev @ dxip_
            )
            return jnp.dot(z_e_, ELR), jnp.dot(phi_, ELC)

        eR, eC = jax.vmap(one)(
            x_e, xp_e, xi, xi_prev, path, z_e, phi, dx_e, dxp_e, dxi, dxi_prev,
            disc.grad_N, disc.detJ, disc.h, pars,
        )
        return jnp.sum(eR), jnp.sum(eC)


def verify(spec, mesh=None, linear_cfg=None) -> VerifyResult:
    """Run the full nested-space verification (the `verify` driver)."""
    linear_cfg = linear_cfg or LinearCfg()

    coarse = Problem(spec, mesh=mesh)
    traj_H = coarse.solve_primal()
    J_H = traj_H.J

    ref = uniform_refine(coarse.mesh)
    fine = Problem(spec, mesh=ref.fine)
    # stabilization h frozen at the BASE mesh value (set_stabilization_h(BASE))
    fine.disc.h = jnp.asarray(
        np.asarray(coarse.disc.h)[ref.elem_parent], fine.disc.dtype
    )

    traj_h = fine.solve_primal()
    J_h = traj_h.J

    traj_p = _prolong_traj(ref, coarse.disc, fine.disc, traj_H)
    # the adjoint and error evaluations force the FINE branch paths
    traj_adj = Trajectory(
        x=traj_p.x, xi=traj_p.xi, path=traj_h.path, qoi_values=[]
    )

    adj = Adjoint(
        fine.assembler, fine.qoi, fine.dbcs, linear_cfg,
        mg_factory=fine.mg_factory,
    )
    _, zs = adj.sweep(traj_adj, fine.params0, fine.time_grid)

    kern = _ErrorKernels(fine.assembler)
    n = fine.time_grid.num_steps
    eta_R = eta_C = E_lin_R = E_lin_C = 0.0
    elem_err = np.zeros(fine.disc.n_elem)
    for step in range(1, n + 1):
        z, phi = zs[step]
        eR, eC = kern.eval_eta(
            traj_adj.x[step],
            traj_adj.x[step - 1],
            traj_adj.xi[step],
            traj_adj.xi[step - 1],
            traj_adj.path[step],
            fine.params0,
            z,
            phi,
        )
        eta_R += float(jnp.sum(eR))
        eta_C += float(jnp.sum(eC))
        elem_err += np.asarray(eR) + np.asarray(eC)

        dx = traj_h.x[step] - traj_adj.x[step]
        dx_prev = traj_h.x[step - 1] - traj_adj.x[step - 1]
        dxi = traj_h.xi[step] - traj_adj.xi[step]
        dxi_prev = traj_h.xi[step - 1] - traj_adj.xi[step - 1]
        elR, elC = kern.eval_elin(
            traj_adj.x[step],
            traj_adj.x[step - 1],
            traj_adj.xi[step],
            traj_adj.xi[step - 1],
            traj_adj.path[step],
            fine.params0,
            z,
            phi,
            dx,
            dx_prev,
            dxi,
            dxi_prev,
        )
        E_lin_R += float(elR)
        E_lin_C += float(elC)

    coarse_err = ref.restrict_elem_sum(elem_err)
    return VerifyResult(
        J_H=J_H,
        J_h=J_h,
        eta=eta_R + eta_C,
        eta_R=eta_R,
        eta_C=eta_C,
        E_lin_R=E_lin_R,
        E_lin_C=E_lin_C,
        elem_error=coarse_err,
    )

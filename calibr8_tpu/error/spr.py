"""SPR-based error estimation: recovered (enhanced) adjoint instead of
a fine-space adjoint solve.

Re-design of the reference spr_error driver
(source/calibr8/src/main_spr_error.cpp, cspr.{hpp,cpp}): solve the
primal AND adjoint on the coarse space only; prolong to a uniform
nested refinement; build the enhanced adjoint z* by superconvergent
patch recovery — cell-centered samples of the coarse adjoint fit with
local polynomial patches and evaluated at the fine nodes
(main_spr_error.cpp:187-207 interpolate_to_cell_center + spr_recovery)
— then estimate

  eta = sum_steps sum_e [ z*_e . R_e(prolonged coarse)
                          + phi*_e . C_e(prolonged coarse) ]

with adjoint Dirichlet rows zeroed on z*.  Much cheaper than the fine
adjoint solve (no fine linear systems) at the cost of estimate quality
(effectivity near, not equal to, 1).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.error.verify import _ErrorKernels, _prolong_traj
from calibr8_tpu.io.mls import mls_smooth
from calibr8_tpu.mesh.refine import uniform_refine
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg
from calibr8_tpu.solve.primal import Trajectory


@dataclass
class SPRResult:
    J_H: float
    eta: float
    elem_error: np.ndarray  # per coarse element


def _recover_nodal(coarse_mesh, fine_coords, nodal_vals, order=2):
    """SPR: cell-center samples -> polynomial patch fit -> fine nodes."""
    centroids = coarse_mesh.coords[coarse_mesh.conn].mean(axis=1)
    cell_vals = np.asarray(nodal_vals)[coarse_mesh.conn].mean(axis=1)
    h = float(np.median(coarse_mesh.element_h()))
    return mls_smooth(centroids, cell_vals, fine_coords, radius=2.5 * h, order=order)


def spr_error_estimate(spec, mesh=None, linear_cfg=None) -> SPRResult:
    linear_cfg = linear_cfg or LinearCfg()

    coarse = Problem(spec, mesh=mesh)
    traj_H = coarse.solve_primal()

    # coarse adjoint about the coarse primal (recorded coarse paths)
    adj = Adjoint(
        coarse.assembler, coarse.qoi, coarse.dbcs, linear_cfg,
        mg_factory=coarse.mg_factory,
    )
    _, zs_coarse = adj.sweep(traj_H, coarse.params0, coarse.time_grid)

    ref = uniform_refine(coarse.mesh)
    fine = Problem(spec, mesh=ref.fine)
    fine.disc.h = jnp.asarray(
        np.asarray(coarse.disc.h)[ref.elem_parent], fine.disc.dtype
    )
    traj_p = _prolong_traj(ref, coarse.disc, fine.disc, traj_H)
    # branch paths: children inherit the coarse element's recorded path
    traj_p = Trajectory(
        x=traj_p.x,
        xi=traj_p.xi,
        path=[
            jnp.asarray(ref.prolong_elemwise(np.asarray(p)), jnp.int32)
            for p in traj_H.path
        ],
        qoi_values=[],
    )

    kern = _ErrorKernels(fine.assembler)
    cd, fd = coarse.disc, fine.disc
    fine_coords = np.asarray(fine.mesh.coords)
    bc_dofs, _ = fine.dbcs.arrays(0.0)
    bc_dofs = np.asarray(bc_dofs)

    eta = 0.0
    elem_err = np.zeros(fd.n_elem)
    for step in range(1, coarse.time_grid.num_steps + 1):
        z, phi = zs_coarse[step]
        u_z, p_z = cd.split(z)
        zu_star = _recover_nodal(coarse.mesh, fine_coords, np.asarray(u_z))
        if cd.spec.mixed:
            zp_star = _recover_nodal(coarse.mesh, fine_coords, np.asarray(p_z))
            z_star = fd.join(
                jnp.asarray(zu_star, fd.dtype), jnp.asarray(zp_star, fd.dtype)
            )
        else:
            z_star = fd.join(jnp.asarray(zu_star, fd.dtype))
        z_star = z_star.at[jnp.asarray(bc_dofs)].set(0.0)
        # local adjoint: children inherit + (cheap) no recovery — the
        # local equations are pointwise so prolongation is exact for
        # the parent's IP value
        phi_star = jnp.asarray(ref.prolong_elemwise(np.asarray(phi)), fd.dtype)

        eR, eC = kern.eval_eta(
            traj_p.x[step],
            traj_p.x[step - 1],
            traj_p.xi[step],
            traj_p.xi[step - 1],
            traj_p.path[step],
            fine.params0,
            z_star,
            phi_star,
        )
        eta += float(jnp.sum(eR) + jnp.sum(eC))
        elem_err += np.asarray(eR) + np.asarray(eC)

    return SPRResult(
        J_H=traj_H.J,
        eta=eta,
        elem_error=ref.restrict_elem_sum(elem_err),
    )

"""Model-form error estimation: the error of using a BASE constitutive
model in place of a FINE one, estimated by a FINE-model adjoint about
the BASE-model primal solution.

Re-design of the reference's two-model drivers
(reference: source/calibr8/src/main_model_form_error.cpp:65-81,
main_model_form_error_verify.cpp, state.hpp:38-39 BASE_MODEL/FINE_MODEL
local slots; the deck supplies both `local residual` and
`fine local residual` sublists).

Verification identity (same mesh, no refinement —
main_model_form_error_verify.cpp:206-210): with z, phi the FINE-model
adjoint linearized about the BASE primal states (FINE branch paths
forced), and Delta = (fine-model primal) - (base-model primal),

  eta   = sum z . R_fine(base states) + phi . C_fine(base states)
  E_lin = the second-order remainders (exact, both states known)
  (eta + E_lin) / (J_fine - J_base) = 1       to ~1e-8
"""

from __future__ import annotations

from dataclasses import dataclass
import copy

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.deck import ProblemSpec
from calibr8_tpu.error.verify import VerifyResult, _ErrorKernels
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg
from calibr8_tpu.solve.primal import Trajectory


def fine_model_spec(spec: ProblemSpec) -> ProblemSpec:
    """Deck with `local residual` replaced by `fine local residual`."""
    data = copy.deepcopy(spec.data)
    fine = data["residuals"].get("fine local residual")
    assert fine is not None, "deck needs a 'fine local residual' sublist"
    data["residuals"]["local residual"] = fine
    return ProblemSpec(data)


def model_form_verify(spec: ProblemSpec, mesh=None, linear_cfg=None) -> VerifyResult:
    linear_cfg = linear_cfg or LinearCfg()

    base = Problem(spec, mesh=mesh)
    traj_base = base.solve_primal()
    J_base = traj_base.J

    fine = Problem(fine_model_spec(spec), mesh=base.mesh)
    assert fine.model.nxi() == base.model.nxi(), (
        "model-form error requires compatible local state layouts"
    )
    traj_fine = fine.solve_primal()
    J_fine = traj_fine.J

    # FINE-model adjoint about the BASE primal with FINE paths forced
    traj_adj = Trajectory(
        x=traj_base.x, xi=traj_base.xi, path=traj_fine.path, qoi_values=[]
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
        args = (
            traj_adj.x[step],
            traj_adj.x[step - 1],
            traj_adj.xi[step],
            traj_adj.xi[step - 1],
            traj_adj.path[step],
            fine.params0,
            z,
            phi,
        )
        eR, eC = kern.eval_eta(*args)
        eta_R += float(jnp.sum(eR))
        eta_C += float(jnp.sum(eC))
        elem_err += np.asarray(eR) + np.asarray(eC)
        elR, elC = kern.eval_elin(
            *args,
            traj_fine.x[step] - traj_adj.x[step],
            traj_fine.x[step - 1] - traj_adj.x[step - 1],
            traj_fine.xi[step] - traj_adj.xi[step],
            traj_fine.xi[step - 1] - traj_adj.xi[step - 1],
        )
        E_lin_R += float(elR)
        E_lin_C += float(elC)

    return VerifyResult(
        J_H=J_base,
        J_h=J_fine,
        eta=eta_R + eta_C,
        eta_R=eta_R,
        eta_C=eta_C,
        E_lin_R=E_lin_R,
        E_lin_C=E_lin_C,
        elem_error=elem_err,
    )


def model_form_error_estimate(spec: ProblemSpec, mesh=None, linear_cfg=None):
    """The non-verify driver (main_model_form_error.cpp): estimate only
    — no fine primal solve; the adjoint is linearized about the base
    primal using the BASE-model branch paths."""
    linear_cfg = linear_cfg or LinearCfg()
    base = Problem(spec, mesh=mesh)
    traj_base = base.solve_primal()

    fine = Problem(fine_model_spec(spec), mesh=base.mesh)
    traj_adj = Trajectory(
        x=traj_base.x, xi=traj_base.xi, path=traj_base.path, qoi_values=[]
    )
    adj = Adjoint(
        fine.assembler, fine.qoi, fine.dbcs, linear_cfg,
        mg_factory=fine.mg_factory,
    )
    _, zs = adj.sweep(traj_adj, fine.params0, fine.time_grid)

    kern = _ErrorKernels(fine.assembler)
    n = fine.time_grid.num_steps
    eta = 0.0
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
        eta += float(jnp.sum(eR) + jnp.sum(eC))
        elem_err += np.asarray(eR) + np.asarray(eC)
    return dict(J_base=traj_base.J, eta=eta, elem_error=elem_err)

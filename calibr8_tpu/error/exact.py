"""TRUTH-discretization exact error drivers.

Re-design of the reference's `exact_error` and `model_form_exact_error`
executables (reference: source/calibr8/src/main_exact_error.cpp:1-492,
main_model_form_exact_error.cpp; assembly in evaluations.cpp
eval_exact_errors:1462-1658): instead of estimating the QoI error with
an adjoint about the (prolonged) BASE state, the fine/TRUTH problem is
actually SOLVED, the adjoint is computed about the TRUTH state, and the
per-element error contributions are localized with those exact adjoint
weights — giving both the exact global error E = J_h - J_H and an
exactly-weighted spatial error field to judge estimator localization
quality against.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.error.model_form import fine_model_spec
from calibr8_tpu.error.verify import _ErrorKernels, _prolong_traj
from calibr8_tpu.mesh.refine import uniform_refine
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg
from calibr8_tpu.solve.primal import Trajectory


@dataclass
class ExactErrorResult:
    J_H: float
    J_h: float
    eta_exact: float  # sum of exactly-weighted element contributions
    elem_error: np.ndarray  # per BASE element (restricted for nested truth)

    @property
    def E_exact(self) -> float:
        return self.J_h - self.J_H

    @property
    def effectivity(self) -> float:
        return self.eta_exact / self.E_exact

    @property
    def eta_bound(self) -> float:
        return float(np.sum(np.abs(self.elem_error)))


def _localize(fine, traj_err, traj_adj_state, zs, n_steps):
    """Per-element adjoint-weighted residual contributions."""
    kern = _ErrorKernels(fine.assembler)
    elem_err = np.zeros(fine.disc.n_elem)
    eta = 0.0
    for step in range(1, n_steps + 1):
        z, phi = zs[step]
        eR, eC = kern.eval_eta(
            traj_err.x[step],
            traj_err.x[step - 1],
            traj_err.xi[step],
            traj_err.xi[step - 1],
            traj_err.path[step],
            fine.params0,
            z,
            phi,
        )
        eta += float(jnp.sum(eR)) + float(jnp.sum(eC))
        elem_err += np.asarray(eR) + np.asarray(eC)
    return eta, elem_err


def exact_error(spec, mesh=None, linear_cfg=None) -> ExactErrorResult:
    """Nested-space TRUTH error (main_exact_error.cpp): solve the
    uniformly-refined problem, adjoint ABOUT THE TRUTH STATE, localize
    the prolonged-base residual with the exact weights."""
    linear_cfg = linear_cfg or LinearCfg()

    coarse = Problem(spec, mesh=mesh)
    traj_H = coarse.solve_primal()
    J_H = traj_H.J

    ref = uniform_refine(coarse.mesh)
    fine = Problem(spec, mesh=ref.fine)
    # stabilization h frozen at the BASE mesh value, as in verify
    fine.disc.h = jnp.asarray(
        np.asarray(coarse.disc.h)[ref.elem_parent], fine.disc.dtype
    )
    traj_h = fine.solve_primal()
    J_h = traj_h.J

    # adjoint about the TRUTH state (exact weights)
    adj = Adjoint(
        fine.assembler, fine.qoi, fine.dbcs, linear_cfg,
        mg_factory=fine.mg_factory,
    )
    _, zs = adj.sweep(traj_h, fine.params0, fine.time_grid)

    # residuals evaluated at the prolonged BASE state with TRUTH paths
    traj_p = _prolong_traj(ref, coarse.disc, fine.disc, traj_H)
    traj_err = Trajectory(
        x=traj_p.x, xi=traj_p.xi, path=traj_h.path, qoi_values=[]
    )
    eta, elem_err = _localize(
        fine, traj_err, traj_h, zs, fine.time_grid.num_steps
    )
    return ExactErrorResult(
        J_H=J_H,
        J_h=J_h,
        eta_exact=eta,
        elem_error=ref.restrict_elem_sum(elem_err),
    )


def model_form_exact_error(spec, mesh=None, linear_cfg=None) -> ExactErrorResult:
    """Model-form TRUTH error (main_model_form_exact_error.cpp): solve
    BOTH constitutive models on the same mesh, FINE-model adjoint about
    the FINE-model state, localize the BASE-state residual."""
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

    adj = Adjoint(
        fine.assembler, fine.qoi, fine.dbcs, linear_cfg,
        mg_factory=fine.mg_factory,
    )
    _, zs = adj.sweep(traj_fine, fine.params0, fine.time_grid)

    traj_err = Trajectory(
        x=traj_base.x,
        xi=traj_base.xi,
        path=traj_fine.path,
        qoi_values=[],
    )
    eta, elem_err = _localize(
        fine, traj_err, traj_fine, zs, fine.time_grid.num_steps
    )
    return ExactErrorResult(
        J_H=J_base, J_h=J_fine, eta_exact=eta, elem_error=elem_err
    )

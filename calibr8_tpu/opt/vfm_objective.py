"""VFM objectives: FD / forward-sensitivity / adjoint gradient modes.

Reference: source/calibr8/src/{fd,forward_sens,adjoint_sens}_vfm_objective.cpp,
main_objective.cpp:357-407.

J(p) = sum_steps 1/2 * obj_scale * dt/T * (thickness * P_int(p) - load)^2
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from calibr8_tpu.opt.objective import ActiveParams
from calibr8_tpu.qoi.calibration import read_load_file
from calibr8_tpu.solve.vfm import VirtualPower


class _VFMBase:
    def __init__(
        self,
        problem,
        vp: VirtualPower,
        active: ActiveParams,
        load_data,
        obj_scale: float = 1.0,
        thickness: float = 1.0,
    ):
        self.problem = problem
        self.vp = vp
        self.active = active
        self.load_data = list(load_data)
        self.obj_scale = obj_scale
        self.thickness = thickness

    def _params_all(self, x_canonical):
        p_active = self.active.from_canonical(np.asarray(x_canonical))
        return self.active.insert(
            self.problem.params0,
            jnp.asarray(p_active, self.problem.disc.dtype),
        )

    def _step_weights(self):
        tg = self.problem.time_grid
        return [
            self.obj_scale * tg.dt(s) / tg.total_time
            for s in range(1, tg.num_steps + 1)
        ]

    def _J_from_powers(self, Ps):
        ws = self._step_weights()
        misms = [
            self.thickness * P - load for P, load in zip(Ps, self.load_data)
        ]
        J = sum(0.5 * w * m * m for w, m in zip(ws, misms))
        return J, misms, ws

    def value(self, x_canonical) -> float:
        Ps, _, _ = self.vp.powers(self._params_all(x_canonical))
        J, _, _ = self._J_from_powers(Ps)
        return float(J)


class FDVFMObjective(_VFMBase):
    """Value only; gradients by optimizer finite differences
    (fd_vfm_objective.hpp:8-23)."""


class FSVFMObjective(_VFMBase):
    """Forward (DFAD-analog) parameter sensitivities
    (forward_sens_vfm_objective.cpp)."""

    def value_and_gradient(self, x_canonical):
        params_all = self._params_all(x_canonical)
        Ps, dPs = self.vp.powers_and_sens(params_all)
        J, misms, ws = self._J_from_powers(Ps)
        grad_all = sum(
            w * m * self.thickness * dP
            for w, m, dP in zip(ws, misms, dPs)
        )
        g_active = self.active.extract_grad(np.asarray(grad_all))
        return float(J), self.active.grad_to_canonical(g_active)

    def gradient(self, x_canonical):
        return self.value_and_gradient(x_canonical)[1]


class AdjointVFMObjective(_VFMBase):
    """Adjoint parameter sensitivities with local history
    (adjoint_sens_vfm_objective.cpp, evaluations.cpp:1975-2145)."""

    def value_and_gradient(self, x_canonical):
        params_all = self._params_all(x_canonical)
        Ps, xis, paths = self.vp.powers(params_all)
        J, misms, ws = self._J_from_powers(Ps)
        cs = [w * m * self.thickness for w, m in zip(ws, misms)]
        grad_all = self.vp.adjoint_gradient(params_all, cs, xis, paths)
        g_active = self.active.extract_grad(np.asarray(grad_all))
        return float(J), self.active.grad_to_canonical(g_active)

    def gradient(self, x_canonical):
        return self.value_and_gradient(x_canonical)[1]


def build_vfm_objective(problem, inverse_params: dict, vf_exprs: dict):
    """Wire a VFM objective from deck sublists (main_objective.cpp:357-407)."""
    from calibr8_tpu.solve.vfm import virtual_field_from_expressions

    vf = virtual_field_from_expressions(problem.disc, vf_exprs)
    vp = VirtualPower(problem, vf)
    active = ActiveParams.from_inverse_spec(
        inverse_params, problem.disc.elem_set_names, problem.model.param_names
    )
    load_data = read_load_file(inverse_params["load input file"])
    kwargs = dict(
        obj_scale=float(inverse_params.get("objective scale factor", 1.0)),
        thickness=float(inverse_params.get("thickness", 1.0)),
    )
    obj_type = inverse_params.get("objective type", "FS_VFM")
    cls = {
        "VFM": FDVFMObjective,
        "FD_VFM": FDVFMObjective,
        "FS_VFM": FSVFMObjective,
        "Adjoint_VFM": AdjointVFMObjective,
    }[obj_type]
    return cls(problem, vp, active, load_data, **kwargs), active

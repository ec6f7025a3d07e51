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
        p_act = self.active.extract(np.asarray(params_all))
        return float(J), self.active.grad_to_canonical(g_active, p_act)

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
        p_act = self.active.extract(np.asarray(params_all))
        return float(J), self.active.grad_to_canonical(g_active, p_act)

    def gradient(self, x_canonical):
        return self.value_and_gradient(x_canonical)[1]


class EUCLIDObjective(_VFMBase):
    """EUCLID multi-virtual-field objective
    (reference: main_objective.cpp:409-509): node-set indicator virtual
    fields with per-field objective/load scale factors,

      J = sum_vf sum_steps 1/2 * obj_scale_vf * dt/T
            * (P_vf - load_scale_vf * load)^2

    gradients by one VFM adjoint backward sweep per virtual field."""

    def __init__(self, problem, vp, active, load_data, node_set_names,
                 vf_components, obj_scale_factors, load_scale_factors):
        super().__init__(problem, vp, active, load_data)
        from calibr8_tpu.solve.vfm import virtual_field_from_node_set

        self.vfs = [
            virtual_field_from_node_set(problem.disc, ns, [comp])
            for ns, comp in zip(node_set_names, vf_components)
        ]
        self.obj_scales = list(obj_scale_factors)
        self.load_scales = list(load_scale_factors)

    def _evaluate(self, x_canonical, want_grad):
        import jax.numpy as jnp

        params_all = self._params_all(x_canonical)
        tg = self.problem.time_grid
        vf_mat = jnp.stack(self.vfs)  # (n_vf, n_dofs)
        Ps, xis, paths = self.vp.powers(params_all, vf=vf_mat)
        Ps = np.asarray(Ps)  # (n_steps, n_vf)
        J = 0.0
        grad_all = jnp.zeros_like(params_all) if want_grad else None
        for v, (vf, oscale, lscale) in enumerate(
            zip(self.vfs, self.obj_scales, self.load_scales)
        ):
            cs = []
            for s in range(1, tg.num_steps + 1):
                w = tg.dt(s) / tg.total_time
                mism = Ps[s - 1, v] - lscale * self.load_data[s - 1]
                c = mism * oscale * w
                J += 0.5 * mism * c
                cs.append(c)
            if want_grad:
                grad_all = grad_all + self.vp.adjoint_gradient(
                    params_all, cs, xis, paths, vf=vf
                )
        if want_grad:
            g = self.active.extract_grad(np.asarray(grad_all))
            p_act = self.active.extract(np.asarray(params_all))
            return float(J), self.active.grad_to_canonical(g, p_act)
        return float(J)

    def value(self, x_canonical):
        return self._evaluate(x_canonical, False)

    def value_and_gradient(self, x_canonical):
        return self._evaluate(x_canonical, True)

    def gradient(self, x_canonical):
        return self._evaluate(x_canonical, True)[1]


class EquilibriumGapObjective:
    """Equilibrium-gap objective (reference: equilibrium_gap.{hpp,cpp}):
    J_step = gap_scale ||R(measured)||^2 + load_scale J_qoi.

    The reference's traction correction and adjoint gradient are
    unimplemented stubs (tbcs.cpp compute_eq_gap_traction,
    equilibrium_gap.cpp:64-80); here the gap term's gradient is provided
    via the forward-sensitivity machinery with the state-dependent
    weight 2 R (d||R||^2/dp = 2 R . dR/dp_total)."""

    def __init__(self, problem, vp, active, gap_scale=1.0):
        self.problem = problem
        self.vp = vp
        self.active = active
        self.gap_scale = gap_scale

    def _params_all(self, x_canonical):
        import jax.numpy as jnp

        p_active = self.active.from_canonical(np.asarray(x_canonical))
        return self.active.insert(
            self.problem.params0,
            jnp.asarray(p_active, self.problem.disc.dtype),
        )

    def value(self, x_canonical):
        params_all = self._params_all(x_canonical)
        _, _, _, Rs = self.vp.powers(params_all, collect_residuals=True)
        return float(
            self.gap_scale * sum(float(jnp.dot(R, R)) for R in Rs)
        )

    def value_and_gradient(self, x_canonical):
        params_all = self._params_all(x_canonical)
        _, xis, paths, Rs = self.vp.powers(params_all, collect_residuals=True)
        J = self.gap_scale * sum(float(jnp.dot(R, R)) for R in Rs)
        grad_all = self._gap_gradient(params_all, Rs, xis, paths)
        g = self.active.extract_grad(np.asarray(grad_all))
        p_act = self.active.extract(np.asarray(params_all))
        return float(J), self.active.grad_to_canonical(g, p_act)

    def _gap_gradient(self, params_all, Rs, xis, paths):
        """d/dp sum_s ||R_s||^2: backward local-history sweep where the
        step-s source weight is w_s = 2 gap_scale R_s."""
        disc = self.problem.disc
        h = jnp.zeros((disc.n_elem, self.vp.assembler.nxi), disc.dtype)
        grad = jnp.zeros_like(params_all)
        tg = self.problem.time_grid
        for step in range(tg.num_steps, 0, -1):
            w = 2.0 * self.gap_scale * Rs[step - 1]
            _, h, g = self.vp._step_adj(
                self.vp._measured[step],
                self.vp._measured[step - 1],
                xis[step],
                xis[step - 1],
                paths[step - 1],
                params_all,
                jnp.asarray(1.0, disc.dtype),
                h,
                w,
            )
            grad = grad + g
        return grad

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

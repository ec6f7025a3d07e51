"""Virtual Fields Method (VFM): virtual-power objectives from measured
full-field data — no global solves.

Reference: source/calibr8/src/virtual_power.cpp, evaluations.cpp
eval_measured_residual(:1750-1974) / eval_vfm_adjoint_gradient(:1975-2145),
{fd,forward_sens,adjoint_sens}_vfm_objective.cpp.

The displacement state at every step IS the measured DIC field; the
constitutive state xi still marches through the local Newton solves
(path-dependent).  With a virtual field w (from deck expressions
f(x, y, z) — virtual_power.cpp:86 — or node-set indicators for EUCLID),

  P_int(step) = w . R(x_meas; xi(p))        (internal virtual power)
  J = sum_steps 1/2 * obj_scale * dt/T * (thickness * P_int - load)^2

Gradients:
  forward sensitivities (FS_VFM): per-step recursion
    dxi/dp = (dC/dxi)^{-1} (-dC/dp - dC/dxi_prev dxi_prev/dp)
    dP/dp  = w . scatter(dR/dxi dxi/dp + dR/dp)
  adjoint (Adjoint_VFM): backward recursion with local history h
    phi = (dC/dxi)^{-T} (-c dR/dxi^T w_e - h),  h <- (dC/dxi_prev)^T phi
    dJ/dp += c w_e^T dR/dp + phi^T dC/dp
  (c = obj_scale * dt/T * mismatch at the step)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.expression import Expression
from calibr8_tpu.mechanics.global_residual import elem_kinematics
from calibr8_tpu.fem.assembly import scatter_residual
from calibr8_tpu.utils.smallsolve import gauss_solve


def virtual_field_from_expressions(disc, exprs: dict) -> jnp.ndarray:
    """Nodal virtual field from w_x / w_y / w_z deck expressions
    (reference: virtual_power.cpp:86, disc.cpp set_virtual_field*)."""
    coords = disc.mesh.coords
    d = disc.spec.dim
    keys = ["w_x", "w_y", "w_z"][:d]
    vals = np.zeros((disc.n_nodes, d))
    x = coords[:, 0]
    y = coords[:, 1]
    z = coords[:, 2] if d > 2 else np.zeros_like(x)
    for i, k in enumerate(keys):
        expr = Expression(exprs[k])
        vals[:, i] = np.broadcast_to(np.asarray(expr(x=x, y=y, z=z)), x.shape)
    out = np.zeros(disc.n_dofs)
    out[: disc.n_dofs_u] = vals.reshape(-1)
    return jnp.asarray(out, disc.dtype)


def virtual_field_from_node_set(disc, node_set: str, components=None) -> jnp.ndarray:
    """EUCLID-style indicator virtual field: 1 on the node set
    (reference: disc.hpp:261-273, main_objective.cpp:409-509)."""
    nodes = np.asarray(disc.mesh.node_sets[node_set])
    d = disc.spec.dim
    comps = components if components is not None else range(d)
    out = np.zeros(disc.n_dofs)
    for c in comps:
        out[disc.u_dof(nodes, c)] = 1.0
    return jnp.asarray(out, disc.dtype)


class VirtualPower:
    """Measured-state virtual-power evaluations for one problem."""

    def __init__(self, problem, vf: jnp.ndarray):
        self.problem = problem
        self.assembler = problem.assembler
        self.disc = problem.disc
        self.vf = vf
        self._measured = self._collect_measured()
        self._step_sens = jax.jit(self._step_sens_impl)
        self._step_adj = jax.jit(self._step_adj_impl)
        self._step_value = jax.jit(self._step_value_impl)

    def _collect_measured(self):
        """Measured displacement trajectories as flat dof vectors
        (p-block zero; VFM uses displacement formulations)."""
        disc = self.disc
        n = self.problem.time_grid.num_steps
        out = []
        for step in range(n + 1):
            meas = disc.mesh.fields.get(f"measured_{step}")
            assert meas is not None, f"measured_{step} field missing"
            x = np.zeros(disc.n_dofs)
            x[: disc.n_dofs_u] = np.asarray(meas).reshape(-1)
            out.append(jnp.asarray(x, disc.dtype))
        return out

    # -- pure step kernels ---------------------------------------------
    def _local_and_blocks(self, x, x_prev, xi_prev, params_all, want):
        """Local solve at the measured state + requested jacfwd blocks."""
        a = self.assembler
        loc = a.local_solve(x, x_prev, xi_prev, params_all)
        disc, model, spec = self.disc, a.model, a.spec
        x_e = a.gather(x)
        xp_e = a.gather(x_prev)
        pars = a.params_per_elem(params_all)

        def one(x_e_, xp_e_, xi_, xip_, path_, gN, dJ, h, par):
            geom = (gN, dJ, h)

            def C(xi__, xip__, par__):
                kin = elem_kinematics(spec, x_e_, xp_e_, gN)
                return model.residual(xi__, xip__, kin, par__, path_)

            def R(xi__, par__):
                return a.elem_res(x_e_, xp_e_, xi__, geom, par__)

            out = {"R": R(xi_, par)}
            out["dC_dxi"] = jax.jacfwd(C, 0)(xi_, xip_, par)
            out["dC_dxiprev"] = jax.jacfwd(C, 1)(xi_, xip_, par)
            out["dC_dp"] = jax.jacfwd(C, 2)(xi_, xip_, par)
            out["dR_dxi"] = jax.jacfwd(R, 0)(xi_, par)
            out["dR_dp"] = jax.jacfwd(R, 1)(xi_, par)
            return out

        B = jax.vmap(one)(
            x_e, xp_e, loc.xi, xi_prev, loc.path,
            disc.grad_N, disc.detJ, disc.h, pars,
        )
        return loc, B

    def _step_value_impl(self, x, x_prev, xi_prev, params_all, vf):
        a = self.assembler
        loc = a.local_solve(x, x_prev, xi_prev, params_all)
        R = a.residual(x, x_prev, loc.xi, params_all)
        P = vf @ R if vf.ndim == 1 else vf @ R  # (n_vf, n_dofs) @ (n_dofs,)
        return loc.xi, loc.path, jnp.sum(loc.failed), P, R

    def _step_sens_impl(self, x, x_prev, xi_prev, params_all, dxi_dp_prev, vf):
        """Forward-sensitivity step (evaluations.cpp:1847-1974)."""
        disc = self.disc
        loc, B = self._local_and_blocks(x, x_prev, xi_prev, params_all, None)
        rhs = -B["dC_dp"] - jnp.einsum("eij,ejp->eip", B["dC_dxiprev"], dxi_dp_prev)
        dxi_dp = gauss_solve(B["dC_dxi"], rhs)
        dR_dp_tot = jnp.einsum("eni,eip->enp", B["dR_dxi"], dxi_dp) + B["dR_dp"]
        R = disc.scatter_elem(B["R"])
        P = jnp.dot(vf, R)
        vf_e = disc.gather_elem(vf)
        dP_dp_e = jnp.einsum("en,enp->ep", vf_e, dR_dp_tot)
        n_sets = params_all.shape[0]
        dP_dp = jax.ops.segment_sum(dP_dp_e, disc.es_ids, num_segments=n_sets)
        return loc.xi, loc.path, dxi_dp, P, dP_dp

    def _step_adj_impl(self, x, x_prev, xi, xi_prev, path, params_all, c, h, vf):
        """Adjoint step at recorded (xi, path) — evaluations.cpp:1975-2145."""
        a = self.assembler
        disc, model, spec = self.disc, a.model, a.spec
        x_e = a.gather(x)
        xp_e = a.gather(x_prev)
        pars = a.params_per_elem(params_all)

        def one(x_e_, xp_e_, xi_, xip_, path_, gN, dJ, hh, par):
            geom = (gN, dJ, hh)

            def C(xi__, xip__, par__):
                kin = elem_kinematics(spec, x_e_, xp_e_, gN)
                return model.residual(xi__, xip__, kin, par__, path_)

            def R(xi__, par__):
                return a.elem_res(x_e_, xp_e_, xi__, geom, par__)

            return (
                jax.jacfwd(C, 0)(xi_, xip_, par),
                jax.jacfwd(C, 1)(xi_, xip_, par),
                jax.jacfwd(C, 2)(xi_, xip_, par),
                jax.jacfwd(R, 0)(xi_, par),
                jax.jacfwd(R, 1)(xi_, par),
            )

        dC_dxi, dC_dxiprev, dC_dp, dR_dxi, dR_dp = jax.vmap(one)(
            x_e, xp_e, xi, xi_prev, path,
            disc.grad_N, disc.detJ, disc.h, pars,
        )
        vf_e = disc.gather_elem(vf)
        rhs = -c * jnp.einsum("eni,en->ei", dR_dxi, vf_e) - h
        phi = gauss_solve(dC_dxi.swapaxes(-1, -2), rhs)
        h_next = jnp.einsum("eij,ei->ej", dC_dxiprev, phi)
        grad_e = c * jnp.einsum("en,enp->ep", vf_e, dR_dp) + jnp.einsum(
            "eip,ei->ep", dC_dp, phi
        )
        n_sets = params_all.shape[0]
        grad = jax.ops.segment_sum(grad_e, disc.es_ids, num_segments=n_sets)
        return phi, h_next, grad

    # -- public API -----------------------------------------------------
    def initial_xi(self):
        a = self.assembler
        xi0 = jnp.tile(
            jnp.asarray(a.model.init_xi(), self.disc.dtype)[None, :],
            (self.disc.n_elem, 1),
        )
        path0 = jnp.zeros(self.disc.n_elem, jnp.int32)
        return xi0, path0

    def powers(self, params_all, vf=None, collect_residuals=False):
        """P_int at every step; also returns the (xi, path) trajectory.

        vf may be a (n_dofs,) field or a stacked (n_vf, n_dofs) matrix
        (the EUCLID multi-virtual-field case, main_objective.cpp:409-509).
        """
        vf = self.vf if vf is None else vf
        xi, _ = self.initial_xi()
        xis, paths, Ps, Rs = [xi], [], [], []
        n = self.problem.time_grid.num_steps
        for step in range(1, n + 1):
            xi, path, nfail, P, R = self._step_value(
                self._measured[step], self._measured[step - 1], xi, params_all, vf
            )
            xis.append(xi)
            paths.append(path)
            Ps.append(np.asarray(P) if P.ndim else float(P))
            if collect_residuals:
                Rs.append(R)
        if collect_residuals:
            return Ps, xis, paths, Rs
        return Ps, xis, paths

    def powers_and_sens(self, params_all, vf=None):
        vf = self.vf if vf is None else vf
        xi, _ = self.initial_xi()
        nde = self.disc.edofs.shape[1]
        dxi_dp = jnp.zeros(
            (self.disc.n_elem, self.assembler.nxi, params_all.shape[1]),
            self.disc.dtype,
        )
        # NOTE: sens wrt the full per-set parameter matrix would need a
        # set axis; with a single parameter row per element (gathered by
        # es_ids) the dxi_dp blocks are wrt that element's own row, and
        # the segment_sum over es assembles per-set gradients.
        Ps, grads = [], []
        n = self.problem.time_grid.num_steps
        for step in range(1, n + 1):
            xi, path, dxi_dp, P, dP = self._step_sens(
                self._measured[step],
                self._measured[step - 1],
                xi,
                params_all,
                dxi_dp,
                vf,
            )
            Ps.append(float(P))
            grads.append(dP)
        return Ps, grads

    def adjoint_gradient(self, params_all, cs, xis, paths, vf=None):
        """Backward sweep; cs[step-1] = obj_scale*dt/T*mismatch."""
        vf = self.vf if vf is None else vf
        h = jnp.zeros(
            (self.disc.n_elem, self.assembler.nxi), self.disc.dtype
        )
        grad = jnp.zeros_like(params_all)
        n = self.problem.time_grid.num_steps
        for step in range(n, 0, -1):
            _, h, g = self._step_adj(
                self._measured[step],
                self._measured[step - 1],
                xis[step],
                xis[step - 1],
                paths[step - 1],
                params_all,
                jnp.asarray(cs[step - 1], self.disc.dtype),
                h,
                vf,
            )
            grad = grad + g
        return grad

"""Side-set surface QoIs: normal traction and side-set load mismatch.

Reference: source/calibr8/src/normal_traction.cpp (area-averaged
n . sigma . n over a side set) and load_mismatch.cpp (reaction load from
side-set-adjacent internal forces vs a measured load history).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from calibr8_tpu.fem.geometry import compute_facet_geom
from calibr8_tpu.mechanics.global_residual import elem_kinematics
from calibr8_tpu.qoi import register
from calibr8_tpu.qoi.base import QoI
from calibr8_tpu.qoi.calibration import read_load_file


class NormalTraction(QoI):
    """J = (1/area) integral over the side set of n . sigma . n
    (normal_traction.cpp:87-105)."""

    name = "normal traction"

    def __init__(self, disc, config=None, model=None):
        super().__init__(disc, config)
        self.model = model
        self.side_set = self.config["side set"]
        fg = compute_facet_geom(disc.mesh, self.side_set)
        self.elem_ids = jnp.asarray(fg.elem, jnp.int32)
        self.normals = jnp.asarray(fg.normal, disc.dtype)
        self.areas = jnp.asarray(fg.area, disc.dtype)
        self.area = float(np.sum(fg.area))

    def evaluate(self, x, x_prev, xi, params_all, aux):
        disc = self.disc
        spec = disc.spec
        x_e = disc.gather_elem(x)[self.elem_ids]
        xp_e = disc.gather_elem(x_prev)[self.elem_ids]
        xi_f = xi[self.elem_ids]
        gN = disc.grad_N[self.elem_ids]
        pars = params_all[disc.es_ids[self.elem_ids]]

        def one(x_e_, xp_e_, xi_, gN_, par, n):
            kin = elem_kinematics(spec, x_e_, xp_e_, gN_)
            _, p_e = spec.unpack(x_e_)
            p_ip = p_e.mean() if spec.mixed else jnp.zeros((), x_e_.dtype)
            sigma = self.model.cauchy(xi_, kin, par, p_ip)
            return n @ sigma @ n

        vals = jax.vmap(one)(x_e, xp_e, xi_f, gN, pars, self.normals)
        return jnp.sum(vals * self.areas) / self.area


class LoadMismatch(QoI):
    """J = 1/2 (load - measured)^2 with the load taken as the sum of the
    internal-force components at the side set's nodes
    (load_mismatch.cpp; with 'load out file' it records the history)."""

    name = "load mismatch"

    def __init__(self, disc, config=None, model=None):
        super().__init__(disc, config)
        cfg = self.config
        self.side_set = cfg["side set"]
        self.force_comp = int(cfg.get("reaction force component", 1))
        self.load_out_file = cfg.get("load out file")
        self.load_in_file = cfg.get("load input file")
        self.load_data = (
            read_load_file(self.load_in_file) if self.load_in_file else None
        )
        self.assembler = None
        fg = compute_facet_geom(disc.mesh, self.side_set)
        nodes = np.unique(fg.nodes.reshape(-1))
        self._load_dofs = jnp.asarray(
            disc.u_dof(nodes, self.force_comp), jnp.int32
        )

    def setup_step(self, step, t, dt, total_time):
        meas = self.load_data[step - 1] if self.load_data is not None else 0.0
        return dict(load_meas=jnp.asarray(meas, self.disc.dtype))

    def compute_load(self, x, x_prev, xi, params_all):
        R = self.assembler.residual(x, x_prev, xi, params_all)
        return jnp.sum(R[self._load_dofs])

    def evaluate(self, x, x_prev, xi, params_all, aux):
        load = self.compute_load(x, x_prev, xi, params_all)
        mism = load - aux["load_meas"]
        return 0.5 * mism * mism

    def after_step(self, x, x_prev, xi, params_all, step):
        if self.load_out_file:
            import os

            os.makedirs(
                os.path.dirname(self.load_out_file) or ".", exist_ok=True
            )
            load = float(self.compute_load(x, x_prev, xi, params_all))
            with open(self.load_out_file, "w" if step == 1 else "a") as f:
                f.write(f"{load:.17e}\n")


register("normal traction", NormalTraction)
register("load mismatch", LoadMismatch)

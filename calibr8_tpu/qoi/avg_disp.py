"""Simple field-average QoIs.

`average displacement` (reference: source/calibr8/src/avg_disp.cpp):
J = integral of (sum_i u_i) / ndims dv.

`displacement component`, `average stress`, `average local variable`
follow the same single-point quadrature pattern.
"""

from __future__ import annotations

import jax.numpy as jnp

from calibr8_tpu.mechanics.global_residual import PARENT_MEASURE, elem_kinematics
from calibr8_tpu.qoi.base import QoI


class AvgDisp(QoI):
    name = "average displacement"

    def elem_value(self, x_e, x_prev_e, xi, geom, params, aux):
        disc = self.disc
        spec = disc.spec
        gN, detJ, h = geom
        u_e, _ = spec.unpack(x_e)
        wdv = detJ * PARENT_MEASURE[spec.dim]
        u_ip = u_e.mean(axis=0)  # P1 centroid interpolation
        return jnp.sum(u_ip) / spec.dim * wdv


class DispComp(QoI):
    """reference: source/calibr8/src/disp_comp.cpp — integral of one
    displacement component over (optionally) one elem set."""

    name = "displacement component"

    def elem_value(self, x_e, x_prev_e, xi, geom, params, aux):
        spec = self.disc.spec
        gN, detJ, h = geom
        u_e, _ = spec.unpack(x_e)
        wdv = detJ * PARENT_MEASURE[spec.dim]
        comp = int(self.config.get("component", 0))
        return u_e.mean(axis=0)[comp] * wdv


class AvgStress(QoI):
    """reference: source/calibr8/src/avg_stress.cpp — integral of a
    Cauchy stress component (from the local model's stress measures)."""

    name = "average stress"

    def __init__(self, disc, config=None, model=None):
        super().__init__(disc, config)
        self.model = model

    def elem_value(self, x_e, x_prev_e, xi, geom, params, aux):
        spec = self.disc.spec
        gN, detJ, h = geom
        kin = elem_kinematics(spec, x_e, x_prev_e, gN)
        _, p_e = spec.unpack(x_e)
        p_ip = p_e.mean() if spec.mixed else jnp.zeros((), x_e.dtype)
        sigma = self.model.cauchy(xi, kin, params, p_ip)
        i = int(self.config.get("i", 0))
        j = int(self.config.get("j", 0))
        wdv = detJ * PARENT_MEASURE[spec.dim]
        return sigma[i, j] * wdv


class AvgLocalVar(QoI):
    """reference: source/calibr8/src/avg_local_var.cpp — integral of one
    local (constitutive) state component."""

    name = "average local variable"

    def elem_value(self, x_e, x_prev_e, xi, geom, params, aux):
        spec = self.disc.spec
        gN, detJ, h = geom
        idx = int(self.config.get("index", 0))
        wdv = detJ * PARENT_MEASURE[spec.dim]
        return xi[idx] * wdv

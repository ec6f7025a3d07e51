"""Quantity-of-interest base: pure per-element functions.

Re-design of QoI<T> (reference: source/calibr8/src/qoi.hpp:20-94): a QoI
is a pure scalar function of (x_e, xi, geom, params[, measured data])
accumulated over elements (at the ip-set-0 points, matching the
reference's lv-shape quadrature order — evaluations.cpp:666) plus
optional preprocess/postprocess hooks.  Derivatives dJ/dx, dJ/dxi, dJ/dp
come from jax.jacrev/grad on the same function — replacing
QoI<FADT>::eigen_dvector (qoi.cpp:226-233).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from calibr8_tpu.mechanics.global_residual import PARENT_MEASURE


class QoI:
    """Subclasses implement elem_value; step-dependent data arrives via
    `aux` (a pytree prepared per step by setup_step)."""

    name = "base"

    def __init__(self, disc, config=None):
        self.disc = disc
        self.config = config or {}

    def setup_step(self, step: int, t: float, dt: float, total_time: float):
        """Returns the aux pytree for this step (measured data slices,
        weights...).  Called host-side per step."""
        return ()

    def elem_value(self, x_e, x_prev_e, xi, geom, params, aux):
        """Scalar contribution of one element (already includes w*dv)."""
        raise NotImplementedError

    def evaluate(self, x, x_prev, xi, params_all, aux):
        """J = sum over elements (jit/vmap over the element axis)."""
        disc = self.disc
        x_e = x[disc.edofs]
        xp_e = x_prev[disc.edofs]
        pars = params_all[disc.es_ids]

        def one(x_e_, xp_e_, xi_, gN, dJ, h, par):
            return self.elem_value(x_e_, xp_e_, xi_, (gN, dJ, h), par, aux)

        vals = jax.vmap(one)(
            x_e, xp_e, xi, disc.grad_N, disc.detJ, disc.h, pars
        )
        return jnp.sum(vals)

    def partials(self, x, x_prev, xi, params_all, aux):
        """(dJ/dx (n_dofs,), dJ/dxi (n_elem, nxi), dJ/dp (n_sets, n_p)).

        Default (element-form QoIs): per-element jax.grad of elem_value
        vmapped with the ELEMENT AXIS LAST, then the row-based scatter —
        the QoI<FADT> seeded-evaluation analog (qoi.cpp:226-233).  The
        naive jax.grad of `evaluate` transposes its elem-FIRST vmap,
        whose (E, npe, dim) broadcast/pad cotangents tile-pad 32-43x on
        TPU (two 3 GB temps at 1.57M elements — the 1.1M-DOF adjoint
        HBM OOM).  QoIs that override `evaluate` (load/side-set
        mismatch forms) fall back to jax.grad of the override.
        """
        disc = self.disc
        if type(self).evaluate is not QoI.evaluate:

            def Jfn(x_, xi_, p_):
                return self.evaluate(x_, x_prev, xi_, p_, aux)

            return jax.grad(Jfn, argnums=(0, 1, 2))(x, xi, params_all)

        x_eT = disc.gather_elem(x).T
        xp_eT = disc.gather_elem(x_prev).T
        gNT = jnp.moveaxis(disc.grad_N, 0, -1)
        pars = params_all[disc.es_ids]

        def one(x_e_, xp_e_, xi_, gN_, dJ_, h_, par_):
            def f(xe, xie, pare):
                return self.elem_value(
                    xe, xp_e_, xie, (gN_, dJ_, h_), pare, aux
                )

            return jax.grad(f, argnums=(0, 1, 2))(x_e_, xi_, par_)

        dx_eT, dxi_eT, dp_eT = jax.vmap(
            one,
            in_axes=(-1, -1, -1, -1, 0, 0, -1),
            out_axes=(-1, -1, -1),
        )(x_eT, xp_eT, xi.T, gNT, disc.detJ, disc.h, pars.T)
        dJdx = disc.scatter_elem(dx_eT.T)
        dJdxi = dxi_eT.T
        dJdp = jax.ops.segment_sum(
            dp_eT.T, disc.es_ids, num_segments=params_all.shape[0]
        )
        return dJdx, dJdxi, dJdp

    def postprocess(self, J: float, step: int) -> float:
        return J

    def after_step(self, x, x_prev, xi, params_all, step: int) -> None:
        """Host-side per-step hook (e.g. writing load.dat histories —
        calibration.cpp:351-366); no-op by default."""

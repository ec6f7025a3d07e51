"""Stress postprocessing — the analog of eval_cauchy
(reference: source/calibr8/src/evaluations.cpp:1659-1749): evaluate the
(full) Cauchy stress at each element integration point from the
converged state, for visualization and SPR recovery."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from calibr8_tpu.mechanics.global_residual import elem_kinematics
from calibr8_tpu.models.base import sym_to_voigt


def eval_cauchy(assembler, x, x_prev, xi, params_all):
    """Per-element Cauchy stress in Voigt order, (n_elem, ncomp).

    Mixed formulations use sigma = dev_cauchy - p I with the pressure
    interpolated at the centroid, like the reference.
    """
    a = assembler
    disc, spec, model = a.disc, a.spec, a.model

    def one(x_e, xp_e, xi_e, grad_N, pars):
        kin = elem_kinematics(spec, x_e, xp_e, grad_N)
        if spec.mixed:
            _, p_e = spec.unpack(x_e)
            p_ip = jnp.mean(p_e)
        else:
            p_ip = jnp.zeros((), x_e.dtype)
        sig = model.cauchy(xi_e, kin, pars, p_ip)
        return sym_to_voigt(0.5 * (sig + sig.T), spec.dim)

    pars = params_all[disc.es_ids]
    return jax.vmap(one)(
        disc.gather_elem(x),
        disc.gather_elem(x_prev),
        xi,
        disc.grad_N,
        pars,
    )

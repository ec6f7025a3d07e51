"""Hybrid NN-hardening constitutive model.

Re-design of hybrid_hyper_J2_plane_stress
(reference: source/calibr8/src/hybrid_hyper_J2_plane_stress.cpp): the
finite-deformation plane-stress J2 model with the hardening curve
replaced by a feed-forward network,

    sigma_yield(alpha) = Y + out_scale * (NN(in_scale * alpha) - NN(0))

(hybrid_hyper_J2_plane_stress.cpp:187-194, :352).  The network weights
join the parameter vector after the physical parameters (E, nu, Y), so
dJ/d(weights) flows through the same adjoint machinery that handles
material parameters (the reference needs a separate dynamic-FAD type
and gradient path — evaluations.cpp:870-880 — for this).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.models import register
from calibr8_tpu.models.hyper_j2 import SQRT_23, HyperJ2PlaneStress
from calibr8_tpu.models.nn import FFNN


@register
class HybridHyperJ2PlaneStress(HyperJ2PlaneStress):
    name = "hybrid_hyper_J2_plane_stress"

    # physical parameters; NN weights appended dynamically
    base_param_names = ("E", "nu", "Y")

    def __init__(self, dim, config=None):
        super().__init__(dim)
        cfg = (config or {}).get("embedded model", {})
        activation = cfg.get("activation function", "sigmoid")
        topology = list(cfg.get("topology", [1, 4, 1]))
        positive = bool(cfg.get("positive weights", False))
        self.nn_input_scale = float(cfg.get("input scale", 1.0))
        self.nn_output_scale = float(cfg.get("output scale", 1.0))
        self.nn = FFNN(activation, topology, positive_weights=positive)
        self.param_names = tuple(self.base_param_names) + tuple(
            f"nn_{i}" for i in range(self.nn.n_params)
        )

    def default_params(self):
        """Initial parameter vector: physical zeros + NN init weights."""
        p = np.zeros(len(self.param_names))
        p[len(self.base_param_names):] = self.nn.init_params
        return p

    def nn_hardening(self, alpha, params):
        w = params[len(self.base_param_names):]
        one = jnp.reshape(self.nn_input_scale * alpha, (1,))
        zero = jnp.zeros((1,), dtype=one.dtype)
        return self.nn_output_scale * (self.nn(w, one)[0] - self.nn(w, zero)[0])

    def _sigma_yield(self, alpha, params):
        Y = params[2]
        return Y + self.nn_hardening(alpha, params)

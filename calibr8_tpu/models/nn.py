"""Neural-network building blocks for hybrid constitutive models.

Re-design of ML::FFNN / ML::FICNN (reference: source/calibr8/src/NN.{hpp,cpp},
ICNN.{hpp,cpp}): pure-JAX functional networks over FLAT parameter
vectors, so network weights can join the calibrated parameter vector
directly (the reference threads them through as dynamic-FAD 'dfad'
parameters — hybrid_hyper_J2_plane_stress.cpp:114-148,
evaluations.cpp:870-880; here they are just more entries of params and
every derivative comes from the same jacfwd/grad machinery).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_ACTIVATIONS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "sigmoid": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
    "tanh": jnp.tanh,
    "softplus": lambda x: jnp.logaddexp(x, 0.0),
}


class FFNN:
    """Feed-forward network over a flat parameter vector.

    Layout matches the reference packing (NN.cpp get_params): per layer,
    W (row-major) then b.  Hidden layers use the activation; the output
    layer is affine (NN.cpp evaluate)."""

    def __init__(self, activation: str, topology, positive_weights=False, seed=10):
        assert len(topology) >= 3, "FFNN: not enough layers"
        self.topology = list(topology)
        self.act = _ACTIVATIONS[activation]
        self.positive_weights = positive_weights
        self.shapes = [
            (topology[i + 1], topology[i]) for i in range(len(topology) - 1)
        ]
        self.n_params = sum(r * c + r for (r, c) in self.shapes)
        rng = np.random.default_rng(seed)
        parts = []
        for r, c in self.shapes:
            W = rng.random((r, c))
            if positive_weights:
                W = np.abs(W)
            parts.append(W.reshape(-1))
            parts.append(np.ones(r))
        self.init_params = np.concatenate(parts)

    def unpack(self, p):
        out = []
        idx = 0
        for r, c in self.shapes:
            W = p[idx : idx + r * c].reshape(r, c)
            idx += r * c
            b = p[idx : idx + r]
            idx += r
            out.append((W, b))
        return out

    def __call__(self, p, x):
        layers = self.unpack(p)
        h = x
        for W, b in layers[:-1]:
            h = self.act(W @ h + b)
        W, b = layers[-1]
        return W @ h + b


class FICNN:
    """Fully input-convex network (reference: ICNN.{hpp,cpp}): layer 0
    is affine in the input y; subsequent layers add pass-through
    operators Wz on the previous activations:
        x_1     = Wy_0 y + b_0
        x_{i+1} = act(Wz_i x_i + Wy_i y + b_i)
    Packing per layer: Wy, Wz, b (ICNN.cpp get_params); Wz_0 is empty.
    Convexity requires nonneg Wz and convex nondecreasing activation —
    enforced at training time in the reference; here by |Wz| when
    `enforce_convex`."""

    def __init__(self, activation: str, topology, seed=10, enforce_convex=False):
        assert len(topology) >= 3
        self.topology = list(topology)
        self.act = _ACTIVATIONS[activation]
        self.enforce_convex = enforce_convex
        n_in = topology[0]
        self.layer_shapes = []
        for i in range(len(topology) - 1):
            wy = (topology[i + 1], n_in)
            wz = (topology[i + 1], topology[i]) if i > 0 else (topology[i + 1], 0)
            self.layer_shapes.append((wy, wz, topology[i + 1]))
        self.n_params = sum(
            wy[0] * wy[1] + wz[0] * wz[1] + nb for (wy, wz, nb) in self.layer_shapes
        )
        rng = np.random.default_rng(seed)
        parts = []
        for wy, wz, nb in self.layer_shapes:
            parts.append(rng.random(wy[0] * wy[1]))
            parts.append(rng.random(wz[0] * wz[1]))
            parts.append(np.ones(nb))
        self.init_params = np.concatenate(parts)

    def unpack(self, p):
        out = []
        idx = 0
        for wy, wz, nb in self.layer_shapes:
            Wy = p[idx : idx + wy[0] * wy[1]].reshape(wy)
            idx += wy[0] * wy[1]
            Wz = p[idx : idx + wz[0] * wz[1]].reshape(wz)
            idx += wz[0] * wz[1]
            b = p[idx : idx + nb]
            idx += nb
            out.append((Wy, Wz, b))
        return out

    def __call__(self, p, y):
        layers = self.unpack(p)
        Wy0, _, b0 = layers[0]
        x = Wy0 @ y + b0
        for Wy, Wz, b in layers[1:]:
            Wz_eff = jnp.abs(Wz) if self.enforce_convex else Wz
            x = self.act(Wz_eff @ x + Wy @ y + b)
        return x

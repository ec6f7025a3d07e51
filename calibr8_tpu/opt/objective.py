"""Optimization objectives over material parameters.

Re-design of the reference L7 objective layer
(source/calibr8/src/objective.{hpp,cpp}, adjoint_objective.cpp,
femu_objective.cpp): active (calibrated) parameters are selected per
element set from the `inverse: materials:` bounds lists, scaled to the
canonical box [-1, 1] (objective.cpp:41-61), with the chain-rule span
factor applied to gradients (objective.cpp:transform_gradient).  The
adjoint objective re-solves the primal when parameters change and runs
the backward adjoint sweep for gradients (adjoint_objective.cpp:20-118);
value/gradient share the cached trajectory between calls
(objective.hpp:47-55 param_diff caching).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass
class ActiveParams:
    """Active-parameter bookkeeping: (elem_set, param) pairs + scales.

    Each entry carries one of the reference's three scalings
    (python/calibr8/util/parameter_transforms.py:4-66):
    (lo, hi) bounds -> canonical [-1, 1] (the C++ ROL convention,
    objective.cpp:41-61), a float ref value -> log scaling, or None ->
    untransformed value."""

    entries: list  # [(es_idx, param_idx, name)]
    scales: list  # [(lo, hi) | float | None] per entry

    @classmethod
    def from_inverse_spec(cls, inverse_params: dict, elem_set_names, param_names):
        """Parse `inverse: materials: <es>: <param>: [lo, hi] | ref | null`
        (objective.cpp:75-110); parameter order is elem-set-major,
        model-parameter-order minor, matching the reference."""
        mats = inverse_params.get("materials", {})
        entries, scales = [], []
        for es_idx, es in enumerate(elem_set_names):
            m = mats.get(es, {}) or {}
            for p_idx, pname in enumerate(param_names):
                if pname in m:
                    s = m[pname]
                    entries.append((es_idx, p_idx, f"{es}/{pname}"))
                    if s is None:
                        scales.append(None)
                    elif isinstance(s, (int, float)):
                        scales.append(float(s))  # log scaling ref value
                    else:
                        scales.append((float(s[0]), float(s[1])))
        return cls(entries, scales)

    @property
    def n(self) -> int:
        return len(self.entries)

    @property
    def names(self):
        return [e[2] for e in self.entries]

    # bounds-mode views (valid when every scale is a (lo, hi) pair) -----
    @property
    def lower(self) -> np.ndarray:
        return np.asarray([s[0] for s in self.scales])

    @property
    def upper(self) -> np.ndarray:
        return np.asarray([s[1] for s in self.scales])

    def span(self) -> np.ndarray:
        return 0.5 * (self.upper - self.lower)

    def mean(self) -> np.ndarray:
        return 0.5 * (self.upper + self.lower)

    # canonical scaling --------------------------------------------------
    def to_canonical(self, p: np.ndarray) -> np.ndarray:
        from calibr8_tpu.opt import transforms as tr

        return tr.transform_parameters(np.asarray(p), self.scales, False)

    def from_canonical(self, x: np.ndarray) -> np.ndarray:
        from calibr8_tpu.opt import transforms as tr

        return tr.transform_parameters(np.asarray(x), self.scales, True)

    def grad_to_canonical(self, g: np.ndarray, p=None) -> np.ndarray:
        """Chain-rule dJ/dx = dJ/dp * dp/dx; log scaling needs the
        current parameter values p (dp/dx = p)."""
        from calibr8_tpu.opt import transforms as tr

        if p is None:
            if any(tr.is_log(s) for s in self.scales):
                raise ValueError("log-scaled gradients need parameter values")
            p = np.zeros_like(np.asarray(g))
        return tr.grad_transform(np.asarray(g), np.asarray(p), self.scales)

    def opt_bounds(self):
        from calibr8_tpu.opt import transforms as tr

        return [tr.opt_bounds(s) for s in self.scales]

    # scatter / gather against the full (n_sets, n_params) matrix ------
    def insert(self, params_all, p_active):
        out = params_all
        for k, (es, pi, _) in enumerate(self.entries):
            out = out.at[es, pi].set(p_active[k])
        return out

    def extract(self, params_all) -> np.ndarray:
        return np.asarray(
            [params_all[es, pi] for (es, pi, _) in self.entries]
        )

    def extract_grad(self, grad_all) -> np.ndarray:
        return np.asarray(
            [grad_all[es, pi] for (es, pi, _) in self.entries]
        )


class AdjointObjective:
    """value = sum_steps J; gradient by the backward adjoint sweep.

    Operates in canonical coordinates (the optimizer's view).
    """

    def __init__(self, problem, adjoint, active: ActiveParams):
        self.problem = problem
        self.adjoint = adjoint
        self.active = active
        self._cache_x = None
        self._cache_traj = None

    def _params_all(self, x_canonical):
        p_active = self.active.from_canonical(x_canonical)
        return self.active.insert(
            self.problem.params0, jnp.asarray(p_active, self.problem.disc.dtype)
        )

    def _solve(self, x_canonical):
        x_c = np.asarray(x_canonical, dtype=np.float64)
        if self._cache_x is not None and np.array_equal(self._cache_x, x_c):
            return self._cache_traj
        params_all = self._params_all(x_c)
        traj = self.problem.primal.run(params_all)
        self._cache_x = x_c.copy()
        self._cache_traj = traj
        return traj

    def value(self, x_canonical) -> float:
        return self._solve(x_canonical).J

    def gradient(self, x_canonical) -> np.ndarray:
        traj = self._solve(x_canonical)
        params_all = self._params_all(np.asarray(x_canonical))
        grad_all, _ = self.adjoint.sweep(
            traj, params_all, self.problem.time_grid
        )
        g_active = self.active.extract_grad(np.asarray(grad_all))
        p_act = self.active.extract(np.asarray(params_all))
        return self.active.grad_to_canonical(g_active, p_act)

    def value_and_gradient(self, x_canonical):
        return self.value(x_canonical), self.gradient(x_canonical)


class MultiProblemObjective:
    """Sum of objectives over independent problems (multi-experiment
    calibration — reference: objective.hpp:41-45, adjoint_objective.cpp
    loops problems; test/adjoint/2prob.yaml.in).  All child objectives
    share one ActiveParams (same canonical coordinates)."""

    def __init__(self, objectives, active: "ActiveParams"):
        self.objectives = list(objectives)
        self.active = active

    def value(self, x_canonical) -> float:
        return sum(o.value(x_canonical) for o in self.objectives)

    def gradient(self, x_canonical) -> np.ndarray:
        g = np.zeros(self.active.n)
        for o in self.objectives:
            g = g + np.asarray(o.gradient(x_canonical))
        return g

    def value_and_gradient(self, x_canonical):
        J, g = 0.0, np.zeros(self.active.n)
        for o in self.objectives:
            Ji, gi = o.value_and_gradient(x_canonical)
            J += Ji
            g = g + np.asarray(gi)
        return J, g


class FEMUObjective:
    """Value-only objective; the optimizer finite-differences gradients
    (reference: femu_objective.cpp:13-37)."""

    def __init__(self, problem, active: ActiveParams):
        self.problem = problem
        self.active = active

    def value(self, x_canonical) -> float:
        p_active = self.active.from_canonical(np.asarray(x_canonical))
        params_all = self.active.insert(
            self.problem.params0,
            jnp.asarray(p_active, self.problem.disc.dtype),
        )
        return self.problem.primal.run(params_all).J


def fd_gradient_check(value_fn, grad, x, direction=None, num_steps=13, seed=0):
    """The reference's gradient verification: ROL-style FD sweep with
    shrinking steps; returns (log10 drop of the FD error, errors).

    metric = log10(max_err / min_err) — how many decades the
    |FD - dJ.v| error falls as the step shrinks (main_inverse.cpp:126-159);
    ~7-8 decades for a correct adjoint gradient in double precision.
    """
    x = np.asarray(x, dtype=np.float64)
    if direction is None:
        rng = np.random.default_rng(seed)
        direction = rng.uniform(-1.0, 1.0, size=x.shape)
    direction = np.asarray(direction)
    gdotv = float(np.dot(np.asarray(grad), direction))
    errs = []
    for k in range(num_steps):
        h = 10.0 ** (-k)
        Jp = value_fn(x + h * direction)
        J0 = value_fn(x)
        fd = (Jp - J0) / h
        errs.append(abs(fd - gdotv))
    errs = np.asarray(errs)
    drop = np.log10(errs.max() / max(errs.min(), 1e-300))
    return drop, errs

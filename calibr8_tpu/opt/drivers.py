"""Outer-loop calibration drivers: scipy optimizers over the objective.

Re-design of the reference Python driver layer
(source/calibr8/python/calibr8/bin/inverse.py:22-126,
util/driver_support.py): scipy L-BFGS-B or trust-constr over the
canonical [-1, 1] box.  Where the reference spawns `mpirun objective
deck.yaml` subprocesses per evaluation and parses objective.dat /
gradient.dat, here value/gradient are in-process jitted JAX calls.

Failure handling mirrors driver_support.py:181-283: a failed forward
solve (diverged Newton at an aggressive parameter point) is converted to
a large penalty value pushing the optimizer back inward
('penalty_inward'), or the last successful value is repeated
('repeat_last').
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy import optimize

from calibr8_tpu.solve.newton import NewtonSolveError


@dataclass
class InverseResult:
    x_canonical: np.ndarray
    params: np.ndarray
    names: list
    J: float
    n_evals: int
    success: bool
    message: str
    history: list


class _EvalWrapper:
    """Objective adapter with failure handling and history recording."""

    def __init__(self, objective, failure_mode="penalty_inward", penalty=1e10):
        self.obj = objective
        self.failure_mode = failure_mode
        self.penalty = penalty
        self.n_evals = 0
        self.history = []
        self._last_good = None

    def value_and_grad(self, x):
        self.n_evals += 1
        try:
            J, g = self.obj.value_and_gradient(x)
            self._last_good = (float(J), np.asarray(g))
            self.history.append((np.asarray(x).copy(), float(J)))
            return float(J), np.asarray(g)
        except NewtonSolveError:
            if self.failure_mode == "repeat_last" and self._last_good:
                return self._last_good
            # penalty_inward: large value, gradient pointing back toward
            # the center of the canonical box (driver_support.py:181-283)
            g = np.sign(np.asarray(x)) * self.penalty
            return self.penalty, g

    def value(self, x):
        self.n_evals += 1
        try:
            J = self.obj.value(x)
            self.history.append((np.asarray(x).copy(), float(J)))
            return float(J)
        except NewtonSolveError:
            return self.penalty


def run_inverse(
    objective,
    active,
    x0=None,
    method="L-BFGS-B",
    gtol=1e-8,
    max_iters=150,
    failure_mode="penalty_inward",
    out_file=None,
    use_gradient=True,
    checkpoint_path=None,
    resume=False,
):
    """Minimize over the canonical box; returns InverseResult and
    optionally writes the `name: value` file consumed by
    check_recovered_params-style verification
    (reference: test/python/check_recovered_params.py)."""
    n = active.n
    if x0 is None:
        x0 = np.zeros(n)
    if resume and checkpoint_path:
        from calibr8_tpu.opt.checkpoint import load_checkpoint
        import os

        if os.path.exists(checkpoint_path):
            x0, _, _ = load_checkpoint(checkpoint_path)
    wrapper = _EvalWrapper(objective, failure_mode)
    # per-scaling optimizer box: [-1, 1] for bounds scaling, unbounded
    # for value/log scalings (parameter_transforms.py:63-70)
    bounds = (
        active.opt_bounds()
        if hasattr(active, "opt_bounds")
        else [(-1.0, 1.0)] * n
    )

    callback = None
    if checkpoint_path:
        from calibr8_tpu.opt.checkpoint import save_checkpoint

        def callback(xk, *unused):
            save_checkpoint(
                checkpoint_path, np.asarray(xk), wrapper.history,
                meta={"names": active.names},
            )


    if use_gradient and hasattr(objective, "gradient"):
        fun = wrapper.value_and_grad
        jac = True
    else:
        fun = wrapper.value
        jac = None

    if method == "L-BFGS-B":
        res = optimize.minimize(
            fun, x0, jac=jac, method="L-BFGS-B", bounds=bounds,
            callback=callback,
            options={"maxiter": max_iters, "gtol": gtol, "ftol": 1e-14},
        )
    elif method in ("trust-constr", "trust_region"):
        res = optimize.minimize(
            fun, x0, jac=jac, method="trust-constr", bounds=bounds,
            callback=callback,
            options={"maxiter": max_iters, "gtol": gtol, "xtol": 1e-14},
        )
    else:
        raise ValueError(f"unknown optimizer {method!r}")

    if checkpoint_path:
        from calibr8_tpu.opt.checkpoint import save_checkpoint

        save_checkpoint(
            checkpoint_path, np.asarray(res.x), wrapper.history,
            meta={"names": active.names, "final": True},
        )
    params = active.from_canonical(res.x)
    if out_file:
        with open(out_file, "w") as f:
            for name, val in zip(active.names, params):
                short = name.split("/")[-1]
                f.write(f"{short}: {val:.12e}\n")
    return InverseResult(
        x_canonical=np.asarray(res.x),
        params=np.asarray(params),
        names=active.names,
        J=float(res.fun),
        n_evals=wrapper.n_evals,
        success=bool(res.success),
        message=str(res.message),
        history=wrapper.history,
    )

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
    """Objective adapter with failure handling and history recording
    (reference: driver_support.py:181-283).

    On a failed forward solve (diverged Newton at an aggressive
    parameter point):

      * penalty_inward — finite penalty objective plus a SMALL fake
        gradient along (x - last_success_x), so the optimizer's
        negative-gradient step points back toward the last good point.
        Its norm is min(fake_grad_scale * median successful-gradient
        norm, fake_grad_cap) — a huge fake gradient would poison the
        L-BFGS curvature pairs.
      * repeat_last — return the previous successful (J, g); falls
        back to penalty_inward before any success exists.
    """

    def __init__(
        self,
        objective,
        failure_mode="penalty_inward",
        penalty=1.0e12,
        fake_grad_scale=1.0e-3,
        fake_grad_cap=1.0,
        fake_grad_fallback_norm=1.0,
        grad_norm_window=25,
    ):
        self.obj = objective
        self.failure_mode = failure_mode
        self.penalty = penalty
        self.fake_grad_scale = fake_grad_scale
        self.fake_grad_cap = fake_grad_cap
        self.fake_grad_fallback_norm = fake_grad_fallback_norm
        self.grad_norm_window = grad_norm_window
        self.n_evals = 0
        self.history = []
        self.call_log = []
        self._last_good = None
        self._last_good_x = None
        self._grad_norms = []

    def _fake_inward_grad(self, x):
        x = np.asarray(x, dtype=float)
        if self._last_good_x is None:
            direction = np.ones_like(x)
        else:
            direction = x - self._last_good_x
        nrm = float(np.linalg.norm(direction))
        if not np.isfinite(nrm) or nrm < 1e-12:
            direction = np.ones_like(x)
            nrm = float(np.linalg.norm(direction))
        target = (
            float(np.median(self._grad_norms))
            if self._grad_norms
            else self.fake_grad_fallback_norm
        )
        fake_norm = max(
            min(self.fake_grad_scale * target, self.fake_grad_cap), 1e-12
        )
        return (fake_norm / (nrm + 1e-12)) * direction

    def _record_success(self, x, J, g=None):
        self._last_good_x = np.asarray(x, dtype=float).copy()
        self.history.append((np.asarray(x).copy(), float(J)))
        if g is not None:
            self._last_good = (float(J), np.asarray(g))
            self._grad_norms.append(float(np.linalg.norm(g)))
            del self._grad_norms[: -self.grad_norm_window]
        self.call_log.append({"success": True, "objective": float(J)})

    def _handle_failure(self, x, want_grad):
        if self.failure_mode == "repeat_last" and self._last_good:
            self.call_log.append(
                {"success": False, "failure_response": "repeat_last"}
            )
            return self._last_good if want_grad else self._last_good[0]
        self.call_log.append(
            {"success": False, "failure_response": "penalty_inward"}
        )
        if want_grad:
            return self.penalty, self._fake_inward_grad(x)
        return self.penalty

    def value_and_grad(self, x):
        self.n_evals += 1
        try:
            J, g = self.obj.value_and_gradient(x)
            self._record_success(x, J, g)
            return float(J), np.asarray(g)
        except NewtonSolveError:
            return self._handle_failure(x, want_grad=True)

    def value(self, x):
        self.n_evals += 1
        try:
            J = self.obj.value(x)
            self._record_success(x, J)
            return float(J)
        except NewtonSolveError:
            return self._handle_failure(x, want_grad=False)


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

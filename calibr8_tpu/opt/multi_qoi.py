"""Batch evaluation of multiple QoIs and their gradients from ONE primal
solve — the analog of the `evaluate_multiple_qois_and_gradients` driver
(reference: source/calibr8/src/main_evaluate_multiple_qois_and_gradients.cpp):
the primal trajectory is solved once; each QoI then gets its own adjoint
backward sweep."""

from __future__ import annotations

import numpy as np

from calibr8_tpu.qoi import create_qoi
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg


def evaluate_multiple_qois_and_gradients(
    problem, qoi_configs, active=None, params_all=None, linear_cfg=None
):
    """qoi_configs: list of QoI deck dicts ({'type': ..., ...}).

    Returns a list of dicts {name, J, grad (n_sets, n_params) or active
    subset when `active` is given}."""
    params_all = problem.params0 if params_all is None else params_all
    traj = problem.primal.run(params_all, qoi_eval=False)
    linear_cfg = linear_cfg or LinearCfg()

    out = []
    for cfg in qoi_configs:
        cfg = dict(cfg)
        qtype = cfg.pop("type")
        qoi = create_qoi(qtype, problem.disc, cfg, model=problem.model)
        if hasattr(qoi, "assembler"):
            qoi.assembler = problem.assembler
        # QoI value over steps
        tg = problem.time_grid
        J = 0.0
        for step in range(1, tg.num_steps + 1):
            aux = qoi.setup_step(step, tg.time(step), tg.dt(step), tg.total_time)
            J += float(
                qoi.evaluate(
                    traj.x[step], traj.x[step - 1], traj.xi[step], params_all, aux
                )
            )
        adj = Adjoint(
            problem.assembler, qoi, problem.dbcs, linear_cfg,
            mg_factory=problem.mg_factory,
        )
        grad_all, _ = adj.sweep(traj, params_all, tg)
        entry = {"name": qtype, "J": J, "grad_all": np.asarray(grad_all)}
        if active is not None:
            g = active.extract_grad(np.asarray(grad_all))
            entry["grad"] = active.grad_to_canonical(g, active.extract(np.asarray(params_all)))
        out.append(entry)
    return out

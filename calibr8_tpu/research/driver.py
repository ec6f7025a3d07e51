"""Research mini-app adaptive driver.

The reference Driver loop (reference: source/calibr8/research/
research.cpp:32-52): for each adapt iteration build the disc, compute
the error field, write output, adapt; finally write the convergence
history against an optional exact QoI value.
"""

from __future__ import annotations

import os

import numpy as np

from calibr8_tpu.mesh import generators
from calibr8_tpu.mesh.adapt import adapt_mesh
from calibr8_tpu.research.error import adjoint_error_estimate


def build_research_mesh(cfg):
    bm = dict(cfg.get("mesh", {"type": "square", "n": 8}))
    kind = bm.pop("type", "square")
    fn = {
        "square": generators.square,
        "cube": generators.cube,
        "notch2D": generators.notch2d,
    }[kind]
    return fn(**bm)


def run_research(params: dict):
    """params: {physics: {...}, qoi: {...}, mesh: {...},
    error: {output, J exact}, adapt: {num iterations, target elements}}.
    Returns the per-cycle history list."""
    physics_cfg = params.get("physics", {"type": "nlpoisson", "alpha": 1.0})
    qoi_cfg = params.get("qoi", {"type": "value"})
    err_cfg = params.get("error", {})
    adapt_cfg = params.get("adapt", {})
    n_adapt = int(adapt_cfg.get("num iterations", 3))
    target = int(adapt_cfg.get("target elements", 0)) or None
    J_exact = err_cfg.get("J exact", None)

    mesh = build_research_mesh(params)
    history = []
    for cycle in range(1, n_adapt + 1):
        res = adjoint_error_estimate(mesh, physics_cfg, qoi_cfg)
        row = dict(
            cycle=cycle,
            n_elems=res.n_elems,
            J_H=res.J_H,
            J_p=res.J_p,
            J_h=res.J_h,
            E_exact=res.E_exact,
            eta1=res.eta1,
            eta2=res.eta2,
            eta1_bound=res.eta1_bound,
            eff1=res.eff1,
            eff2=res.eff2,
        )
        if J_exact is not None:
            row["E_vs_exact"] = float(J_exact) - res.J_H
        history.append(row)
        if cycle != n_adapt:
            tgt = target or 2 * mesh.n_elems
            mesh = adapt_mesh(mesh, res.elem_error, tgt)

    out = err_cfg.get("output")
    if out:
        os.makedirs(out, exist_ok=True)
        cols = list(history[0].keys())
        with open(os.path.join(out, "history.dat"), "w") as f:
            f.write(" ".join(cols) + "\n")
            for row in history:
                f.write(
                    " ".join(
                        f"{row[c]:.16e}"
                        if isinstance(row[c], float)
                        else str(row[c])
                        for c in cols
                    )
                    + "\n"
                )
    return history

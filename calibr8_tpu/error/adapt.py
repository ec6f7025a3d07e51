"""Adaptive solve-estimate-adapt cycles.

Re-design of the reference `error` driver (source/calibr8/src/main_error.cpp:
Driver::drive — solve primal on the coarse space, solve the fine adjoint
on a nested refinement, localize the adjoint-weighted error to base
elements, adapt via the iso target size field, repeat for `solve cycles`
from the `adaptivity` deck sublist)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from calibr8_tpu.error.verify import verify
from calibr8_tpu.mesh.adapt import adapt_mesh
from calibr8_tpu.problem import Problem, build_mesh


@dataclass
class AdaptCycleResult:
    cycles: list = field(default_factory=list)  # per cycle dicts

    @property
    def etas(self):
        return [c["eta"] for c in self.cycles]

    @property
    def J_Hs(self):
        return [c["J_H"] for c in self.cycles]


def adaptive_error_cycles(spec, n_cycles=None, target=None) -> AdaptCycleResult:
    ad = spec.sub("adaptivity")
    n_cycles = n_cycles or int(ad.get("solve cycles", 2))
    target = target or int(ad.get("target elements", 0)) or None

    mesh = build_mesh(spec)
    out = AdaptCycleResult()
    for cycle in range(n_cycles):
        res = verify(spec, mesh=mesh)
        out.cycles.append(
            dict(
                cycle=cycle,
                n_elems=mesh.n_elems,
                J_H=res.J_H,
                eta=res.eta,
                eta_bound=res.eta_bound,
                effectivity=res.effectivity,
            )
        )
        if cycle == n_cycles - 1:
            break
        tgt = target or 2 * mesh.n_elems
        mesh = adapt_mesh(mesh, res.elem_error, tgt)
    return out

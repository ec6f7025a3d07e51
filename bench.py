"""Headline benchmark: element-Jacobian assembly throughput on TPU.

Measures the hot loop of the framework — batched per-IP constitutive
Newton solves + statically condensed element Jacobians
(dR/dx + dR/dxi (dC/dxi)^{-1} dC/dx) + EBE scatter — the analog of the
reference's eval_forward_jacobian element loop
(reference: source/calibr8/src/evaluations.cpp:12-154), which is the
dominant cost of every primal Newton iteration and adjoint step.

Metric: global DOFs assembled per second (GDOF/s), f32 on TPU.
vs_baseline: ratio against the driver-set north-star rate of a full
10M-DOF adjoint step in 2 s (0.005 GDOF/s) — no reference-published
numbers exist (BASELINE.md).

Prints ONE JSON line.
"""

import json
import os
import time

os.environ["CALIBR8_X64"] = "0"  # f32 benchmarking path on TPU

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.problem import Problem

    n = int(os.environ.get("BENCH_CUBE_N", "32"))
    deck = {
        "discretization": {
            "builtin mesh": {"type": "cube", "n": n},
            "num steps": 2,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {"type": "mechanics"},
            "local residual": {
                "type": "small_J2",
                # f32 local tolerances
                "nonlinear max iters": 30,
                "nonlinear absolute tol": 1e-5,
                "nonlinear relative tol": 1e-5,
                "materials": {
                    "body": {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0}
                },
            },
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 2, "zmin", "0.0"],
                "bc 4": [0, 1, "ymax", "0.02 * t"],
            }
        },
        "quantity of interest": {"type": "average displacement"},
    }
    prob = Problem(load_deck(deck), dtype=jnp.float32)
    disc = prob.disc
    a = prob.assembler

    # a representative deformed state (plasticity active in part of the
    # domain) so the local Newton does real work
    rng = np.random.default_rng(0)
    coords = np.asarray(disc.coords)
    u = np.stack(
        [
            -0.004 * coords[:, 0],
            0.02 * coords[:, 1],
            -0.004 * coords[:, 2],
        ],
        axis=1,
    ) + 1e-4 * rng.standard_normal((disc.n_nodes, 3))
    p = np.zeros(disc.n_nodes)
    x = disc.join(jnp.asarray(u, jnp.float32), jnp.asarray(p, jnp.float32))
    x_prev = disc.zero_x()
    xi_prev = jnp.tile(
        jnp.asarray(a.model.init_xi(), jnp.float32)[None, :],
        (disc.n_elem, 1),
    )

    from calibr8_tpu.fem import pallas_assembly

    if (
        jax.devices()[0].platform == "tpu"
        and os.environ.get("CALIBR8_PALLAS", "1") != "0"
        and pallas_assembly.supports_pallas(a)
    ):
        raw = pallas_assembly.make_pallas_assemble(a)
        prep = jax.jit(raw.prepare)(x_prev, xi_prev)
        jax.block_until_ready(prep)
        inner = jax.jit(
            lambda x, p0, p1, params: raw.assemble_prepared(
                x, p0, p1, params, trailing_J=True
            )
        )

        def assemble(x, x_prev, xi_prev, params):
            return inner(x, prep[0], prep[1], params)

    else:

        @jax.jit
        def assemble(x, x_prev, xi_prev, params):
            loc = a.local_solve(x, x_prev, xi_prev, params)
            R, J_e, diag = a.residual_and_jacobian(
                x, x_prev, loc.xi, xi_prev, loc.path, params
            )
            return R, J_e, diag, jnp.sum(loc.failed)

    # warmup / compile
    out = assemble(x, x_prev, xi_prev, prob.params0)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = assemble(x, x_prev, xi_prev, prob.params0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    gdofs_per_s = disc.n_dofs / dt / 1e9
    target = 0.005  # 10M DOF / 2 s north-star rate (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": "jacobian_assembly_gdof_per_s",
                "value": round(gdofs_per_s, 6),
                "unit": "GDOF/s",
                "vs_baseline": round(gdofs_per_s / target, 3),
                "detail": {
                    "n_elem": int(disc.n_elem),
                    "n_dofs": int(disc.n_dofs),
                    "assembly_ms": round(dt * 1e3, 3),
                    "dtype": "float32",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

"""Breakdown profile of the scale-mode ADJOINT step on the real chip.

The round-3 scale bench measured adjoint 13.7 s vs newton 9.2 s at
1.57M elems / 1.1M DOF (one v5e, f32).  This script splits one adjoint
step into its three phases and times each with the same scan
harness bench.timeit_scan uses (all iterations inside one jit —
the eager chained form over-reports by ~30 ms/dispatch tunnel RTT,
measured in scripts/ab_timing.py):

  blocks   — the chunked fused linearize producing the element-level
             adjoint blocks (dR/dx^T condensed, dC/dxi^T, dC/dp^T, ...)
  solve    — the transposed MG-preconditioned GMRES on the assembled
             node-block operator, given precomputed blocks/rhs
  full     — the whole _step_impl (blocks + solve + local updates)

Usage (TPU, tunnel up):
  PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=0 \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  python scripts/profile_adjoint_scale.py [n=64] [refs=3] [iters=3]

Prints one JSON line {n_dofs, blocks_s, solve_s, full_s, other_s}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    refs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    dtype_str = "f64" if os.environ.get("CALIBR8_X64", "0") == "1" else "f32"

    import jax
    import jax.numpy as jnp

    import bench
    from calibr8_tpu.solve import linear as linear_mod
    from calibr8_tpu.fem.bcs import zero_dbc_rows

    base_n = max(2, n >> refs) if refs else n
    prob = bench.build_problem(base_n, dtype_str, refinements=refs)
    disc = prob.disc
    hoist = disc.hoist_args(ell=True)
    mg = prob.mg_factory
    mg_hoist = mg.hoist_args() if mg is not None else None

    x, x_prev, xi_prev = bench.representative_state(prob)
    params = prob.params0

    @jax.jit
    def loc_h(st, x, x_prev, xi_prev, params):
        with disc.bind(st):
            return prob.assembler.local_solve(x, x_prev, xi_prev, params)

    loc = loc_h(hoist, x, x_prev, xi_prev, params)
    jax.block_until_ready(loc.xi)

    jfn, jconsts, f0, g0 = bench._make_adjoint_fn(
        prob, dtype_str, hoist=hoist, mg=mg
    )
    adj = None
    # rebuild the same Adjoint the bench fn wraps, for phase access
    # same lean-restart knob as bench scale mode: restart=150 OOM'd the
    # 1.1M-DOF MG adjoint compile by 77 MB of HBM
    lin_cfg = linear_mod.LinearCfg(
        method="gmres",
        tol=1e-4 if dtype_str == "f32" else 1e-8,
        max_iters=1500,
        restart=int(os.environ.get("CALIBR8_BENCH_RESTART", 50)),
        refine_iters=0,
    )
    from calibr8_tpu.solve.adjoint import Adjoint

    adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, lin_cfg, mg_factory=mg)
    bc_dofs, _ = prob.dbcs.arrays(1.0)
    aux = prob.qoi.setup_step(1, 1.0, 1.0, 2.0)

    out = {"n_elem": int(disc.n_elem), "n_dofs": int(disc.n_dofs),
           "dtype": dtype_str}

    # -- phase 1: blocks ------------------------------------------------
    # x leads the signature: timeit's chain helper adds 0*prev_out to
    # args[0], which must be a float array (hoist is integer pytrees).
    def blocks_h(x, st, x_prev, xi, xi_prev, path, params):
        with disc.bind(st):
            return adj._blocks(x, x_prev, xi, xi_prev, path, params)

    args_b = (x, hoist, x_prev, loc.xi, xi_prev, loc.path, params)
    # per-call sync harness throughout: at 1.1M DOF the scanned
    # form RESOURCE_EXHAUSTs HBM and an axon OOM wedges the client for
    # the rest of the process (see bench.timeit_sync) — and every
    # phase here is >= 100 ms, so the ~30 ms RTT is noise.
    out["blocks_s"] = bench.timeit_sync(blocks_h, args_b, iters)

    # -- phase 2: solve, given precomputed blocks ----------------------
    B = jax.jit(blocks_h)(*args_b)
    jax.block_until_ready(B["J_total_T"])
    dJ_dx, dJ_dxi, _ = adj._qoi_partials(x, x_prev, loc.xi, params, aux)
    g_modT = (g0 - dJ_dxi).T
    rhs_eT = f0.T + jnp.einsum("ije,ie->je", B["dxi_dx_T"], g_modT)
    rhs = zero_dbc_rows(-dJ_dx + disc.scatter_elem(rhs_eT.T), bc_dofs)
    nde = B["J_total_T"].shape[0]
    dgT = jnp.stack([B["J_total_T"][i, i] for i in range(nde)], axis=0)
    diag = disc.scatter_elem(dgT.T)

    import contextlib

    def solve_h(rhs, st, mst, J_T, diag):
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            return linear_mod.solve_info(
                lin_cfg, J_T, disc, diag, rhs, bc_dofs,
                transpose=True, mg=mg,
            )

    args_s = (rhs, hoist, mg_hoist, B["J_total_T"], diag)
    out["solve_s"] = bench.timeit_sync(solve_h, args_s, iters)
    z, relres = jax.jit(solve_h)(*args_s)
    out["solve_relres"] = float(relres)

    # -- full step ------------------------------------------------------
    out["full_s"] = bench.timeit_sync(
        jfn,
        (x, x_prev, loc.xi, xi_prev, loc.path, params, f0, g0) + jconsts,
        iters,
    )
    out["other_s"] = out["full_s"] - out["blocks_s"] - out["solve_s"]
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

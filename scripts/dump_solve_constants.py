"""Find embedded constants in the scale-bench SOLVE program.

Every scale program with generated_code >= 2 GB dies UNAVAILABLE at
load on the axon TPU; everything <= 1.1 GB runs (ablate logs 8/19).
generated_code at GB scale = constants baked into the executable, so
this lowers _bench_newton_split's body2 (MG make + Krylov solve) at a
small mesh ON CPU and prints every HLO constant above a size floor —
the offenders scale linearly to the 1.57M-elem mesh.

Usage: python scripts/dump_solve_constants.py [n=16] [refs=3]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CALIBR8_X64"] = "0"
os.environ.setdefault("CALIBR8_BENCH_RESTART", "50")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    refs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import contextlib

    import jax.numpy as jnp

    import bench
    from calibr8_tpu.fem.bcs import apply_dbcs_residual
    from calibr8_tpu.solve import linear as linear_mod

    base_n = max(2, n >> refs)
    prob = bench.build_problem(base_n, "f32", refinements=refs)
    disc = prob.disc
    hoist = disc.hoist_args(ell=True)
    x, x_prev, xi_prev = bench.representative_state(prob)
    params = prob.params0
    bc_dofs, bc_vals = prob.dbcs.arrays(1.0)
    mg = prob.mg_factory
    mg_hoist = mg.hoist_args() if mg is not None else None
    lin_cfg = linear_mod.LinearCfg(
        method="gmres", tol=5e-3, max_iters=800,
        restart=int(os.environ.get("CALIBR8_BENCH_RESTART", 50)),
        refine_iters=1,
    )
    fn, aux = bench.make_assemble_raw(prob, hoist=hoist)

    def body1(x, x_prev, xi_prev, params, bc_dofs, bc_vals, st, aux):
        with disc.bind(st):
            R, J_e, diag, xi, path, nfail = fn(
                x, x_prev, xi_prev, params, aux
            )
            R = apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals)
        return R, J_e, diag, xi

    def body2(J_e, diag, R, x, bc_dofs, st, mst):
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            dx, relres = linear_mod.solve_info(
                lin_cfg, J_e, disc, diag, -R, bc_dofs, mg=mg
            )
        return x + dx, jnp.linalg.norm(R), relres

    o1 = jax.eval_shape(body1, x, x_prev, xi_prev, params, bc_dofs,
                        bc_vals, hoist, aux)
    J_s, d_s, R_s = o1[1], o1[2], o1[0]
    J_e = jnp.zeros(J_s.shape, J_s.dtype)
    diag = jnp.zeros(d_s.shape, d_s.dtype)
    R = jnp.zeros(R_s.shape, R_s.dtype)

    lowered = jax.jit(body2).lower(J_e, diag, R, x, bc_dofs, hoist, mg_hoist)
    txt = lowered.as_text()
    print(f"n_elem={disc.n_elem} n_dofs={disc.n_dofs} "
          f"stablehlo_chars={len(txt)}")
    nbytes = {"f64": 8, "f32": 4, "i64": 8, "i32": 4, "i8": 1, "i1": 1,
              "f16": 2, "bf16": 2}
    tot = 0
    rows = []
    for m in re.finditer(
        r"stablehlo\.constant dense<[^>]*> : tensor<([0-9x]+)x([a-z0-9]+)>",
        txt,
    ):
        dims, dt = m.group(1), m.group(2)
        sz = 1
        for d in dims.split("x"):
            sz *= int(d)
        b = sz * nbytes.get(dt, 4)
        if b >= 1 << 12:
            rows.append((b, f"tensor<{dims}x{dt}>"))
        tot += b
    rows.sort(reverse=True)
    from collections import Counter

    c = Counter(r[1] for r in rows)
    print(f"total_constant_bytes={tot} ({tot/1e6:.1f} MB at n={n})")
    for shape, cnt in c.most_common(25):
        b = next(b for b, s in rows if s == shape)
        print(f"  {cnt:4d} x {shape:<30s} {b/1e3:10.1f} kB each "
              f"{cnt*b/1e6:10.2f} MB total")


if __name__ == "__main__":
    main()

"""Compile-only ablation of the scale SOLVE program's generated-code
size.  Every n=64 scale program with generated_code >= 2.0 GB dies
UNAVAILABLE at load (axon ships the executable through a channel with
a ~2 GB protobuf ceiling); everything <= 1.1 GB loads and runs.  The
StableHLO has ZERO embedded constants (scripts/dump_solve_constants.py),
so the bloat is backend code — this AOT-compiles pieces of body2
(MG make / V-cycle applies / Krylov loop) and prints each piece's
memory_analysis to attribute it.  Compile-only: no execution, so no
fault risk to the axon client.

Usage (TPU): python scripts/ablate_code_size.py [n=64] [refs=3] [probe...]
probes: onelevel make2 restart10 (default: all)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("CALIBR8_ELEM_CHUNK", "65536")


def report(tag, lowered):
    comp = lowered.compile()
    ma = comp.memory_analysis()
    print(json.dumps({
        "tag": tag,
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "arg_gb": round(ma.argument_size_in_bytes / 1e9, 3),
        "code_gb": round(ma.generated_code_size_in_bytes / 1e9, 4),
    }), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    refs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    probes = set(sys.argv[3:]) or {"onelevel", "make2", "restart10"}
    import contextlib

    import jax
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
    mg_hoist = mg.hoist_args()
    fn, aux = bench.make_assemble_raw(prob, hoist=hoist)

    def body1(x, x_prev, xi_prev, params, bc_dofs, bc_vals, st, aux):
        with disc.bind(st):
            R, J_e, diag, xi, path, nfail = fn(
                x, x_prev, xi_prev, params, aux
            )
            R = apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals)
        return R, J_e, diag, xi

    o1s = jax.eval_shape(body1, x, x_prev, xi_prev, params, bc_dofs,
                         bc_vals, hoist, aux)
    J_e = jnp.zeros(o1s[1].shape, o1s[1].dtype)
    diag = jnp.zeros(o1s[2].shape, o1s[2].dtype)
    R = jnp.zeros(o1s[0].shape, o1s[0].dtype)

    def solve_body(restart, use_mg):
        cfg = linear_mod.LinearCfg(
            method="gmres", tol=5e-3, max_iters=800,
            restart=restart, refine_iters=1,
        )
        m = mg if use_mg else None

        def body2(J_e, diag, R, x, bc_dofs, st, mst):
            ctx = m.bind(mst) if m is not None else contextlib.nullcontext()
            with disc.bind(st), ctx:
                dx, relres = linear_mod.solve_info(
                    cfg, J_e, disc, diag, -R, bc_dofs, mg=m
                )
            return x + dx, relres

        return body2

    def mg_applies(k):
        def f(J_e, diag, r, st, mst):
            from calibr8_tpu.solve.ellpack import EllOperator

            with disc.bind(st), mg.bind(mst):
                op = EllOperator(disc, J_e, diag, bc_dofs)
                M = mg.make(J_e, diag, bc_dofs, op)
                for _ in range(k):
                    r = M(r)
                return r
        return f

    a2 = (J_e, diag, R, x, bc_dofs, hoist, mg_hoist)
    if "cycle" in probes:
        # cycle-composition attribution: make+1apply under each
        # CALIBR8_MG_ABLATE knob (knobs are read at trace time inside
        # _make_recursive, so setting the env between lowers works)
        margs = (J_e, diag, R, hoist, mg_hoist)
        for knob in ("", "nop", "nosmooth", "nocoarse", "nolmax",
                     "nop nosmooth nocoarse nolmax"):
            os.environ["CALIBR8_MG_ABLATE"] = knob
            report(f"make1[{knob or 'base'}]",
                   jax.jit(mg_applies(1)).lower(*margs))
        os.environ["CALIBR8_MG_ABLATE"] = ""
    if "onelevel" in probes:
        # Krylov loop code WITHOUT the V-cycle (block-GS precond)
        report("solve_onelevel_r50",
               jax.jit(solve_body(50, False)).lower(*a2))
    if "make2" in probes:
        # make+0 / make+2 applies: slope = per-apply code, intercept =
        # make code (make+1 measured 1.087 on 8/19)
        margs = (J_e, diag, R, hoist, mg_hoist)
        report("mg_make_0apply", jax.jit(mg_applies(0)).lower(*margs))
        report("mg_make_2apply", jax.jit(mg_applies(2)).lower(*margs))
    if "restart10" in probes:
        report("solve_mg_r10", jax.jit(solve_body(10, True)).lower(*a2))


if __name__ == "__main__":
    main()

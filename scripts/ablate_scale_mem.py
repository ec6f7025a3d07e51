"""On-chip HBM ablation for the n=64 scale newton fault: AOT-compile
(1) the one-level newton step and (2) the MG make+one-apply alone, and
print each program's memory_analysis.  The full MG newton declares
temp 8.5-9.4 GB + 3.5 GB generated code and dies UNAVAILABLE at run
start on a 16 GB v5e; n=48 (6.7 GB total) runs.  This attributes the
unaccounted GBs (suspect: the level-1 Galerkin build over 1.57M fine
elements).

Usage (TPU): python scripts/ablate_scale_mem.py [n=64] [refs=3]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("CALIBR8_ELEM_CHUNK", "65536")
os.environ.setdefault("CALIBR8_BENCH_RESTART", "40")


def report(tag, comp, args=None):
    ma = comp.memory_analysis()
    print(json.dumps({
        "tag": tag,
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "arg_gb": round(ma.argument_size_in_bytes / 1e9, 3),
        "code_gb": round(ma.generated_code_size_in_bytes / 1e9, 3),
    }), flush=True)
    if args is not None and os.environ.get("CALIBR8_ABLATE_RUN", "1") == "1":
        # EXECUTE too: the fault localizer — the first stage that
        # faults the chip names the culprit (a fault wedges the whole
        # process, so stage order in the log is the bisect)
        import jax

        out = comp(*args)
        jax.block_until_ready(out)
        print(json.dumps({"tag": tag, "ran": True}), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    refs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    import jax.numpy as jnp
    import bench

    base_n = max(2, n >> refs)
    prob = bench.build_problem(base_n, "f32", refinements=refs)
    disc = prob.disc
    hoist = disc.hoist_args(ell=True)
    x, x_prev, xi_prev = bench.representative_state(prob)
    params = prob.params0
    bc_dofs, bc_vals = prob.dbcs.arrays(1.0)

    # (1) one-level newton (mg=None)
    body, consts = bench._newton_fn(prob, "f32", None, hoist=hoist)
    args = (x, x_prev, xi_prev, params, bc_dofs, bc_vals) + consts
    report(
        "newton_onelevel", jax.jit(body).lower(*args).compile(), args
    )

    # (2) MG make + one cycle apply, from a precomputed J_e
    mg = prob.mg_factory
    mg_hoist = mg.hoist_args()
    fn, aux = bench.make_assemble_raw(prob, hoist=hoist)

    @jax.jit
    def get_j(st, x, x_prev, xi_prev, params, aux):
        with disc.bind(st):
            R, J_e, diag, xi, path, nfail = fn(
                x, x_prev, xi_prev, params, aux
            )
        return R, J_e, diag

    R, J_e, diag = get_j(hoist, x, x_prev, xi_prev, params, aux)
    jax.block_until_ready(J_e)

    def mg_only(J_e, diag, r, st, mst):
        from calibr8_tpu.solve.ellpack import EllOperator

        with disc.bind(st), mg.bind(mst):
            op = EllOperator(disc, J_e, diag, bc_dofs)
            M = mg.make(J_e, diag, bc_dofs, op)
            return M(r)

    r0 = jnp.asarray(R)
    margs = (J_e, diag, r0, hoist, mg_hoist)
    report(
        "mg_make_apply", jax.jit(mg_only).lower(*margs).compile(), margs
    )


if __name__ == "__main__":
    main()

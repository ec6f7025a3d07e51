"""MG preconditioner cost breakdown on the TPU bench problem.

Splits the newton_mg step into:
  * hierarchy-state build (mg.make_state: Galerkin coarse ops, level
    ELL assembly, power-iteration lmax, Newton-Schulz coarse inverse),
  * closure rebuild + one V-cycle apply (mg.make(state=...) + M(v)),
by timing state-build and state+k applies for k in {1, 2, 6} with the
scan harness and fitting the line.  Decides the preconditioner-lag
payoff (MueLu reuse discipline, linear_solve.cpp:36-123) and where the
per-Krylov-iteration time goes.

Usage (TPU):
  PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=0 \
  python scripts/profile_mg.py [n=8] [refs=2]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    refs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dtype_str = "f64" if os.environ.get("CALIBR8_X64", "0") == "1" else "f32"

    import jax
    import jax.numpy as jnp

    import bench
    from calibr8_tpu.solve import linear as linear_mod

    prob = bench.build_problem(n, dtype_str, refinements=refs)
    disc = prob.disc
    mg = prob.mg_factory
    hoist = disc.hoist_args(ell=True)
    mg_hoist = mg.hoist_args()

    x, x_prev, xi_prev = bench.representative_state(prob)
    params = prob.params0
    bc_dofs, bc_vals = prob.dbcs.arrays(1.0)

    out = {"n_elem": int(disc.n_elem), "n_dofs": int(disc.n_dofs)}

    # assemble once through the same path the bench uses (the Pallas
    # fast path needs its PREPARED element state threaded as aux)
    fn, aux = bench.make_assemble_raw(prob, hoist=hoist)

    @jax.jit
    def asm(st, x, x_prev, xi_prev, params, aux):
        with disc.bind(st):
            R, J_e, diag, xi, path, nfail = fn(
                x, x_prev, xi_prev, params, aux
            )
        return J_e, diag

    J_e, diag = asm(hoist, x, x_prev, xi_prev, params, aux)
    jax.block_until_ready((J_e, diag))
    v0 = jnp.ones((disc.n_dofs,), disc.dtype)
    cfg = linear_mod.LinearCfg(method="gmres", tol=1e-4)
    use_state = getattr(mg, "recursive", False)

    if use_state:
        # hierarchy-state build alone (its own program, as in the
        # three-program split benches)
        def build_state(J_e, diag, st, mst):
            with disc.bind(st), mg.bind(mst):
                return linear_mod.mg_make_state(
                    cfg, J_e, disc, diag, bc_dofs, mg
                )

        out["make_state_s"] = bench.timeit_scan(
            build_state, (J_e, diag, hoist, mg_hoist), 5,
            lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0],
        )
        print(json.dumps({"make_state_s": out["make_state_s"]}), flush=True)
        jst = jax.jit(build_state)(J_e, diag, hoist, mg_hoist)
        jax.block_until_ready(jst)
    else:
        jst = None

    def make_applies(k):
        def body(v, J_e, diag, st, mst, mg_state):
            with disc.bind(st), mg.bind(mst):
                M = mg.make(J_e, diag, bc_dofs, None, state=mg_state)
                for _ in range(k):
                    v = M(v)
                return v

        return body

    ts = {}
    for k in (1, 2, 6):
        body = make_applies(k)
        dt = bench.timeit_scan(
            body, (v0, J_e, diag, hoist, mg_hoist, jst), 5,
            lambda o: o.ravel()[0],
        )
        ts[k] = dt
        print(json.dumps({f"rebuild_plus_{k}_applies_s": dt}), flush=True)

    apply_s = (ts[6] - ts[1]) / 5.0
    out["vcycle_apply_s"] = apply_s
    out["closure_rebuild_s"] = ts[1] - apply_s

    # apply-cost attribution via the trace-time ablation knobs
    # (CALIBR8_MG_ABLATE, solve/mg.py): each setting re-traces a
    # 2-apply body; (full - ablated)/2 per-apply attributes the piece.
    # state is rebuilt per setting — nosmooth/nolmax change which
    # state entries exist.
    if use_state:
        for abl in ("nosmooth", "nop", "nocoarse"):
            os.environ["CALIBR8_MG_ABLATE"] = abl
            try:
                jst_a = jax.jit(build_state)(J_e, diag, hoist, mg_hoist)
                jax.block_until_ready(jst_a)

                def body2(v, J_e, diag, st, mst, mg_state):
                    with disc.bind(st), mg.bind(mst):
                        M = mg.make(J_e, diag, bc_dofs, None, state=mg_state)
                        return M(M(v))

                dt = bench.timeit_scan(
                    body2, (v0, J_e, diag, hoist, mg_hoist, jst_a), 5,
                    lambda o: o.ravel()[0],
                )
                key = f"apply2_{abl}_s"
                out[key] = dt
                print(json.dumps({key: dt}), flush=True)
            except Exception as e:  # noqa: BLE001
                out[f"apply2_{abl}_error"] = repr(e)[:200]
            finally:
                os.environ.pop("CALIBR8_MG_ABLATE", None)

    # ELL matvec (the other per-Krylov-iteration cost)
    from calibr8_tpu.solve.ellpack import EllOperator

    def mv(v, J_e, diag, st):
        with disc.bind(st):
            op = EllOperator(disc, J_e, diag, bc_dofs)
            return op(v)

    out["ell_build_plus_matvec_s"] = bench.timeit_scan(
        mv, (v0, J_e, diag, hoist), 5, lambda o: o.ravel()[0]
    )
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

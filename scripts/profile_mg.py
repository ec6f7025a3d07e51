"""MG preconditioner cost breakdown on the TPU bench problem.

Splits the newton_mg step into:
  * hierarchy build (MGPrecondFactory.make: Galerkin coarse ops +
    Newton-Schulz coarse inverse), and
  * one V-cycle apply,
by timing make+k applies for k in {1, 2, 6} with the scan harness and
fitting the line.  Guides whether a preconditioner-lag (freeze the
hierarchy across Newton iterations) is worth building.

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

    prob = bench.build_problem(n, dtype_str, refinements=refs)
    disc = prob.disc
    mg = prob.mg_factory
    hoist = disc.hoist_args(ell=True)
    mg_hoist = mg.hoist_args()

    x, x_prev, xi_prev = bench.representative_state(prob)
    params = prob.params0
    bc_dofs, bc_vals = prob.dbcs.arrays(1.0)

    out = {"n_elem": int(disc.n_elem), "n_dofs": int(disc.n_dofs)}

    # assemble once (eager, jitted) to get J_e/diag for the breakdown
    @jax.jit
    def asm(st, x, x_prev, xi_prev, params):
        with disc.bind(st):
            s = prob.step_solver
            return s._assemble(
                x, x_prev, xi_prev, params, bc_dofs, bc_vals,
                jnp.zeros_like(x),
            )

    base = asm(hoist, x, x_prev, xi_prev, params)
    J_e, diag = base["J_e"], base["diag"]
    v0 = jnp.ones((disc.n_dofs,), disc.dtype)

    def make_applies(k):
        def fn(v, J_e, diag, st, mst):
            with disc.bind(st), mg.bind(mst):
                M = mg.make(J_e, diag, bc_dofs, None)
                for _ in range(k):
                    v = M(v)
                return v
        return fn

    ts = {}
    for k in (1, 2, 6):
        fn = make_applies(k)
        dt = bench.timeit_scan(
            fn, (v0, J_e, diag, hoist, mg_hoist), 5, lambda o: o.ravel()[0]
        )
        ts[k] = dt
        print(json.dumps({f"make_plus_{k}_applies_s": dt}), flush=True)

    apply_s = (ts[6] - ts[1]) / 5.0
    make_s = ts[1] - apply_s
    out["vcycle_apply_s"] = apply_s
    out["hierarchy_make_s"] = make_s

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

"""MG preconditioner cost breakdown on the TPU bench problem.

Splits the newton_mg step into:
  * hierarchy-state build (mg.make_state: Galerkin coarse ops, level
    ELL assembly, power-iteration lmax, Newton-Schulz coarse inverse),
  * closure rebuild + one V-cycle apply (mg.make(state=...) + M(v)),
by timing state-build eagerly (it is a seconds-scale program — the
~30 ms tunnel RTT is noise there) and state+k applies for k in {1, 6}
with the scan harness and differencing the line.  Decides the
preconditioner-lag payoff (MueLu reuse discipline,
linear_solve.cpp:36-123) and where the per-Krylov-iteration time goes.

Memory discipline (the round-5 lesson: the first cut of this script
RESOURCE_EXHAUSTED the chip at n=32): every phase runs inside its own
try/except and frees its device objects before the next phase; the
make_state timing is eager (scanning a hierarchy build pins ~5x its
output liveness); each ablation's state is deleted after its timing.
Every phase flushes its own JSON line so a fault in one phase still
leaves the earlier evidence.

Usage (TPU):
  PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=0 \
  python scripts/profile_mg.py [n=8] [refs=2]
"""

import json
import os
import sys
import time

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

    base_n = max(2, n >> refs) if refs else n
    prob = bench.build_problem(base_n, dtype_str, refinements=refs)
    disc = prob.disc
    mg = prob.mg_factory
    hoist = disc.hoist_args(ell=True)
    mg_hoist = mg.hoist_args()

    x, x_prev, xi_prev = bench.representative_state(prob)
    params = prob.params0
    bc_dofs, bc_vals = prob.dbcs.arrays(1.0)

    out = {"n_elem": int(disc.n_elem), "n_dofs": int(disc.n_dofs)}
    print(json.dumps(out), flush=True)

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
    del x, x_prev, xi_prev, aux, fn
    v0 = jnp.ones((disc.n_dofs,), disc.dtype)
    cfg = linear_mod.LinearCfg(method="gmres", tol=1e-4)
    use_state = getattr(mg, "recursive", False)

    jst = None
    if use_state:
        def build_state(J_e, diag, st, mst):
            with disc.bind(st), mg.bind(mst):
                return linear_mod.mg_make_state(
                    cfg, J_e, disc, diag, bc_dofs, mg
                )

        try:
            bs = jax.jit(build_state)
            jst = bs(J_e, diag, hoist, mg_hoist)
            jax.block_until_ready(jst)
            # eager timing: seconds-scale program, RTT is noise
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                jst2 = bs(J_e, diag, hoist, mg_hoist)
                jax.block_until_ready(jst2)
                reps.append(time.perf_counter() - t0)
                del jst2
            out["make_state_s"] = min(reps)
            print(json.dumps({"make_state_s": out["make_state_s"]}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            out["make_state_error"] = repr(e)[:300]
            print(json.dumps({"make_state_error": out["make_state_error"]}),
                  flush=True)

    def make_applies(k):
        def body(v, J_e, diag, st, mst, mg_state):
            with disc.bind(st), mg.bind(mst):
                M = mg.make(J_e, diag, bc_dofs, None, state=mg_state)
                for _ in range(k):
                    v = M(v)
                return v

        return body

    ts = {}
    for k in (1, 6):
        try:
            dt = bench.timeit_scan(
                make_applies(k), (v0, J_e, diag, hoist, mg_hoist, jst), 5,
                lambda o: o.ravel()[0],
            )
            ts[k] = dt
            print(json.dumps({f"rebuild_plus_{k}_applies_s": dt}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            out[f"applies_{k}_error"] = repr(e)[:300]
            print(json.dumps({f"applies_{k}_error": out[f"applies_{k}_error"]}),
                  flush=True)

    if 1 in ts and 6 in ts:
        apply_s = (ts[6] - ts[1]) / 5.0
        out["vcycle_apply_s"] = apply_s
        out["closure_rebuild_s"] = ts[1] - apply_s

    # apply-cost attribution via the trace-time ablation knobs
    # (CALIBR8_MG_ABLATE, solve/mg.py): each setting re-traces a
    # 2-apply body; (full - ablated)/2 per-apply attributes the piece.
    # state is rebuilt per setting — nosmooth/nolmax change which
    # state entries exist — and freed before the next one.
    if use_state and jst is not None:
        def body2(v, J_e, diag, st, mst, mg_state):
            with disc.bind(st), mg.bind(mst):
                M = mg.make(J_e, diag, bc_dofs, None, state=mg_state)
                return M(M(v))

        for abl in ("nosmooth", "nop", "nocoarse"):
            os.environ["CALIBR8_MG_ABLATE"] = abl
            jst_a = None
            try:
                jst_a = jax.jit(build_state)(J_e, diag, hoist, mg_hoist)
                jax.block_until_ready(jst_a)
                dt = bench.timeit_scan(
                    body2, (v0, J_e, diag, hoist, mg_hoist, jst_a), 5,
                    lambda o: o.ravel()[0],
                )
                key = f"apply2_{abl}_s"
                out[key] = dt
                print(json.dumps({key: dt}), flush=True)
            except Exception as e:  # noqa: BLE001
                out[f"apply2_{abl}_error"] = repr(e)[:200]
                print(json.dumps(
                    {f"apply2_{abl}_error": out[f"apply2_{abl}_error"]}
                ), flush=True)
            finally:
                del jst_a
                os.environ.pop("CALIBR8_MG_ABLATE", None)

    # ELL matvec (the other per-Krylov-iteration cost)
    from calibr8_tpu.solve.ellpack import EllOperator

    def mv(v, J_e, diag, st):
        with disc.bind(st):
            op = EllOperator(disc, J_e, diag, bc_dofs)
            return op(v)

    try:
        out["ell_build_plus_matvec_s"] = bench.timeit_scan(
            mv, (v0, J_e, diag, hoist), 5, lambda o: o.ravel()[0]
        )
    except Exception as e:  # noqa: BLE001
        out["ell_matvec_error"] = repr(e)[:200]
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

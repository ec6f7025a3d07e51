"""Pin the level-0 ELL matvec cost at the scale mesh.

profile_mg at n=64 attributes 0.49 s of the 0.83 s V-cycle apply to
the smoothers — ~80 ms per level-0 matvec-equivalent against a ~3 ms
HBM roofline (A_T 148 MB + padded gather ~2.3 GB).  This probe times
the pieces in isolation on the REAL state arrays:

  * LevelEllOperator apply (stencil and gather forms)
  * gather_T alone (the neighbor gather / static slices)
  * the einsum/Pallas contraction alone (pre-gathered G_T)
  * node-block dinv apply (the Chebyshev building block)

Usage (TPU):
  PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=0 \
  python scripts/probe_level_matvec.py [n=64] [refs=3]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("CALIBR8_MG_CHEB_DEGREE", "2")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    refs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    dtype_str = "f64" if os.environ.get("CALIBR8_X64", "0") == "1" else "f32"

    import jax
    import jax.numpy as jnp

    import bench
    from calibr8_tpu.solve.ellpack import (
        LevelEllOperator, build_ell_maps, gather_T,
    )

    base_n = max(2, n >> refs) if refs else n
    prob = bench.build_problem(base_n, dtype_str, refinements=refs)
    disc = prob.disc
    hoist = disc.hoist_args(ell=True)
    x, x_prev, xi_prev = bench.representative_state(prob)
    params = prob.params0
    bc_dofs, _ = prob.dbcs.arrays(1.0)
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

    d = disc.spec.dim
    maps = build_ell_maps(disc)
    out = {
        "n_elem": int(disc.n_elem),
        "n_nodes": int(disc.n_nodes),
        "K": int(maps["K"]),
        "stencil": maps["offsets"] is not None,
    }
    print(json.dumps(out), flush=True)

    # u-block trailing Jacobian (nde_u x nde_u slices of the mixed
    # element blocks), the exact thing the MG level-0 operator applies
    npe = disc.spec.npe
    m = disc.ndpn

    # full node-block operator over ALL dofs (u+p), the fine ELL form
    def lvl_apply(A_T, v):
        op = LevelEllOperator.from_assembled(
            A_T, jnp.asarray(maps["nbr"]), maps["K"], disc.n_nodes, m,
            offsets=maps["offsets"],
        )
        return op(v)

    ids = jnp.asarray(maps["ell_ids_T"])
    probe_op = LevelEllOperator(
        jnp.moveaxis(J_e, 0, -1) if J_e.shape[0] == disc.n_elem else J_e,
        jnp.asarray(maps["nbr"]), ids, maps["K"], disc.n_nodes, m,
        offsets=maps["offsets"],
    )
    A_Tp = probe_op.A_T
    out["A_T_bytes"] = int(A_Tp.size * A_Tp.dtype.itemsize)

    v0 = jnp.ones((disc.n_nodes * m,), disc.dtype)

    def mv(v, A_Tp):
        op = LevelEllOperator.from_assembled(
            A_Tp, jnp.asarray(maps["nbr"]), maps["K"], disc.n_nodes, m,
            offsets=maps["offsets"],
        )
        return op(v)

    try:
        dt = bench.timeit_scan(mv, (v0, A_Tp), 10, lambda o: o.ravel()[0])
        out["lvl0_matvec_s"] = dt
        print(json.dumps({"lvl0_matvec_s": dt}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"lvl0_matvec_error": repr(e)[:200]}), flush=True)

    # gather alone
    X0 = jnp.ones((disc.n_nodes, m), disc.dtype)

    def gat(X):
        G = gather_T(X, jnp.asarray(maps["nbr"]), disc.n_nodes, m,
                     maps["offsets"])
        return G.sum(axis=(0, 1))  # reduce to keep it live, (n,) out

    try:
        dt = bench.timeit_scan(
            gat, (X0,), 10, lambda o: o.ravel()[0], chain_idx=0
        )
        out["gather_s"] = dt
        print(json.dumps({"gather_s": dt}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"gather_error": repr(e)[:200]}), flush=True)

    # dinv-style node-block apply (3x3 blocks, trailing)
    B = jnp.ones((m, m, disc.n_nodes), disc.dtype)

    def dinv_apply(X):
        # X (n, m) -> trailing (m, n), block matvec, back
        XT = X.T
        rows = [
            sum(B[i, j] * XT[j] for j in range(m)) for i in range(m)
        ]
        return jnp.stack(rows, axis=1).T  # (n, m)

    try:
        dt = bench.timeit_scan(
            dinv_apply, (X0,), 10, lambda o: o.ravel()[0]
        )
        out["dinv_apply_s"] = dt
        print(json.dumps({"dinv_apply_s": dt}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"dinv_error": repr(e)[:200]}), flush=True)

    out["device"] = str(jax.devices()[0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

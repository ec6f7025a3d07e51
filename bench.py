"""Headline benchmarks on the real TPU chip.

Measures the three north-star quantities (BASELINE.md 'Performance
targets'):

  * assembly        — element-Jacobian assembly throughput (GDOF/s):
                      batched per-IP constitutive Newton + statically
                      condensed element Jacobians + EBE scatter, the
                      analog of eval_forward_jacobian
                      (reference: source/calibr8/src/evaluations.cpp:12-154);
  * newton_step     — one full primal Newton iteration: assembly +
                      block-preconditioned GMRES solve + DBC handling
                      (primal.cpp:31-209 analog);
  * adjoint_step    — one backward adjoint step: fused element blocks,
                      transposed solve, local back-substitution and
                      parameter-gradient accumulation
                      (adjoint.cpp:76-189, evaluations.cpp:349-930);

each in f32 and f64 (the reference is f64-only; CALIBR8_X64 gates the
dtype because TPU f64 is emulated), plus a roofline estimate from
XLA's compiled cost analysis (flops + bytes accessed vs v5e peaks).

The driver contract is ONE JSON line: the headline metric stays f32
assembly GDOF/s (vs the 0.005 GDOF/s north-star rate = 10M-DOF adjoint
step in 2 s); everything else rides in "detail".  Sub-benchmarks run
in subprocesses (`bench.py --mode ... --dtype ...`) so each gets a
clean x64 configuration.
"""

import argparse
import json
import os
import subprocess
import sys
import time


def build_problem(n, dtype_str, refinements=0):
    import jax.numpy as jnp

    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.problem import Problem

    tol = 1e-5 if dtype_str == "f32" else 1e-12
    mesh_spec = {"type": "cube", "n": n}
    if refinements:
        mesh_spec["refinements"] = refinements
    deck = {
        "discretization": {
            "builtin mesh": mesh_spec,
            "num steps": 2,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {"type": "mechanics"},
            "local residual": {
                "type": "small_J2",
                "nonlinear max iters": 30,
                "nonlinear absolute tol": tol,
                "nonlinear relative tol": tol,
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
    if refinements:
        deck["linear algebra"] = {"preconditioner": "multigrid"}
    dtype = jnp.float32 if dtype_str == "f32" else jnp.float64
    return Problem(load_deck(deck), dtype=dtype)


def representative_state(prob):
    """A deformed state with active plasticity so the local Newton and
    the linear solve do real work."""
    import jax.numpy as jnp
    import numpy as np

    disc = prob.disc
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
    x = disc.join(
        jnp.asarray(u, disc.dtype), jnp.asarray(p, disc.dtype)
    )
    x_prev = disc.zero_x()
    xi_prev = jnp.tile(
        jnp.asarray(prob.assembler.model.init_xi(), disc.dtype)[None, :],
        (disc.n_elem, 1),
    )
    return x, x_prev, xi_prev


def make_assemble(prob):
    """Jitted assembly closure (Pallas fast path on TPU when the model
    supports it)."""
    import jax

    a = prob.assembler
    from calibr8_tpu.fem import pallas_assembly

    if (
        jax.devices()[0].platform == "tpu"
        and os.environ.get("CALIBR8_PALLAS", "1") != "0"
        and prob.disc.dtype == jax.numpy.float32
        and pallas_assembly.supports_pallas(a)
    ):
        raw = pallas_assembly.make_pallas_assemble(a)
        x, x_prev, xi_prev = representative_state(prob)
        prep = jax.jit(raw.prepare)(x_prev, xi_prev)
        jax.block_until_ready(prep)
        inner = jax.jit(
            lambda x, p0, p1, params: raw.assemble_prepared(
                x, p0, p1, params, trailing_J=True
            )
        )

        def assemble(x, x_prev, xi_prev, params):
            R, J_e, diag, xi, path, nfail = inner(x, prep[0], prep[1], params)
            return R, J_e, diag, xi, path, nfail

        return assemble

    import jax.numpy as jnp

    @jax.jit
    def assemble(x, x_prev, xi_prev, params):
        loc = a.local_solve(x, x_prev, xi_prev, params)
        R, J_e, diag = a.residual_and_jacobian(
            x, x_prev, loc.xi, xi_prev, loc.path, params
        )
        return R, J_e, diag, loc.xi, loc.path, jnp.sum(loc.failed)

    return assemble


def timeit(fn, args, iters):
    import jax

    out = fn(*args)  # warmup/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def cost_analysis(fn, args):
    """XLA-reported flops and bytes for one call (roofline inputs)."""
    import jax

    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(
            c.get("bytes accessed", 0.0)
        )
    except Exception:
        return 0.0, 0.0


def run_mode(mode, dtype_str, n):
    import jax
    import jax.numpy as jnp

    refinements = 2 if mode == "newton_mg" else 0
    if mode == "newton_mg":
        mode = "newton"
    prob = build_problem(n, dtype_str, refinements=refinements)
    disc = prob.disc
    x, x_prev, xi_prev = representative_state(prob)
    params = prob.params0
    iters = 10 if dtype_str == "f32" else 5
    out = {"n_elem": int(disc.n_elem), "n_dofs": int(disc.n_dofs)}

    if mode == "assembly":
        assemble = make_assemble(prob)
        dt = timeit(assemble, (x, x_prev, xi_prev, params), iters)
        out["seconds"] = dt
        out["gdof_per_s"] = disc.n_dofs / dt / 1e9
        # roofline for the XLA (non-Pallas) path: cost_analysis sees
        # through jit but is blind to Pallas kernels, so the ratio is
        # computed against the XLA path's OWN measured time — the gap
        # between xla_seconds and seconds is the Pallas speedup
        a = prob.assembler

        def xla_assemble(x, x_prev, xi_prev, params):
            loc = a.local_solve(x, x_prev, xi_prev, params)
            return a.residual_and_jacobian(
                x, x_prev, loc.xi, xi_prev, loc.path, params
            )

        flops, bytes_ = cost_analysis(
            xla_assemble, (x, x_prev, xi_prev, params)
        )
        out["xla_flops"] = flops
        out["xla_bytes"] = bytes_
        try:
            xla_fn = jax.jit(xla_assemble)
            dt_xla = timeit(
                xla_fn, (x, x_prev, xi_prev, params), max(iters // 2, 2)
            )
            out["xla_seconds"] = dt_xla
            out["pallas_speedup"] = dt_xla / dt
            # v5e: 819 GB/s HBM — the binding resource for this
            # scatter/gather-heavy computation
            out["xla_achieved_gb_s"] = bytes_ / dt_xla / 1e9
            out["xla_hbm_roofline_fraction"] = (bytes_ / dt_xla) / 819e9
            # the useful-bytes floor: state in + R/J/diag out once
            useful = (
                x.nbytes * 2
                + xi_prev.nbytes * 2
                + disc.n_elem
                * (disc.spec.ndofs_elem**2 + 2 * disc.spec.ndofs_elem)
                * x.dtype.itemsize
            )
            out["useful_bytes"] = useful
            out["pallas_bw_fraction_of_useful"] = (useful / dt) / 819e9
        except Exception as e:  # noqa: BLE001
            out["xla_time_error"] = str(e)[-200:]

    elif mode == "newton":
        from calibr8_tpu.fem.bcs import apply_dbcs_residual
        from calibr8_tpu.solve import linear as linear_mod

        assemble = make_assemble(prob)
        bc_dofs, bc_vals = prob.dbcs.arrays(1.0)
        # to-convergence budget (max_iters counts TOTAL inner
        # iterations; solve_relres in the output verifies the solve
        # actually reached tol — one-level block-GS needs ~400 at 196k
        # elements, the MG variant a small fraction of that)
        # f32 attainable accuracy at this conditioning is ~1e-2 relative
        # (eps32 * kappa); Newton is inexact anyway.  solve_relres in
        # the output reports what was actually reached.
        lin_cfg = linear_mod.LinearCfg(
            method="gmres",
            tol=5e-3 if dtype_str == "f32" else 1e-6,
            max_iters=800,
            restart=100,
            refine_iters=1,
        )

        mg = prob.mg_factory if refinements else None

        @jax.jit
        def newton_step(x, x_prev, xi_prev, params, bc_dofs, bc_vals):
            R, J_e, diag, xi, path, nfail = assemble(
                x, x_prev, xi_prev, params
            )
            R = apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals)
            dx, relres = linear_mod.solve_info(
                lin_cfg, J_e, disc, diag, -R, bc_dofs, mg=mg
            )
            return x + dx, xi, jnp.linalg.norm(R), relres

        dt = timeit(
            newton_step, (x, x_prev, xi_prev, params, bc_dofs, bc_vals), iters
        )
        out["seconds"] = dt
        out["gdof_per_s"] = disc.n_dofs / dt / 1e9
        out["solve_relres"] = float(
            newton_step(x, x_prev, xi_prev, params, bc_dofs, bc_vals)[3]
        )
        if refinements:
            out["preconditioner"] = "multigrid"

    elif mode == "adjoint":
        from calibr8_tpu.solve.adjoint import Adjoint
        from calibr8_tpu.solve import linear as linear_mod

        lin_cfg = linear_mod.LinearCfg(
            method="gmres",
            tol=1e-4 if dtype_str == "f32" else 1e-8,
            max_iters=1500,
            restart=150,
            refine_iters=0,
        )
        adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, lin_cfg)
        adj.linear_cfg = lin_cfg  # keep the benchmark tolerance
        bc_dofs, _ = prob.dbcs.arrays(1.0)
        aux = prob.qoi.setup_step(1, 1.0, 1.0, 2.0)
        loc = jax.jit(prob.assembler.local_solve)(x, x_prev, xi_prev, params)
        nde = disc.edofs.shape[1]
        f = jnp.zeros((disc.n_elem, nde), disc.dtype)
        g = jnp.zeros((disc.n_elem, prob.assembler.nxi), disc.dtype)

        def adjoint_step(x, x_prev, xi, xi_prev, path, params, f, g):
            return adj._step_impl(
                x, x_prev, xi, xi_prev, path, params, f, g, bc_dofs, aux
            )

        jfn = jax.jit(adjoint_step)
        dt = timeit(
            jfn, (x, x_prev, loc.xi, xi_prev, loc.path, params, f, g), iters
        )
        out["seconds"] = dt
        out["gdof_per_s"] = disc.n_dofs / dt / 1e9

    out["device"] = str(jax.devices()[0])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default=None)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--n", type=int, default=None)
    args = ap.parse_args()

    if args.mode is not None:
        os.environ["CALIBR8_X64"] = "0" if args.dtype == "f32" else "1"
        n = args.n or (32 if args.dtype == "f32" else 20)
        out = run_mode(args.mode, args.dtype, n)
        print(json.dumps(out))
        return

    # orchestrate: each (mode, dtype) in a fresh process for a clean
    # x64 config; sizes chosen to fit one chip comfortably
    plans = [
        ("assembly", "f32", 32),
        ("newton", "f32", 32),
        ("newton_mg", "f32", 8),  # n=8 + 2 refinements = 196k elements
        ("adjoint", "f32", 32),
        ("assembly", "f64", 20),
        ("newton", "f64", 20),
        ("adjoint", "f64", 20),
    ]
    detail = {}
    for mode, dtype, n in plans:
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--mode",
            mode,
            "--dtype",
            dtype,
            "--n",
            str(n),
        ]
        r = None
        try:
            r = subprocess.run(
                cmd,
                capture_output=True,
                text=True,
                timeout=1500,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = r.stdout.strip().splitlines()[-1]
            detail[f"{mode}_{dtype}"] = json.loads(line)
        except Exception as e:  # noqa: BLE001 — record and continue
            err = {"error": str(e)[-300:]}
            if r is not None and r.stderr:
                err["stderr_tail"] = r.stderr[-600:]
            detail[f"{mode}_{dtype}"] = err

    head = detail.get("assembly_f32", {})
    gdofs = head.get("gdof_per_s", 0.0)
    target = 0.005  # 10M DOF / 2 s north-star rate (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": "jacobian_assembly_gdof_per_s",
                "value": round(gdofs, 6),
                "unit": "GDOF/s",
                "vs_baseline": round(gdofs / target, 3) if gdofs else 0.0,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()

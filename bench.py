"""Headline benchmarks on the real TPU chip.

Measures the north-star quantities (BASELINE.md 'Performance targets'):

  * assembly        — element-Jacobian assembly throughput (GDOF/s):
                      batched per-IP constitutive Newton + statically
                      condensed element Jacobians + EBE scatter, the
                      analog of eval_forward_jacobian
                      (reference: source/calibr8/src/evaluations.cpp:12-154);
  * newton          — one full primal Newton iteration: assembly +
                      block-preconditioned GMRES solve + DBC handling
                      (primal.cpp:31-209 analog);
  * adjoint         — one backward adjoint step: fused element blocks,
                      transposed solve, local back-substitution and
                      parameter-gradient accumulation
                      (adjoint.cpp:76-189, evaluations.cpp:349-930);
  * scale           — the same three at the largest single-chip mesh
                      (>=1M DOF), plus the measured extrapolation to
                      the 10M-DOF / 2 s-per-adjoint-step north star;

in f32 and f64 (the reference is f64-only; CALIBR8_X64 gates the dtype
because TPU f64 is emulated), plus a roofline estimate from XLA's
compiled cost analysis (flops + bytes accessed vs v5e peaks).

Driver-survival contract (the round-2 record was lost to a timeout):
the headline JSON line is re-printed AFTER EVERY MODE with everything
measured so far, so the last stdout line is always a complete record
of whatever finished; a global wall-clock deadline skips remaining
modes; SIGTERM/SIGINT print the final line before exiting; and a
persistent compilation cache (.jax_cache/) makes reruns skip the
5-20 min TPU compiles.  Sub-benchmarks run in subprocesses
(`bench.py --mode ... --dtype ...`) so each gets a clean x64 config.

Even fully warm, the whole sweep exceeds a ~19 min budget (the scale
mode alone is ~10 min of host mesh setup + timed steps), so every
successful TPU sub-benchmark also persists its result JSON to
.bench_results/ (git-sha + timestamp stamped).  When the deadline cuts
a mode — or a transient tunnel error kills it — the orchestrator falls
back to that prior measured result, clearly labeled with
"cached": true, "measured_at_git"/"cached_age_s", so the record is
complete AND honest about which numbers are live vs. prior-run.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
RESULTS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_results"
)


def _enable_compile_cache():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def _git_sha():
    try:
        r = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return r.stdout.strip()
    except Exception:  # noqa: BLE001
        return ""


def _result_path(mode, dtype, n):
    return os.path.join(RESULTS_DIR, f"{mode}_{dtype}_n{n}.json")


def _save_result(mode, dtype, n, out):
    """Persist a successful TPU measurement for deadline fallback.
    CPU runs are never cached (their numbers are meaningless here)."""
    if "TPU" not in str(out.get("device", "")):
        return
    try:
        os.makedirs(RESULTS_DIR, exist_ok=True)
        with open(_result_path(mode, dtype, n), "w") as f:
            json.dump({"result": out, "ts": time.time(), "git": _git_sha()}, f)
    except Exception:  # noqa: BLE001
        pass


def _load_cached(mode, dtype, n):
    try:
        with open(_result_path(mode, dtype, n)) as f:
            rec = json.load(f)
        out = dict(rec["result"])
        out["cached"] = True
        out["measured_at_git"] = rec.get("git", "")
        out["cached_age_s"] = round(time.time() - rec.get("ts", 0.0), 1)
        return out
    except Exception:  # noqa: BLE001
        return None


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
                    "body": {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0, "cte": 0.0, "delta_T": 0.0}
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
    d = disc.spec.dim
    rng = np.random.default_rng(0)
    coords = np.asarray(disc.coords)
    u = np.stack(
        [
            (-0.004 if i != 1 else 0.02) * coords[:, i]
            for i in range(d)
        ],
        axis=1,
    ) + 1e-4 * rng.standard_normal((disc.n_nodes, d))
    if disc.spec.mixed:
        p = np.zeros(disc.n_nodes)
        x = disc.join(
            jnp.asarray(u, disc.dtype), jnp.asarray(p, disc.dtype)
        )
    else:
        x = jnp.asarray(u.reshape(-1), disc.dtype)
    x_prev = disc.zero_x()
    xi_prev = jnp.tile(
        jnp.asarray(prob.assembler.model.init_xi(), disc.dtype)[None, :],
        (disc.n_elem, 1),
    )
    return x, x_prev, xi_prev


def make_assemble_raw(prob, hoist=None):
    """UNJITTED assembly callable + aux pytree: fn(x, x_prev, xi_prev,
    params, aux) where `aux` must be threaded through the caller's jit
    arguments (it holds the Pallas path's prepared element state, which
    would otherwise be embedded as a device-array constant).  Picks the
    Pallas fast path on TPU when the model supports it."""
    import jax

    a = prob.assembler
    disc = prob.disc
    from calibr8_tpu.fem import pallas_assembly

    if (
        jax.devices()[0].platform == "tpu"
        and os.environ.get("CALIBR8_PALLAS", "1") != "0"
        and prob.disc.dtype == jax.numpy.float32
        and pallas_assembly.supports_pallas(a)
    ):
        raw = pallas_assembly.make_pallas_assemble(a)
        x, x_prev, xi_prev = representative_state(prob)
        if hoist is None:
            prep = jax.jit(raw.prepare)(x_prev, xi_prev)
        else:

            @jax.jit
            def prep_h(st, x_prev, xi_prev):
                with disc.bind(st):
                    return raw.prepare(x_prev, xi_prev)

            prep = prep_h(hoist, x_prev, xi_prev)
        jax.block_until_ready(prep)

        def fn(x, x_prev, xi_prev, params, aux):
            p0, p1 = aux
            return raw.assemble_prepared(x, p0, p1, params, trailing_J=True)

        return fn, (prep[0], prep[1])

    import jax.numpy as jnp

    def fn(x, x_prev, xi_prev, params, aux):
        loc = a.local_solve(x, x_prev, xi_prev, params)
        R, J_e, diag = a.residual_and_jacobian(
            x, x_prev, loc.xi, xi_prev, loc.path, params
        )
        return R, J_e, diag, loc.xi, loc.path, jnp.sum(loc.failed)

    return fn, ()


def make_assemble(prob, hoist=None):
    """Jitted assembly closure.  With `hoist` (disc.hoist_args()), the
    big static index/geometry arrays AND the assembly aux state pass as
    jit ARGUMENTS instead of embedded constants — required at 1M+ DOF
    where the embedded form overflows the axon remote-compile request
    (HTTP 413)."""
    import jax

    disc = prob.disc
    fn, aux = make_assemble_raw(prob, hoist=hoist)

    if hoist is None:
        inner = jax.jit(lambda x, xp, xip, params, aux: fn(x, xp, xip, params, aux))
        return lambda x, xp, xip, params: inner(x, xp, xip, params, aux)

    @jax.jit
    def body_h(st, aux, x, xp, xip, params):
        with disc.bind(st):
            return fn(x, xp, xip, params, aux)

    return lambda x, xp, xip, params: body_h(hoist, aux, x, xp, xip, params)


def timeit(fn, args, iters, chain=None):
    """Average seconds per call.

    `chain(out, args) -> args` injects a DATA DEPENDENCY of the next
    call on the previous call's output (e.g. x + 0*scalar_from_out):
    the device serializes the iterations without any host round trip.
    Blocking only on the last output let the axon tunnel's async
    dispatch under-report (round-2's newton_f64 recorded 0.2 ms for a
    full Newton step); per-call host sync over-reports by the ~30 ms
    tunnel RTT.  Chaining gives honest device time."""
    import jax

    out = fn(*args)  # warmup/compile
    jax.block_until_ready(out)
    if chain is None:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        args = chain(out, args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _chain_first_arg(scalar_of):
    """Chain helper: next x = x + 0 * (scalar from the previous out)."""

    def chain(out, args):
        s = scalar_of(out)
        return (args[0] + 0.0 * s,) + tuple(args[1:])

    return chain


def _fetch_scalar(out):
    """Force REAL completion of a dispatched program by fetching one
    scalar to host.  jax.block_until_ready is NOT a sync point on
    current axon builds (the tunnel acks dispatches pre-execution);
    only a device->host transfer waits for the data dependency."""
    import numpy as _np

    import jax as _jax

    leaves = _jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
            return float(_np.asarray(leaf.ravel()[0]))
    return None


def timeit_scan(fn, args, iters, scalar_of, chain_idx=0):
    """True per-iteration device seconds: all `iters` calls inside ONE
    jit via lax.scan, each iteration chained on the previous output's
    scalar (carry + 0.0*s keeps the loop body live — XLA cannot fold
    0*s because s may be non-finite — without changing values).

    This replaces the eager chained-dispatch `timeit`: the A/B study
    on the real chip (scripts/ab_timing.py, 196k elems, f32) measured
    the eager chain at 138 ms/iter vs 13.9 ms/iter for the scan form
    on the identical computation — every eager chain op costs a ~30 ms
    axon-tunnel dispatch, so per-iteration host round trips dominate
    anything under ~100 ms.  `fn` must be TRACEABLE (not an opaque
    jitted wrapper closing over big device constants): every array it
    needs — including disc.hoist_args() state — must arrive via `args`
    so it becomes a jit ARGUMENT, not an HLO constant (the 1M-DOF
    axon remote-compile 413 limit)."""
    import jax

    def scanned(*a):
        def body(carry, _):
            call = list(a)
            call[chain_idx] = carry
            out = fn(*call)
            s = scalar_of(out)
            return carry + (0.0 * s).astype(carry.dtype), s
        return jax.lax.scan(body, a[chain_idx], None, length=iters)

    try:
        run = jax.jit(scanned)
        out = run(*args)  # warmup/compile
        _fetch_scalar(out)
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        t_block = time.perf_counter() - t0
        # current axon builds ACK the dispatch before execution and
        # block_until_ready returns immediately (a 55-TFLOP probe
        # "completed" in 0.18 ms; newton_mg recorded 99 us/step).  A
        # VALUE FETCH is the only real synchronization: if fetching
        # after the block adds materially to the time, the block lied
        # and the fetch-inclusive time (one ~30 ms RTT per timed call,
        # amortized over iters) is the honest one.
        _fetch_scalar(out)
        t_fetch = time.perf_counter() - t0
        dt = t_fetch if (t_fetch - t_block) > 0.1 * t_fetch else t_block
        return dt / iters
    except jax.errors.JaxRuntimeError:
        # the scanned form can RESOURCE_EXHAUST where the plain program
        # fits (the while-loop body pins extra liveness right at the
        # HBM limit — hit by the 1.1M-DOF scale adjoint solve).  Fall
        # back to per-call sync.  Genuine failures (e.g. f64 pallas)
        # re-raise from the fallback — though an axon OOM can wedge the
        # client so the fallback reads UNAVAILABLE; callers near the
        # HBM limit should use timeit_sync directly.
        return timeit_sync(fn, args, iters)


def timeit_sync(fn, args, iters):
    """Per-call sync timing: over-reports by the ~30 ms tunnel RTT per
    call — negligible (<1%) for multi-second steps.  Used DIRECTLY for
    the scale-mode newton/adjoint steps: their scanned form's extra
    liveness OOMs the 16 GB HBM, and an axon RESOURCE_EXHAUSTED wedges
    the client for the rest of the process (every later call reads
    UNAVAILABLE — observed on the 1.1M-DOF runs), so the scan attempt
    itself must never happen there."""
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    _fetch_scalar(out)
    k = max(2, iters // 2)
    t0 = time.perf_counter()
    for _ in range(k):
        out = jfn(*args)
        _fetch_scalar(out)  # block_until_ready no longer syncs on axon
    return (time.perf_counter() - t0) / k


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


def report_mem(fn, args, out, tag="", jitted=None):
    """AOT HBM accounting (env CALIBR8_BENCH_MEMSTATS=1): compile the
    jitted fn and record the XLA-reserved temp/argument/output bytes
    BEFORE the first execution, so a run that then OOMs or faults the
    device still leaves the memory evidence (the 1.1M-DOF scale newton
    read UNAVAILABLE with no detail; this tells apart a genuinely
    oversized program from a kernel fault)."""
    import jax

    if os.environ.get("CALIBR8_BENCH_MEMSTATS", "0") != "1":
        return
    try:
        # compile through the caller's jitted fn when given (donation
        # changes the executable — a separate jax.jit(fn) here would
        # compile AND load a second copy of a GB-scale program)
        jf = jax.jit(fn) if jitted is None else jitted
        ma = jf.lower(*args).compile().memory_analysis()
        rec = {}
        for k in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(ma, k, None)
            if v is not None:
                rec[k.replace("_size_in_bytes", "_gb")] = round(v / 1e9, 3)
        out[f"mem{tag}"] = rec
        print(json.dumps({"mem_probe" + tag: rec}), flush=True)
    except Exception as e:  # noqa: BLE001
        out[f"mem{tag}_error"] = repr(e)[:200]
        print(json.dumps({("mem_probe" + tag + "_error"): repr(e)[:200]}),
              flush=True)


def _assemble_body(prob, hoist=None):
    """Traceable assembly body + const args for timeit_scan: with
    `hoist`, the disc state and Pallas aux pass as jit arguments."""
    disc = prob.disc
    fn, aux = make_assemble_raw(prob, hoist=hoist)
    if hoist is None:
        return fn, (aux,)

    def body(x, xp, xip, params, st, aux):
        with disc.bind(st):
            return fn(x, xp, xip, params, aux)

    return body, (hoist, aux)


def _bench_assembly(prob, out, iters, with_roofline=True, hoist=None):
    import jax

    disc = prob.disc
    x, x_prev, xi_prev = representative_state(prob)
    params = prob.params0
    body, consts = _assemble_body(prob, hoist=hoist)
    dt = timeit_scan(
        body,
        (x, x_prev, xi_prev, params) + consts,
        iters,
        lambda out: out[0].ravel()[0],
    )
    out["seconds"] = dt
    out["gdof_per_s"] = disc.n_dofs / dt / 1e9
    if not with_roofline:
        return
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

    flops, bytes_ = cost_analysis(xla_assemble, (x, x_prev, xi_prev, params))
    out["xla_flops"] = flops
    out["xla_bytes"] = bytes_
    try:
        dt_xla = timeit_scan(
            xla_assemble,
            (x, x_prev, xi_prev, params),
            max(iters // 2, 2),
            lambda out: out[0].ravel()[0],
        )
        out["xla_seconds"] = dt_xla
        out["pallas_speedup"] = dt_xla / dt
        # ONE consistent roofline model (round-3 record mixed XLA
        # cost-analysis bytes — which report "fractions" > 1 — with
        # useful bytes): measured wall time against the USEFUL-byte
        # lower bound (state in + R/J/diag out exactly once) over the
        # v5e's 819 GB/s HBM.  Both fractions are <= 1 by construction
        # and comparable across rounds; 1/fraction is the remaining
        # headroom against speed-of-light for this kernel.
        useful = (
            x.nbytes * 2
            + xi_prev.nbytes * 2
            + disc.n_elem
            * (disc.spec.ndofs_elem**2 + 2 * disc.spec.ndofs_elem)
            * x.dtype.itemsize
        )
        out["useful_bytes"] = useful
        out["useful_bw_fraction_pallas"] = (useful / dt) / 819e9
        out["useful_bw_fraction_xla"] = (useful / dt_xla) / 819e9
        # the BINDING roofline for the fused kernel is VPU compute,
        # not HBM: the element math (local Newton + condensation) is
        # all elementwise lane FMAs/transcendentals — ~4.9 GFLOP at
        # 196k elems vs ~0.24 GB useful bytes, i.e. arithmetic
        # intensity ~20 FLOP/B, an order past the v5e ridge point.
        # v5e VPU peak ~1.9 TFLOP/s f32 (8x128 lanes, 2 FLOP/cycle,
        # ~940 MHz); fraction uses the XLA-path flop count as the
        # work lower bound for the same math.
        out["vpu_gflop_per_s_pallas"] = flops / dt / 1e9
        out["vpu_fraction_pallas"] = (flops / dt) / 1.9e12
    except Exception as e:  # noqa: BLE001
        out["xla_time_error"] = str(e)[-200:]


def _newton_fn(prob, dtype_str, mg, hoist=None):
    import jax
    import jax.numpy as jnp

    from calibr8_tpu.fem.bcs import apply_dbcs_residual
    from calibr8_tpu.solve import linear as linear_mod

    disc = prob.disc
    # to-convergence budget (max_iters counts TOTAL inner iterations;
    # solve_relres in the output verifies the solve actually reached
    # tol).  f32 tol 1e-4 matches _mark_stalled's 2e-4 gate: the
    # round-3 5e-3 setting relied on full fixed-length gmres cycles
    # OVERSHOOTING to ~9e-5; the own-rolled cycle exits at 0.1*atol,
    # so requesting 5e-3 now yields ~5e-4 — correct behavior that the
    # stall gate would mislabel (the one-level f32 rows still stall at
    # their genuine ~4e-3 floor and are labeled so).
    lin_cfg = linear_mod.LinearCfg(
        method="gmres",
        tol=1e-4 if dtype_str == "f32" else 1e-6,
        max_iters=800,
        # the restart basis is the dominant Krylov HBM cost at scale
        # (restart x n_dofs x 4 B: 100 x 1.1M ~ 440 MB f32); the scale
        # mode runs MG-preconditioned (~flat, tens of iterations) and
        # overrides this down — the 1.1M-DOF adjoint compile OOM'd HBM
        # by just 77 MB at restart=150
        restart=int(os.environ.get("CALIBR8_BENCH_RESTART", 100)),
        refine_iters=1,
    )

    fn, aux = make_assemble_raw(prob, hoist=hoist)

    def core(x, x_prev, xi_prev, params, bc_dofs, bc_vals, aux):
        R, J_e, diag, xi, path, nfail = fn(x, x_prev, xi_prev, params, aux)
        R = apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals)
        dx, relres = linear_mod.solve_info(
            lin_cfg, J_e, disc, diag, -R, bc_dofs, mg=mg
        )
        return x + dx, xi, jnp.linalg.norm(R), relres

    if hoist is None:
        def body(x, x_prev, xi_prev, params, bc_dofs, bc_vals, aux):
            return core(x, x_prev, xi_prev, params, bc_dofs, bc_vals, aux)

        return body, (aux,)

    # MG transfer arrays hoisted alongside the disc arrays (the level-0
    # P_nT is ~100 MB at 1.5M elements — embedded constants 413)
    mg_hoist = mg.hoist_args() if mg is not None else None
    import contextlib

    def body(x, x_prev, xi_prev, params, bc_dofs, bc_vals, st, mst, aux):
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            return core(x, x_prev, xi_prev, params, bc_dofs, bc_vals, aux)

    return body, (hoist, mg_hoist, aux)


def _bench_newton(prob, out, dtype_str, iters, refinements=0, hoist=None,
                  sync=False):
    import jax

    disc = prob.disc
    x, x_prev, xi_prev = representative_state(prob)
    params = prob.params0
    bc_dofs, bc_vals = prob.dbcs.arrays(1.0)
    mg = prob.mg_factory if refinements else None
    body, consts = _newton_fn(prob, dtype_str, mg, hoist=hoist)
    args = (x, x_prev, xi_prev, params, bc_dofs, bc_vals) + consts
    # no report_mem here: the timed path compiles its OWN scan-harness
    # executable, so an extra jax.jit(body) would compile and load a
    # second copy of a potentially GB-scale program — the exact hazard
    # report_mem exists to avoid.  Scale memory evidence comes from the
    # split benches, which pass their jitted callables.
    if sync:
        dt = timeit_sync(body, args, iters)
    else:
        dt = timeit_scan(body, args, iters, lambda out: out[3])
    out["seconds"] = dt
    out["gdof_per_s"] = disc.n_dofs / dt / 1e9
    out["solve_relres"] = float(jax.jit(body)(*args)[3])
    if refinements:
        out["preconditioner"] = "multigrid"


def _bench_newton_split(prob, out, dtype_str, iters, hoist):
    """Scale variant of _bench_newton: assembly and build+solve run as
    TWO jit programs so their temps never co-reside — the one-program
    MG newton at 1.1M DOF declares 8.5 GB temps + 3.5 GB generated
    code and dies loading next to the setup-resident arrays on a
    16 GB v5e.  The step time is the synced sum of both programs
    (per-call RTT ~60 ms against multi-second steps)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from calibr8_tpu.fem.bcs import apply_dbcs_residual
    from calibr8_tpu.solve import linear as linear_mod

    disc = prob.disc
    x, x_prev, xi_prev = representative_state(prob)
    params = prob.params0
    bc_dofs, bc_vals = prob.dbcs.arrays(1.0)
    mg = prob.mg_factory
    mg_hoist = mg.hoist_args() if mg is not None else None
    # tol 1e-4 (f32): the attainable floor, and the _mark_stalled
    # convergence gate.  The round-3 5e-3 setting relied on full
    # fixed-length gmres cycles OVERSHOOTING to 9.1e-5; the own-rolled
    # cycle exits at 0.1*atol, so the requested tol is now what you get
    # (the first deg-4 probe exited at 4.4e-4 = exactly 0.1 * 5e-3 —
    # correct behavior, mislabeled stalled)
    lin_cfg = linear_mod.LinearCfg(
        method="gmres",
        tol=1e-4 if dtype_str == "f32" else 1e-6,
        max_iters=800,
        restart=int(os.environ.get("CALIBR8_BENCH_RESTART", 50)),
        refine_iters=1,
    )
    fn, aux = make_assemble_raw(prob, hoist=hoist)

    def body1(x, x_prev, xi_prev, params, bc_dofs, bc_vals, st, aux):
        with disc.bind(st):
            R, J_e, diag, xi, path, nfail = fn(
                x, x_prev, xi_prev, params, aux
            )
            R = apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals)
        return R, J_e, diag, xi

    # preconditioner-state split (mg.make_state): the recursive MG's
    # Galerkin/lmax/Newton-Schulz build runs as its OWN program whose
    # output pytree feeds the solve program as jit arguments — the
    # hierarchy rebuild leaves the per-step path (rebuilt once per
    # Newton SOLVE, reused across its iterations: the MueLu reuse
    # discipline, linear_solve.cpp:36-123) and its generated code
    # (~0.8 GB at 1.5M elements) leaves the Krylov executable
    use_state = mg is not None and getattr(mg, "recursive", False)

    def body_mk(J_e, diag, bc_dofs, st, mst):
        with disc.bind(st), mg.bind(mst):
            return linear_mod.mg_make_state(
                lin_cfg, J_e, disc, diag, bc_dofs, mg
            )

    # HOST-ORCHESTRATED restarts (default at scale): the axon tunnel
    # kills any single dispatch whose device execution passes ~50-60 s
    # (worker crash; bisected by scripts/probe_long_dispatch.py), so
    # the outer GMRES restart loop runs on host with each cycle its
    # own program (linear.solve_cycle / host_restart_loop).  One cycle
    # at restart<=50 stays well under the ceiling at 1.1M DOF.
    host_cycles = os.environ.get("CALIBR8_HOST_CYCLES", "1") != "0"

    def body2(J_e, diag, R, x, bc_dofs, st, mst, mg_state):
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            dx, relres, ki = linear_mod.solve_info(
                lin_cfg, J_e, disc, diag, -R, bc_dofs, mg=mg,
                return_iters=True, mg_state=mg_state,
            )
        return x + dx, jnp.linalg.norm(R), relres, ki

    def body2c(J_e, diag, R, z, stag, bc_dofs, st, mst, mg_state):
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            return linear_mod.solve_cycle(
                lin_cfg, J_e, disc, diag, -R, z, stag, bc_dofs, mg=mg,
                mg_state=mg_state,
            )

    # donate J_e/diag/R into the solve program: each run_once builds
    # them fresh, and aliasing ~1.5 GB of element blocks into the
    # solve's workspace is the margin between loading and UNAVAILABLE
    # at 1.1M DOF on a 16 GB chip.  (Host-cycle mode cannot donate —
    # every cycle re-reads the blocks.)
    jf1 = jax.jit(body1)
    jf2 = (jax.jit(body2c) if host_cycles
           else jax.jit(body2, donate_argnums=(0, 1, 2)))
    jfmk = jax.jit(body_mk) if use_state else None
    a1 = (x, x_prev, xi_prev, params, bc_dofs, bc_vals, hoist, aux)
    report_mem(body1, a1, out, tag="_asm", jitted=jf1)
    o1 = jf1(*a1)
    jax.block_until_ready(o1)
    mg_state = None
    if use_state:
        amk = (o1[1], o1[2], bc_dofs, hoist, mg_hoist)
        report_mem(body_mk, amk, out, tag="_mgmake", jitted=jfmk)
        mg_state = jfmk(*amk)  # warmup/compile
        jax.block_until_ready(mg_state)
        t0 = time.perf_counter()
        mg_state = jfmk(*amk)
        jax.block_until_ready(mg_state)
        out["mg_make_s"] = time.perf_counter() - t0
        del amk

    restart = min(lin_cfg.restart, disc.n_dofs)

    def host_solve(R, J_e, diag):
        z0 = jnp.zeros_like(R)
        norm_b = float(jnp.linalg.norm(R))

        def cycle_call(z, stag):
            return jf2(J_e, diag, R, z, jnp.asarray(stag, jnp.int32),
                       bc_dofs, hoist, mg_hoist, mg_state)

        return linear_mod.host_restart_loop(
            cycle_call, z0, norm_b, lin_cfg.tol, lin_cfg.max_iters,
            restart, lin_cfg.refine_iters,
        )

    if host_cycles:
        out["host_cycles"] = True
        a2 = (o1[1], o1[2], o1[0], jnp.zeros_like(o1[0]),
              jnp.asarray(0, jnp.int32), bc_dofs, hoist, mg_hoist,
              mg_state)
        report_mem(body2c, a2, out, tag="_solve", jitted=jf2)
        z, relres, ki = host_solve(o1[0], o1[1], o1[2])  # warmup/compile
        out["warmup_relres"] = relres
    else:
        a2 = (o1[1], o1[2], o1[0], x, bc_dofs, hoist, mg_hoist, mg_state)
        report_mem(body2, a2, out, tag="_solve", jitted=jf2)
        o2 = jf2(*a2)  # warmup/compile (donates o1's blocks)
        jax.block_until_ready(o2)
        out["warmup_relres"] = float(o2[2])
        del o2
    # convergence evidence that survives a timed-run fault (see
    # _bench_adjoint_split)
    print(json.dumps({"warmup_relres": out["warmup_relres"]}), flush=True)
    del a2, o1  # free every warmup buffer before the timed runs

    def run_once():
        R, J_e, diag, xi = jf1(*a1)
        del xi  # elem-state output: not a solve input, drop before jf2
        if host_cycles:
            z, relres, ki = host_solve(R, J_e, diag)
            return relres, ki
        o2 = jf2(J_e, diag, R, x, bc_dofs, hoist, mg_hoist, mg_state)
        jax.block_until_ready(o2)
        return float(o2[2]), int(o2[3])

    res = run_once()
    k = max(2, iters // 2)
    t0 = time.perf_counter()
    for _ in range(k):
        res = run_once()
    dt = (time.perf_counter() - t0) / k
    out["seconds"] = dt
    out["gdof_per_s"] = disc.n_dofs / dt / 1e9
    out["solve_relres"] = float(res[0])
    out["solve_iters"] = int(res[1])  # total inner Krylov iterations
    out["split_programs"] = 3 if use_state else 2
    if mg is not None:
        out["preconditioner"] = "multigrid"
    if use_state:
        # steady-state step time (hierarchy lagged across Newton
        # iterations); the rebuild is reported separately and the
        # non-lagged step is their sum
        out["precond_reuse"] = "state"
        out["seconds_incl_mg_make"] = dt + out["mg_make_s"]


def _bench_adjoint_split(prob, out, dtype_str, iters, hoist, mg):
    """Scale variant of _bench_adjoint: Adjoint.step_solve and
    step_post as TWO jit programs (see _bench_newton_split — the
    one-program step peaked 10-17 GB of temps at 1.1M DOF)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from calibr8_tpu.solve import linear as linear_mod
    from calibr8_tpu.solve.adjoint import Adjoint

    disc = prob.disc
    x, x_prev, xi_prev = representative_state(prob)
    params = prob.params0

    @jax.jit
    def loc_h(st, x, x_prev, xi_prev, params):
        with disc.bind(st):
            return prob.assembler.local_solve(x, x_prev, xi_prev, params)

    loc = loc_h(hoist, x, x_prev, xi_prev, params)
    lin_cfg = linear_mod.LinearCfg(
        method="gmres",
        tol=1e-4 if dtype_str == "f32" else 1e-8,
        max_iters=1500,
        restart=int(os.environ.get("CALIBR8_BENCH_RESTART", 50)),
        refine_iters=0,
    )
    adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, lin_cfg, mg_factory=mg)
    adj.linear_cfg = lin_cfg
    bc_dofs, _ = prob.dbcs.arrays(1.0)
    aux = prob.qoi.setup_step(1, 1.0, 1.0, 2.0)
    nde = disc.edofs.shape[1]
    f0 = jnp.zeros((disc.n_elem, nde), disc.dtype)
    g0 = jnp.zeros((disc.n_elem, prob.assembler.nxi), disc.dtype)
    mg_hoist = mg.hoist_args() if mg is not None else None

    def body1(x, x_prev, xi, xi_prev, path, params, f, g, bc_dofs, st,
              mst):
        # bc_dofs as an ARGUMENT, not a closure: the closed-over numpy
        # bc set constant-folds through the element Dirichlet masks
        # into (nde_u, E)-sized literals, one copy PER V-cycle inline
        # site (75.5 MB x3 in the dissected 1.1M-DOF adjoint
        # executable) — against a ~2 GB executable-load ceiling
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            return adj.step_blocks(
                x, x_prev, xi, xi_prev, path, params, f, g, bc_dofs, aux
            )

    use_state = mg is not None and getattr(mg, "recursive", False)

    def body_mk(J_total_T, diag, bc_dofs, st, mst):
        # adjoint hierarchy state: the TRANSPOSED cycle's Galerkin /
        # lmax / Newton-Schulz arrays (mirrored u/p sweep, p first)
        with disc.bind(st), mg.bind(mst):
            return linear_mod.mg_make_state(
                lin_cfg, J_total_T, disc, diag, bc_dofs, mg,
                transpose=True,
            )

    def body1k(J_total_T, diag, rhs, bc_dofs, st, mst, mg_state):
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            return adj.step_krylov(
                J_total_T, diag, rhs, bc_dofs, return_iters=True,
                mg_state=mg_state,
            )

    # host-orchestrated restarts (see _bench_newton_split): one
    # TRANSPOSED GMRES cycle per dispatch — restart=100 in a single
    # dispatch is 80+ s at 1.1M DOF, past the ~50-60 s axon worker
    # ceiling that killed every scale adjoint rerun
    host_cycles = os.environ.get("CALIBR8_HOST_CYCLES", "1") != "0"

    def body1kc(J_total_T, diag, rhs, z, stag, tolv, bc_dofs, st, mst,
                mg_state):
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            return linear_mod.solve_cycle(
                lin_cfg, J_total_T, disc, diag, rhs, z, stag, bc_dofs,
                transpose=True, mg=mg, mg_state=mg_state, tol=tolv,
            )

    # mixed-precision iterative refinement (CALIBR8_IR=1): f64 true
    # residual + f64 accumulator + shallow f32 correction solves — the
    # only way under tol 1e-4 at 1.1M DOF, where the f32-arithmetic
    # relres floor for the transposed system measured 1.7e-4.  The f64
    # program is traced under the SCOPED enable_x64 context; the
    # process default stays x64-off so every other program is
    # bit-identical to the plain f32 pipeline.
    use_ir = os.environ.get("CALIBR8_IR", "0") == "1"

    def body_r64(J_total_T, diag, rhs, z64, d, bc_dofs, st):
        z_new = z64 + d.astype(z64.dtype)
        with disc.bind(st):
            r_lp, relres = linear_mod.residual_hp(
                J_total_T, disc, diag, rhs, z_new, bc_dofs,
                transpose=True,
            )
        return z_new, r_lp, relres

    def body2(x, x_prev, xi, xi_prev, path, params, solved, st):
        with disc.bind(st):
            return adj.step_post(
                x, x_prev, xi, xi_prev, path, params, *solved
            )

    # THREE programs: blocks | krylov | post.  The combined
    # blocks+solve program declared 11.2 GB of temps at 1.1M DOF (the
    # element-block linearize and the MG make/Krylov workspace
    # co-declared) + 1.9 GB code — at the 16 GB edge next to the
    # setup-resident arrays; splitting keeps each program's peak well
    # under.  J_total_T/diag/rhs are donated into the krylov program
    # (only consumer), the solved tuple into post.
    jf1 = jax.jit(body1)
    jfk = (jax.jit(body1kc) if host_cycles
           else jax.jit(body1k, donate_argnums=(0, 1, 2)))
    jf2 = jax.jit(body2, donate_argnums=(6,))
    jfmk = jax.jit(body_mk) if use_state else None
    a1 = (x, x_prev, loc.xi, xi_prev, loc.path, params, f0, g0,
          jnp.asarray(bc_dofs), hoist, mg_hoist)
    report_mem(body1, a1, out, tag="_blocks", jitted=jf1)
    b1 = jf1(*a1)
    jax.block_until_ready(b1)
    J_T, diag_a, rhs, B0, g_modT, dJ_dp = b1
    mg_state = None
    if use_state:
        amk = (J_T, diag_a, jnp.asarray(bc_dofs), hoist, mg_hoist)
        report_mem(body_mk, amk, out, tag="_mgmake", jitted=jfmk)
        mg_state = jfmk(*amk)  # warmup/compile
        jax.block_until_ready(mg_state)
        t0 = time.perf_counter()
        mg_state = jfmk(*amk)
        jax.block_until_ready(mg_state)
        out["mg_make_s"] = time.perf_counter() - t0
        del amk

    restart = min(lin_cfg.restart, disc.n_dofs)
    jr64 = jax.jit(body_r64) if use_ir else None

    def host_solve(J_T, diag_a, rhs):
        def cycle_tol(rhs_k, z, stag, tolv):
            return jfk(J_T, diag_a, rhs_k, z,
                       jnp.asarray(stag, jnp.int32), tolv,
                       jnp.asarray(bc_dofs), hoist, mg_hoist, mg_state)

        if use_ir:
            def resid_step(z64, d):
                with jax.enable_x64(True):
                    if z64 is None:
                        z64 = jnp.zeros(rhs.shape, jnp.float64)
                    return jr64(J_T, diag_a, rhs, z64, d,
                                jnp.asarray(bc_dofs), hoist)

            z64, relres_f, ki, passes = linear_mod.host_ir_loop(
                cycle_tol, resid_step, rhs, lin_cfg.tol,
                lin_cfg.max_iters, restart, lin_cfg.refine_iters,
            )
            out["ir_passes"] = passes
            return z64.astype(rhs.dtype), relres_f, ki

        z0 = jnp.zeros_like(rhs)
        norm_b = float(jnp.linalg.norm(rhs))
        tolv = jnp.asarray(lin_cfg.tol, rhs.dtype)

        def cycle_call(z, stag):
            return cycle_tol(rhs, z, stag, tolv)

        return linear_mod.host_restart_loop(
            cycle_call, z0, norm_b, lin_cfg.tol, lin_cfg.max_iters,
            restart, lin_cfg.refine_iters,
        )

    if host_cycles:
        out["host_cycles"] = True
        ak = (J_T, diag_a, rhs, jnp.zeros_like(rhs),
              jnp.asarray(0, jnp.int32),
              jnp.asarray(lin_cfg.tol, rhs.dtype),
              jnp.asarray(bc_dofs), hoist, mg_hoist, mg_state)
        report_mem(body1kc, ak, out, tag="_solve", jitted=jfk)
        z, relres_f, ki = host_solve(J_T, diag_a, rhs)
        relres = jnp.asarray(relres_f, z.dtype)
        out["warmup_solve_iters"] = int(ki)
    else:
        ak = (J_T, diag_a, rhs, jnp.asarray(bc_dofs), hoist, mg_hoist,
              mg_state)
        report_mem(body1k, ak, out, tag="_solve", jitted=jfk)
        z, relres, ki = jfk(*ak)
        jax.block_until_ready(z)
        out["warmup_solve_iters"] = int(ki)
    del ak, J_T, diag_a, rhs, b1
    s1 = (z, relres, B0, g_modT, dJ_dp)
    a2 = (x, x_prev, loc.xi, xi_prev, loc.path, params, s1, hoist)
    report_mem(body2, a2, out, tag="_post", jitted=jf2)
    res = jf2(*a2)  # warmup/compile the post program (donates s1)
    jax.block_until_ready(res)
    # fetch + record the warmup relres NOW: if a later timed run
    # faults the axon client, the convergence evidence survives (the
    # first 1.1M-DOF adjoint attempt died fetching relres AFTER the
    # timing loop, leaving a seconds value with no convergence record)
    out["warmup_relres"] = float(res.relres)
    print(json.dumps({"warmup_relres": out["warmup_relres"]}), flush=True)
    del a2, s1, res, z, relres, B0, g_modT, dJ_dp

    def run_once():
        J_T, diag_a, rhs, B0, g_modT, dJ_dp = jf1(*a1)
        if host_cycles:
            z, relres_f, _ = host_solve(J_T, diag_a, rhs)
            relres = jnp.asarray(relres_f, z.dtype)
        else:
            z, relres, _ = jfk(J_T, diag_a, rhs, jnp.asarray(bc_dofs),
                               hoist, mg_hoist, mg_state)
        res = jf2(x, x_prev, loc.xi, xi_prev, loc.path, params,
                  (z, relres, B0, g_modT, dJ_dp), hoist)
        jax.block_until_ready(res)
        return res

    res = run_once()
    k = max(2, iters // 2)
    t0 = time.perf_counter()
    for _ in range(k):
        res = run_once()
    dt = (time.perf_counter() - t0) / k
    out["seconds"] = dt
    out["gdof_per_s"] = disc.n_dofs / dt / 1e9
    out["solve_relres"] = float(res.relres)
    out["split_programs"] = 4 if use_state else 3
    if mg is not None:
        out["preconditioner"] = "multigrid"
    if use_state:
        out["precond_reuse"] = "state"
        out["seconds_incl_mg_make"] = dt + out["mg_make_s"]


def _make_adjoint_fn(prob, dtype_str, hoist=None, mg=None):
    import jax
    import jax.numpy as jnp

    from calibr8_tpu.solve.adjoint import Adjoint
    from calibr8_tpu.solve import linear as linear_mod

    disc = prob.disc
    lin_cfg = linear_mod.LinearCfg(
        method="gmres",
        tol=1e-4 if dtype_str == "f32" else 1e-8,
        max_iters=1500,
        restart=int(os.environ.get("CALIBR8_BENCH_RESTART", 150)),
        refine_iters=0,
    )
    adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, lin_cfg, mg_factory=mg)
    adj.linear_cfg = lin_cfg  # keep the benchmark tolerance
    bc_dofs, _ = prob.dbcs.arrays(1.0)
    aux = prob.qoi.setup_step(1, 1.0, 1.0, 2.0)
    nde = disc.edofs.shape[1]
    f0 = jnp.zeros((disc.n_elem, nde), disc.dtype)
    g0 = jnp.zeros((disc.n_elem, prob.assembler.nxi), disc.dtype)

    def adjoint_step(x, x_prev, xi, xi_prev, path, params, f, g):
        return adj._step_impl(
            x, x_prev, xi, xi_prev, path, params, f, g, bc_dofs, aux
        )

    if hoist is None:
        return adjoint_step, (), f0, g0

    mg_hoist = mg.hoist_args() if mg is not None else None
    import contextlib

    def step_h(x, x_prev, xi, xi_prev, path, params, f, g, st, mst):
        mg_ctx = mg.bind(mst) if mg is not None else contextlib.nullcontext()
        with disc.bind(st), mg_ctx:
            return adjoint_step(x, x_prev, xi, xi_prev, path, params, f, g)

    return step_h, (hoist, mg_hoist), f0, g0


def _bench_adjoint(prob, out, dtype_str, iters, hoist=None, mg=None,
                   sync=False):
    import jax

    disc = prob.disc
    x, x_prev, xi_prev = representative_state(prob)
    params = prob.params0
    if hoist is None:
        loc = jax.jit(prob.assembler.local_solve)(x, x_prev, xi_prev, params)
    else:

        @jax.jit
        def loc_h(st, x, x_prev, xi_prev, params):
            with disc.bind(st):
                return prob.assembler.local_solve(x, x_prev, xi_prev, params)

        loc = loc_h(hoist, x, x_prev, xi_prev, params)
    jfn, consts, f0, g0 = _make_adjoint_fn(prob, dtype_str, hoist=hoist, mg=mg)
    args = (x, x_prev, loc.xi, xi_prev, loc.path, params, f0, g0) + consts
    # no report_mem: see _bench_newton (scan harness compiles its own
    # executable; memory evidence at scale comes from the split benches)
    if sync:
        dt = timeit_sync(jfn, args, iters)
    else:
        dt = timeit_scan(jfn, args, iters, lambda out: out.grad.ravel()[0])
    out["seconds"] = dt
    out["gdof_per_s"] = disc.n_dofs / dt / 1e9
    # honesty check: the one-level precond can stagnate near the f32
    # floor; the recorded relres shows whether tol was actually reached
    out["solve_relres"] = float(jax.jit(jfn)(*args).relres)
    if mg is not None:
        out["preconditioner"] = "multigrid"


def run_dist_overhead(dtype_str, n):
    """Per-Krylov-iteration cost of the domain-decomposed path at
    n_parts=1 vs the single-chip ELL path on the same chip — quantifies
    the shard_map + halo-exchange + per-part-apply overhead that the
    multi-chip composition pays (VERDICT r3 item 4; reference anchor:
    Tpetra Export-ADD discipline, source/calibr8/src/linear_alg.hpp:15-53).

    Both paths run the SAME own-rolled GMRES(m) cycle, unpreconditioned
    with atol=0 (no early exit), so every iteration does identical work
    except the operator apply; per-iteration seconds divide by m."""
    import jax
    import jax.numpy as jnp

    from calibr8_tpu.parallel.dist import DistContext
    from calibr8_tpu.solve.ellpack import EllOperator
    from calibr8_tpu.solve.gmres import gmres_cycle

    prob = build_problem(n, dtype_str)
    disc = prob.disc
    a = prob.assembler
    x, x_prev, xi_prev = representative_state(prob)
    bc_dofs, bc_vals = prob.dbcs.arrays(1.0)
    loc = a.local_solve(x, x_prev, xi_prev, prob.params0)
    R, J_e, diag = a.residual_and_jacobian(
        x, x_prev, loc.xi, xi_prev, loc.path, prob.params0
    )
    out = {"n_elem": int(disc.n_elem), "n_dofs": int(disc.n_dofs)}
    m = 30
    iters = 5

    op1 = EllOperator(disc, J_e, diag, bc_dofs)

    def cyc_single(r):
        return gmres_cycle(op1, r, m, 0.0)[0]

    r0 = -R
    t1 = timeit_scan(cyc_single, (r0,), iters, lambda o: o.ravel()[0])
    out["single_s_per_iter"] = t1 / m

    ctx = DistContext(prob, n_parts=1)
    Xd = ctx.to_dist(x)
    XPd = ctx.to_dist(x_prev)
    xid = ctx.init_xi_dist()
    Rd, J_T, diag_d, *_ = ctx.assemble(Xd, XPd, xid, prob.params0)
    bc_mask, _ = ctx.bc_dist(bc_dofs, bc_vals)
    A_ell = ctx.ell_assemble(J_T)
    if jax.default_backend() == "tpu" and A_ell.dtype != jnp.float64:
        A_Td = ctx.ell_trailing(A_ell)

        def opd(v):
            return jnp.where(bc_mask, diag_d * v, ctx.ell_matvec_T(A_Td, v))
    else:

        def opd(v):
            return jnp.where(bc_mask, diag_d * v, ctx.ell_matvec(A_ell, v))

    def cyc_dist(r):
        return gmres_cycle(opd, r, m, 0.0)[0]

    rd0 = ctx.to_dist(-R)
    t2 = timeit_scan(cyc_dist, (rd0,), iters, lambda o: o.ravel()[0])
    out["dist_s_per_iter"] = t2 / m
    out["dist_overhead_ratio"] = t2 / t1
    return out


def run_calibration(dtype_str, n=10):
    """Calibration iterations-to-tolerance (BASELINE.json third headline):
    synthetic generation at truth params -> adjoint-gradient L-BFGS-B
    recovery from a perturbed start, mirroring the reference python FEMU
    workflow (test/python/CMakeLists.txt:30-77).  `n` sets the mesh as
    h = n/1000: the default n=10 is a REALISTIC 22k-element notch
    (the reference's FEMU workload is a notch mesh, not a toy patch;
    the round-3 50-DOF row was pure dispatch RTT and said nothing
    about calibration cost)."""
    import copy

    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.io.synthetic import attach_synthetic
    from calibr8_tpu.opt.drivers import run_inverse
    from calibr8_tpu.opt.objective import ActiveParams, AdjointObjective
    from calibr8_tpu.problem import Problem
    from calibr8_tpu.solve.adjoint import Adjoint
    from calibr8_tpu.solve.linear import LinearCfg

    truth = {"Y": 2.0, "S": 10.0, "D": 2.0}
    load_file = os.path.join(CACHE_DIR, "bench_load.dat")
    os.makedirs(CACHE_DIR, exist_ok=True)
    mats = {
        "E": 1000.0, "nu": 0.25, **truth,
        "R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0,
    }
    tol = 1e-12 if dtype_str == "f64" else 1e-6
    h = (n / 1000.0) if n else 0.25
    syn_deck = {
        # >=100k-DOF calibration (n<=5 -> h<=0.005, ~88k elems / ~135k
        # DOFs): one-level block-GS grows with refinement on the notch,
        # so the fine meshes run aggregation AMG (the reference FEMU
        # workload solves with Belos+MueLu at any h,
        # test/femu/CMakeLists.txt:1-12)
        **({"linear algebra": {"method": "gmres",
                               "preconditioner": "multigrid"}}
           if n and n <= 5 else {}),
        "discretization": {
            "builtin mesh": {"type": "notch2D", "h": h},
            "num steps": 2,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {
                "type": "mechanics_plane_stress",
                # jitted step solver: the whole Newton loop is one XLA
                # program per load step — on the tunneled chip the
                # host-orchestrated loop's ~30 ms/dispatch RTTs
                # dominated each objective evaluation (8.4 s/eval)
                "solver": "jitted",
                "nonlinear max iters": 30,
                "nonlinear absolute tol": 1e-6 if dtype_str == "f32" else 1e-8,
                "nonlinear relative tol": 1e-6 if dtype_str == "f32" else 1e-8,
            },
            "local residual": {
                "type": "small_hill_plane_stress",
                "nonlinear max iters": 500,
                "nonlinear absolute tol": tol,
                "nonlinear relative tol": tol,
                "materials": {"body": mats},
            },
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 1, "ymax", "0.005 * t"],
            }
        },
        "quantity of interest": {
            "type": "reaction mismatch",
            "coordinate index": 1,
            "coordinate value": 1.0,
            "coordinate tolerance": 1e-6,
            "reaction force component": 1,
            "load out file": load_file,
        },
    }
    if n and n <= 5:
        # the jitted step solver cannot thread the MG preconditioner
        # (problem.py guard); at >=100k DOF each Newton step is seconds,
        # so the host solver's ~30 ms/dispatch RTT is noise
        del syn_deck["residuals"]["global residual"]["solver"]
    syn = Problem(load_deck(syn_deck))
    traj = syn.solve_primal()
    attach_synthetic(syn.mesh, syn.disc, traj)

    cal_deck = copy.deepcopy(syn_deck)
    cal_deck["residuals"]["local residual"]["materials"] = {
        "body": {**mats, "Y": 2.5, "D": 2.8}
    }
    cal_deck["quantity of interest"] = {
        "type": "calibration",
        "balance factor": 4.22,
        "coordinate index": 1,
        "coordinate value": 1.0,
        "coordinate tolerance": 1e-6,
        "reaction force component": 1,
        "displacement weights": [3.98e7, 3.98e7],
        "load input file": load_file,
    }
    cal = Problem(load_deck(cal_deck), mesh=syn.mesh)
    adj = Adjoint(cal.assembler, cal.qoi, cal.dbcs, LinearCfg())
    active = ActiveParams.from_inverse_spec(
        {"materials": {"body": {"Y": [1.0, 3.0], "D": [1.0, 4.0]}}},
        cal.disc.elem_set_names,
        cal.model.param_names,
    )
    obj = AdjointObjective(cal, adj, active)
    x0 = active.to_canonical(active.extract(cal.params0))
    t0 = time.perf_counter()
    res = run_inverse(obj, active, x0=x0, max_iters=60, gtol=1e-12)
    dt = time.perf_counter() - t0
    recovered = dict(
        zip([nm.split("/")[-1] for nm in res.names], res.params)
    )
    return {
        "n_elem": int(cal.disc.n_elem),
        "n_dofs": int(cal.disc.n_dofs),
        "seconds_total": dt,
        "n_evals": int(res.n_evals),
        "seconds_per_eval": dt / max(int(res.n_evals), 1),
        "J_final": float(res.J),
        "rel_err_Y": abs(recovered["Y"] - truth["Y"]) / truth["Y"],
        "rel_err_D": abs(recovered["D"] - truth["D"]) / truth["D"],
    }


def _twin_row(case, dtype_str, n):
    """One model's Pallas-vs-XLA fused-assembly row, scan-harness
    timed, at the SAME configuration whose Pallas-vs-XLA agreement the
    twin parity tests assert (calibr8_tpu/models/twin_cases.CASES)."""
    import jax
    import jax.numpy as jnp

    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.fem import pallas_assembly
    from calibr8_tpu.models.twin_cases import case_deck
    from calibr8_tpu.problem import Problem

    _, default_mesh, *_ = case
    mesh = (
        {"type": "cube", "n": max(n, 4)}
        if default_mesh["type"] == "cube"
        else {"type": "notch2D", "h": 0.03}
    )
    dtype = jnp.float32 if dtype_str == "f32" else jnp.float64
    t_model = time.perf_counter()
    try:
        prob = Problem(load_deck(case_deck(case, mesh=mesh)), dtype=dtype)
        disc = prob.disc
        row = {
            "n_elem": int(disc.n_elem),
            "n_dofs": int(disc.n_dofs),
            "device": str(jax.devices()[0]),
        }
        x, x_prev, xi_prev = representative_state(prob)
        args = (x, x_prev, xi_prev, prob.params0)

        # Pallas FIRST: a fault in one path must not lose the other's
        # row (the hypo_barlat XLA-path program reproducibly faults
        # the chip at runtime; the twin row died before measuring the
        # kernel it exists to measure)
        if (
            jax.devices()[0].platform == "tpu"
            and dtype == jnp.float32
            and pallas_assembly.supports_pallas(prob.assembler)
        ):
            try:
                body, consts = _assemble_body(prob)
                row["pallas_seconds"] = timeit_scan(
                    body, args + consts, 5, lambda o: o[0].ravel()[0]
                )
            except Exception as e:  # noqa: BLE001 — record per-path
                row["pallas_error"] = str(e)[-200:]
        os.environ["CALIBR8_PALLAS"] = "0"
        try:
            body, consts = _assemble_body(prob)
            row["xla_seconds"] = timeit_scan(
                body, args + consts, 5, lambda o: o[0].ravel()[0]
            )
        except Exception as e:  # noqa: BLE001 — record per-path
            row["xla_error"] = str(e)[-200:]
        if "xla_seconds" in row and "pallas_seconds" in row:
            row["speedup"] = row["xla_seconds"] / row["pallas_seconds"]
        row["bench_wall_s"] = round(time.perf_counter() - t_model, 1)
        return row
    finally:
        os.environ["CALIBR8_PALLAS"] = "1"


def run_twins(dtype_str, n, model=None):
    """Per-model fused-assembly speedup rows: the Pallas fast path vs
    the generic XLA path, one row per material-model twin.

    With `model`, measures that one row in-process (the child mode).
    Otherwise orchestrates ONE SUBPROCESS PER MODEL: a Mosaic kernel
    fault wedges the axon client for the rest of its process (observed
    round 3 — the eig twin's unlowerable acos poisoned every row after
    it with UNAVAILABLE device errors), so each row gets a fresh
    process and a fresh chip connection.  The parent never imports
    jax, keeping the chip single-tenant.  Rows persist to the results
    cache incrementally, so a deadline kill keeps what ran."""
    from calibr8_tpu.models.twin_cases import CASES

    if model is not None:
        case = next(c for c in CASES if c[0] == model)
        return _twin_row(case, dtype_str, n)

    out = {"models": {}, "device": ""}
    for case in CASES:
        name = case[0]
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--mode", "twins", "--dtype", dtype_str,
            "--n", str(n), "--model", name,
        ]
        r = None
        try:
            r = subprocess.run(
                cmd,
                capture_output=True,
                text=True,
                timeout=420.0,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            row = json.loads(r.stdout.strip().splitlines()[-1])
            out["device"] = row.pop("device", out["device"])
            out["models"][name] = row
        except Exception as e:  # noqa: BLE001 — record and move on
            err = str(e)[-250:]
            if r is not None and r.stderr:
                err = r.stderr.strip().splitlines()[-1][-250:]
            out["models"][name] = {"error": err}
        _save_result("twins", dtype_str, n, out)
    return out


def _mark_stalled(out, dtype_str):
    """Label rows whose Krylov solve never reached a meaningful
    residual: an unconverged per-step time is NOT a step time (the
    round-3 record carried a 0.43 s 'newton' row at relres 3.8e-3 —
    the f32 one-level floor — next to the converged 1.06 s MG row)."""
    # thresholds sit a small margin above the requested tolerances
    # (f32 solves target 1e-4 — the attainable floor; f64 target 1e-8):
    # the label is for genuine stalls, not eps-level near-misses
    thresh = 2e-4 if dtype_str == "f32" else 1e-6
    for k in list(out):
        if k.endswith("solve_relres") and out[k] is not None:
            if float(out[k]) > thresh:
                out[k.replace("solve_relres", "stalled")] = True
    return out


def run_mode(mode, dtype_str, n, model=None):
    import jax

    if mode == "twins":
        return run_twins(dtype_str, n, model=model)

    refinements = 2 if mode in ("newton_mg", "adjoint_mg") else 0
    if mode in ("newton_mg", "adjoint_mg"):
        mode = mode[: -len("_mg")]
    iters = 10 if dtype_str == "f32" else 5

    if mode == "dist_overhead":
        out = run_dist_overhead(dtype_str, n)
        out["device"] = str(jax.devices()[0])
        return out

    if mode == "calibration":
        out = run_calibration(dtype_str, n)
        out["device"] = str(jax.devices()[0])
        return out

    if mode == "scale":
        # chip-limit run: assembly + newton + adjoint at the largest
        # single-chip mesh, with the measured extrapolation to the
        # 10M-DOF north star (BASELINE.md 'Performance targets').  The
        # static index/geometry arrays are hoisted into jit arguments —
        # embedded-constant compiles overflow the axon remote-compile
        # request (HTTP 413) at this size.  `n` is the EFFECTIVE edge
        # resolution; the mesh is built as a base cube + a geometric
        # refinement chain so the recursive multigrid preconditioner
        # applies (the one-level precond stalls at relres ~4e-3 at 1M
        # DOF — measured h-growth, the reason MueLu exists).
        refs = int(os.environ.get("CALIBR8_BENCH_SCALE_REFINE", 3))
        # lean Krylov basis: MG keeps counts in the tens, and the
        # restart x n_dofs basis is what OOM'd the 1.1M-DOF compile
        os.environ.setdefault("CALIBR8_BENCH_RESTART", "50")
        # degree-2 smoothers at scale: the chip refuses to LOAD any
        # program >= ~2 GB of generated code, and XLA:TPU's
        # constant-trip-count loop unrolling makes the smoother code
        # scale with the Chebyshev degree at every cycle site (deg-6
        # solve measured 2.8 GB; see CLAUDE.md code-size ceiling)
        os.environ.setdefault("CALIBR8_MG_CHEB_DEGREE", "2")
        base_n = max(2, n >> refs) if refs else n
        prob = build_problem(base_n, dtype_str, refinements=refs)
        disc = prob.disc
        hoist = disc.hoist_args(ell=True)
        out = {"n_elem": int(disc.n_elem), "n_dofs": int(disc.n_dofs)}
        if refs:
            out["preconditioner"] = "multigrid"
        _bench_assembly(prob, out, 5, with_roofline=False, hoist=hoist)
        nwt = {}
        # split-program step: the one-jit MG newton/adjoint at 1.1M
        # DOF exceeds the 16 GB HBM (temps + generated code + resident
        # arrays); assembly|solve and solve|post as separate programs
        # never co-reside
        _bench_newton_split(prob, nwt, dtype_str, 3, hoist)
        out["newton_seconds"] = nwt["seconds"]
        out["newton_solve_relres"] = nwt["solve_relres"]
        for k in ("solve_iters", "mg_make_s", "seconds_incl_mg_make",
                  "precond_reuse"):
            if k in nwt:
                out["newton_" + k] = nwt[k]
        adjd = {}
        _bench_adjoint_split(
            prob, adjd, dtype_str, 3, hoist, prob.mg_factory
        )
        out["adjoint_seconds"] = adjd["seconds"]
        out["adjoint_solve_relres"] = adjd["solve_relres"]
        for k in ("mg_make_s", "seconds_incl_mg_make", "precond_reuse"):
            if k in adjd:
                out["adjoint_" + k] = adjd[k]
        out["adjoint_dof_per_s_per_chip"] = disc.n_dofs / adjd["seconds"]
        # north star: adjoint < 2 s/step at 10M DOF (BASELINE.md:53-59).
        # Per-step cost is ~linear in DOFs past 1M (assembly, EBE
        # matvec, precond are all O(N)); Krylov iteration growth is
        # the MG story, held fixed here.
        out["adjoint_s_per_step_at_10M_dof_extrapolated"] = (
            adjd["seconds"] * 1e7 / disc.n_dofs
        )
        # memory-per-DOF accounting: peak HBM across the three phases
        # bounds the chip-limit mesh (16 GB HBM on one v5e).
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            peak = ms.get("peak_bytes_in_use", 0)
            if peak:
                out["hbm_peak_bytes"] = int(peak)
                out["hbm_bytes_per_dof"] = round(peak / disc.n_dofs, 1)
                out["max_dofs_at_16gb_extrapolated"] = int(
                    16e9 / (peak / disc.n_dofs)
                )
        except Exception:  # noqa: BLE001 — stats are best-effort
            pass
        out["device"] = str(jax.devices()[0])
        return _mark_stalled(out, dtype_str)

    prob = build_problem(n, dtype_str, refinements=refinements)
    disc = prob.disc
    out = {"n_elem": int(disc.n_elem), "n_dofs": int(disc.n_dofs)}
    if mode == "assembly":
        _bench_assembly(prob, out, iters)
    elif mode == "newton":
        _bench_newton(prob, out, dtype_str, iters, refinements=refinements)
    elif mode == "adjoint":
        _bench_adjoint(
            prob, out, dtype_str, iters,
            mg=prob.mg_factory if refinements else None,
            # the f64 scanned adjoint faults the chip and wedges the
            # axon client (UNAVAILABLE on the fallback too; 3 runs);
            # per-call sync is <1% RTT noise on a multi-second step
            sync=dtype_str == "f64",
        )
    out["device"] = str(jax.devices()[0])
    return _mark_stalled(out, dtype_str)


def _summary_row(key, d):
    """One-line summary of a mode's result dict for the headline: the
    full detail outgrew the driver's stdout tail window two rounds
    running (BENCH_r02/r03 'parsed: null')."""
    if not isinstance(d, dict):
        return d
    if "models" in d:  # twins mode
        rows = [
            v for v in d["models"].values()
            if isinstance(v, dict) and "speedup" in v
        ]
        row = {"n_models_ok": len(rows), "n_models": len(d["models"])}
        if rows:
            sp = sorted(float(v["speedup"]) for v in rows)
            row["speedup_median"] = round(sp[len(sp) // 2], 2)
        if d.get("cached"):
            row["cached"] = True
        return row
    row = {}
    for k in (
        "n_dofs", "seconds", "gdof_per_s", "solve_relres", "stalled",
        "newton_seconds", "newton_solve_relres", "newton_stalled",
        "newton_solve_iters", "newton_mg_make_s",
        "adjoint_seconds", "adjoint_solve_relres", "adjoint_stalled",
        "adjoint_mg_make_s",
        "adjoint_s_per_step_at_10M_dof_extrapolated",
        "seconds_per_eval", "n_evals", "pallas_speedup",
        "useful_bw_fraction_pallas",
        "single_s_per_iter", "dist_s_per_iter", "dist_overhead_ratio",
        "rel_err_Y", "rel_err_D",
    ):
        if k in d and d[k] is not None:
            v = d[k]
            row[k] = round(v, 6) if isinstance(v, float) else v
    for k in ("cached", "skipped", "live_skipped"):
        if d.get(k):
            row[k] = d[k]
    for k in ("error", "live_error"):
        if d.get(k):
            row[k] = str(d[k])[-80:]
    # stalled flags for rows cached before _mark_stalled existed
    thresh = 1e-6 if key.endswith("f64") else 2e-4
    for k in list(row):
        if k.endswith("solve_relres") and float(row[k]) > thresh:
            row.setdefault(k.replace("solve_relres", "stalled"), True)
    return row


def _headline(detail):
    head = detail.get("assembly_f32", {})
    gdofs = head.get("gdof_per_s", 0.0)
    target = 0.005  # 10M DOF / 2 s north-star rate (BASELINE.json)
    return json.dumps(
        {
            "metric": "jacobian_assembly_gdof_per_s",
            "value": round(gdofs, 6),
            "unit": "GDOF/s",
            "vs_baseline": round(gdofs / target, 3) if gdofs else 0.0,
            "modes": {
                k: _summary_row(k, v) for k, v in detail.items()
            },
        }
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default=None)
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument(
        "--model",
        default=None,
        help="twins mode: measure only this model (child-process row)",
    )
    ap.add_argument(
        "--deadline",
        type=float,
        default=float(os.environ.get("CALIBR8_BENCH_DEADLINE", 1140.0)),
        help="global wall-clock budget (s) for the full sweep",
    )
    args = ap.parse_args()

    _enable_compile_cache()

    if args.mode is not None:
        os.environ["CALIBR8_X64"] = "0" if args.dtype == "f32" else "1"
        n = args.n or (32 if args.dtype == "f32" else 20)
        out = run_mode(args.mode, args.dtype, n, model=args.model)
        if args.model is None:  # per-model rows persist via the parent
            _save_result(args.mode, args.dtype, n, out)
        print(json.dumps(out), flush=True)
        return

    t_start = time.perf_counter()
    detail = {}

    def emit():
        # full detail first (its own line, for humans / .bench_results
        # cross-checks), COMPACT headline LAST — the driver reads the
        # tail of stdout and must always see a parseable final line
        print(json.dumps({"detail": detail}), flush=True)
        print(_headline(detail), flush=True)

    def _on_signal(signum, frame):  # driver timeout → still emit record
        detail["aborted"] = f"signal {signum}"
        emit()
        sys.exit(0)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    # orchestrate: each (mode, dtype) in a fresh process for a clean
    # x64 config, CHEAPEST FIRST so a deadline cuts the expensive tail,
    # never the headline.  The compile cache makes repeat runs ~free.
    plans = [
        ("assembly", "f32", 32),
        ("newton", "f32", 32),
        ("adjoint", "f32", 32),
        ("newton_mg", "f32", 8),  # n=8 + 2 refinements = 196k elements
        ("adjoint_mg", "f32", 8),
        # dist composition cost on one chip: per-iteration overhead of
        # the shard_map/halo path at n_parts=1 vs the single-chip ELL
        ("dist_overhead", "f32", 32),
        ("scale", "f32", int(os.environ.get("CALIBR8_BENCH_SCALE_N", 64))),
        # n=10 -> h=0.01: a 22k-element / 34k-DOF notch FEMU workload
        # (evals-to-recovery + s/eval at a realistic mesh)
        ("calibration", "f64", 10),
        # >=100k-DOF calibration (VERDICT r4 #4): h=0.005 notch, AMG
        ("calibration", "f64", 5),
        ("assembly", "f64", 20),
        ("newton", "f64", 20),
        ("adjoint", "f64", 20),
        # f64 + multigrid on the SAME 48k-elem mesh as the one-level
        # f64 rows above (base n=5 + 2 refinements = 20^3 cube): the
        # one-level f64 adjoint converges but burns iterations near
        # tol=1e-8; MG is the h-robust answer at f64 too (XLA path —
        # f64 Pallas is structurally impossible on this TPU stack)
        ("newton_mg", "f64", 5),
        ("adjoint_mg", "f64", 5),
        # last: 16 models x 2 paths of compiles — the deadline cuts
        # this tail first; rows persist incrementally inside the mode
        ("twins", "f32", 16),
    ]
    seen_keys = set()
    for mode, dtype, n in plans:
        key = f"{mode}_{dtype}"
        # a mode listed twice (calibration at two mesh sizes) must not
        # overwrite its earlier detail row — the n=5 failure masked the
        # good n=10 result in the driver-facing record
        if key in seen_keys:
            key = f"{mode}{n}_{dtype}"
        seen_keys.add(key)
        remaining = args.deadline - (time.perf_counter() - t_start)
        if remaining < 90.0:
            cached = _load_cached(mode, dtype, n)
            detail[key] = (
                dict(cached, live_skipped="deadline")
                if cached
                else {"skipped": "deadline"}
            )
            emit()
            continue
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
                timeout=remaining - 20.0,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = r.stdout.strip().splitlines()[-1]
            detail[key] = json.loads(line)
        except Exception as e:  # noqa: BLE001 — record and continue
            err = {"error": str(e)[-300:]}
            if r is not None and r.stderr:
                err["stderr_tail"] = r.stderr[-600:]
            cached = _load_cached(mode, dtype, n)
            detail[key] = (
                dict(cached, live_error=err["error"],
                     live_stderr_tail=err.get("stderr_tail", ""))
                if cached
                else err
            )
        emit()

    detail["total_wall_s"] = round(time.perf_counter() - t_start, 1)
    emit()


if __name__ == "__main__":
    main()

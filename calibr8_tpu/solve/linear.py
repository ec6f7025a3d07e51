"""Linear solves for the assembled (EBE) block system.

Native replacement for the reference's Trilinos solve stack — Belos
Block GMRES with a Teko block-2x2 Gauss-Seidel preconditioner whose
blocks are MueLu AMG (reference: source/calibr8/src/linear_solve.cpp:36-123).

TPU-first: the Jacobian is kept as unassembled element blocks
(n_elem, nde, nde); J@v is a batched einsum + segment_sum (MXU + one
scatter), and Krylov reductions are plain jnp dots, which XLA lowers to
ICI collectives under sharding.  Preconditioning is point-Jacobi or a
block u/p Gauss-Seidel sweep with Jacobi-preconditioned inner blocks
(Chebyshev/AMG upgrades live in solve/precond.py as they land).

For small systems (tests, coarse meshes) a dense direct path scatters
the element blocks and LU-solves — exact, robust, fast under ~5k dofs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from calibr8_tpu.fem.assembly import dense_matrix, ebe_matvec_disc
from calibr8_tpu.fem.bcs import apply_dbcs_dense, apply_dbcs_matvec


@dataclass(frozen=True)
class LinearCfg:
    method: str = "auto"  # auto | dense | gmres | cg
    tol: float = 1e-6
    max_iters: int = 200
    restart: int = 200
    dense_cutoff: int = 6000
    # 'block_gs' = u/p block Gauss-Seidel with node-block Jacobi (the
    # Teko BGS2x2 + relaxation analog, linear_solve.cpp:36-123) or
    # 'jacobi' point scaling
    preconditioner: str = "block_gs"
    # iterative-refinement passes (the adjoint solve's refinement loop,
    # adjoint.cpp:113-180): after each Krylov solve, re-solve for the
    # residual correction until ||b - A x|| drops below tol * ||b||
    refine_iters: int = 0
    # Krylov operator form: 'auto' assembles node-block ELLPACK on TPU
    # (scatter-free matvec, ~3x faster per iteration; solve/ellpack.py),
    # 'ebe' forces the matrix-free element-by-element apply
    operator: str = "auto"
    # multigrid hierarchy reuse (the MueLu reuse discipline,
    # linear_solve.cpp:36-123): 'none' rebuilds the hierarchy inside
    # every Krylov solve; 'step' builds it ONCE per Newton step from
    # the first Jacobian (mg.make_state) and lags it across the step's
    # iterations — the fine-level operator stays current, only the
    # coarse Galerkin/spectral-bound/coarse-inverse arrays lag, so
    # convergence is checked against the TRUE residual as always.
    # Deck: linear algebra: {preconditioner reuse: step}
    precond_reuse: str = "none"


def solve(
    cfg: LinearCfg,
    J_e,
    disc,
    diag,
    b,
    bc_dofs,
    transpose: bool = False,
    mg=None,
):
    """Solve J x = b (see solve_info); returns x only."""
    return solve_info(cfg, J_e, disc, diag, b, bc_dofs, transpose, mg)[0]


def mg_make_state(cfg, J_e, disc, diag, bc_dofs, mg, transpose=False):
    """Build the multigrid hierarchy state for solve_info(mg_state=...)
    with the SAME operator construction solve_info uses (transpose
    swap + assembled-ELL fine apply), so the state program can run as
    its own jit: the Galerkin/lmax/Newton-Schulz code leaves the
    Krylov executable and the rebuild amortizes across Newton
    iterations (preconditioner lag — the MueLu reuse discipline,
    linear_solve.cpp:36-123)."""
    from calibr8_tpu.fem.assembly import jac_is_trailing

    trailing = jac_is_trailing(J_e, disc)
    if transpose:
        op_e = J_e.swapaxes(0, 1) if trailing else J_e.swapaxes(-1, -2)
    else:
        op_e = J_e
    if cfg.operator != "ebe" and jax.default_backend() == "tpu":
        from calibr8_tpu.solve.ellpack import EllOperator

        op = EllOperator(disc, J_e, diag, bc_dofs, transpose=transpose)
    else:

        def op(v):
            out = ebe_matvec_disc(op_e, disc, v)
            return apply_dbcs_matvec(out, diag, v, bc_dofs)

    return mg.make_state(op_e, diag, bc_dofs, op, transpose=transpose)


def solve_info(
    cfg: LinearCfg,
    J_e,
    disc,
    diag,
    b,
    bc_dofs,
    transpose: bool = False,
    mg=None,
    return_iters: bool = False,
    mg_state=None,
):
    """Solve J x = b with Dirichlet rows replaced by diag * x_row = b_row.

    transpose=True solves J^T x = b with Dirichlet *columns* of J^T
    (rows of J) constrained — the adjoint system (adjoint.cpp:133-145).

    Returns (x, relres) with relres = ||b - J x|| / ||b|| recomputed
    from the true residual — the Belos status-check analog
    (linear_solve.cpp:106-123); callers react to non-convergence the
    way the reference primal does (primal.cpp:163-195).
    """
    edofs = disc.edofs
    n_dofs = disc.n_dofs
    method = cfg.method
    if method == "auto":
        method = "dense" if n_dofs <= cfg.dense_cutoff else "gmres"

    # The reference assembles (dR/dx)^T for the adjoint and then applies
    # the same Dirichlet row elimination to the transposed operator with a
    # zero RHS at constrained rows (eval_adjoint_jacobian + dbcs.cpp with
    # is_adjoint=true): transpose FIRST, then eliminate rows.
    from calibr8_tpu.fem.assembly import jac_is_trailing

    trailing = jac_is_trailing(J_e, disc)  # (nde, nde, E_pad) layout
    if transpose:
        op_e = J_e.swapaxes(0, 1) if trailing else J_e.swapaxes(-1, -2)
    else:
        op_e = J_e

    norm_b = jnp.linalg.norm(b)
    safe_nb = jnp.where(norm_b > 0, norm_b, 1.0)

    if method == "dense":
        eb = (
            jnp.moveaxis(op_e, -1, 0)[: edofs.shape[0]] if trailing else op_e
        )
        A = dense_matrix(eb, edofs, n_dofs)
        A = apply_dbcs_dense(A, diag, bc_dofs)
        if A.dtype == jnp.float64 and jax.default_backend() == "tpu":
            # TPU LuDecomposition is f32-only and the axon runtime has
            # no host callbacks, so the f64 direct solve is f32 LU +
            # mixed-precision iterative refinement on the f64 residual
            # (error contracts ~kappa*eps32 per sweep; the true-residual
            # relres below still reports any non-convergence)
            from jax.scipy.linalg import lu_factor, lu_solve

            lu = lu_factor(A.astype(jnp.float32))
            x = lu_solve(lu, b.astype(jnp.float32)).astype(A.dtype)

            def _refine(_, xk):
                r = b - A @ xk
                return xk + lu_solve(lu, r.astype(jnp.float32)).astype(
                    A.dtype
                )

            x = jax.lax.fori_loop(0, 8, _refine, x)
        else:
            x = jnp.linalg.solve(A, b)
        rr = jnp.linalg.norm(b - A @ x) / safe_nb
        if return_iters:
            return x, rr, jnp.asarray(0, jnp.int32)
        return x, rr

    op, M = _gmres_setup(
        cfg, J_e, op_e, disc, diag, bc_dofs, transpose, mg, mg_state
    )

    from calibr8_tpu.solve.gmres import gmres_cycle, pcg

    if method == "cg":
        x, _ = pcg(op, b, M, cfg.tol, cfg.max_iters)
        for _ in range(cfg.refine_iters):
            r = b - op(x)
            cand, _ = pcg(op, r, M, cfg.tol, cfg.max_iters)
            cand = x + cand
            ok = jnp.isfinite(jnp.sum(cand))
            x = jnp.where(
                (jnp.linalg.norm(r) > cfg.tol * norm_b) & ok, cand, x
            )
        rr = jnp.linalg.norm(b - op(x)) / safe_nb
        if return_iters:
            return x, rr, jnp.asarray(0, jnp.int32)
        return x, rr

    # GMRES with MANUAL restarts: each cycle re-orthogonalizes from the
    # TRUE residual with an absolute target, and a non-finite cycle
    # (f32 breakdown under restarts) is dropped instead of poisoning
    # the solution.  cfg.max_iters counts TOTAL inner iterations (the
    # Belos convention).  The cycle itself is the own-rolled jitted
    # GMRES(m) (solve/gmres.py): per-iteration Givens residual
    # estimate with EARLY EXIT, and no custom_linear_solve — so the
    # preconditioner may contain data-dependent trip bounds (the
    # executable-size fix for the Chebyshev smoother loops).
    #
    # RIGHT preconditioning (solve (A M) y = r, dx = M y) — the Belos
    # GMRES default.  A left-applied M would minimize the
    # PRECONDITIONED residual ||M (b - A x)||; with the mixed u/p
    # block preconditioner that norm is wildly distorted (the
    # stabilized pressure block's inverse amplifies p rows ~1e6 over u
    # rows), and a least-squares step that shrinks ||M r|| can GROW the
    # true residual — measured: one 30-iteration cycle took relres from
    # 1.0 to 4.98 at 196k elements.  Composing M into the operator
    # keeps the minimization in the TRUE residual norm with the same
    # Krylov spectrum.
    restart = min(cfg.restart, n_dofs)
    n_outer = max(1, -(-cfg.max_iters // restart)) + cfg.refine_iters
    atol = cfg.tol * norm_b

    def opM(v):
        return op(M(v))

    def cond_fn(c):
        _, it, _, done, _ = c
        return (it < n_outer) & jnp.logical_not(done)

    def body(c):
        x, it, stag, _, ki = c
        r = b - op(x)
        rn = jnp.linalg.norm(r)
        # in-cycle target one digit below the outer atol: stopping a
        # cycle exactly AT tol leaves the solution with O(tol) error
        # and degrades cross-path reproducibility (dist-vs-single
        # parity measured 1.06e-9 at tol 1e-10 when exiting at atol);
        # the pre-floor early exit still saves the wasted tail of a
        # full fixed-length cycle.  After a NO-PROGRESS cycle the next
        # one runs FULL LENGTH (early exit off): near the f32 floor the
        # Givens recurrence estimate goes optimistic as the CGS2 basis
        # degrades, so a re-entered cycle exits immediately with no
        # true-residual drop and the stag counter ends the solve a
        # digit short (the 1.1M-DOF adjoint gave up at 2.1e-4 against
        # tol 1e-4 this way); a full cycle re-orthogonalizes from the
        # true residual and usually buys the remaining digit.
        cyc_atol = jnp.where(stag > 0, 0.0, 0.1 * atol)
        dy, _, k_used = gmres_cycle(opM, r, restart, cyc_atol)
        cand = x + M(dy)
        rn_new = jnp.linalg.norm(b - op(cand))
        better = jnp.isfinite(rn_new) & (rn_new < rn)
        x_next = jnp.where(better, cand, x)
        # stop on convergence or TWO consecutive no-progress cycles
        # (< 5% drop, or a dropped non-improving/non-finite cycle).
        # A single bad cycle must NOT end the solve: restarting from
        # the true residual re-orthogonalizes and usually recovers —
        # both the plateau-then-converge pattern (MG + tight f64
        # tolerances) and an f32 long-restart cycle whose CGS2 basis
        # lost orthogonality near the floor (the 1.1M-DOF deg-4 newton
        # exited at relres 4.4e-4 on one such cycle where the deg-2
        # run had reached 9.1e-5).
        progress = better & (rn_new <= 0.95 * rn)
        stag_next = jnp.where(progress, 0, stag + 1)
        done = (jnp.minimum(rn_new, rn) <= atol) | (stag_next >= 2)
        return (x_next, it + 1, stag_next, done, ki + k_used)

    x, _, _, _, ki = jax.lax.while_loop(
        cond_fn, body, (jnp.zeros_like(b), 0, 0, False, jnp.asarray(0, jnp.int32))
    )
    relres = jnp.linalg.norm(b - op(x)) / safe_nb
    if return_iters:
        return x, relres, ki
    return x, relres


def _gmres_setup(cfg, J_e, op_e, disc, diag, bc_dofs, transpose, mg,
                 mg_state):
    """Krylov operator + preconditioner construction shared by
    solve_info (in-program while_loop restarts) and solve_cycle
    (host-orchestrated restarts)."""
    if cfg.operator != "ebe" and jax.default_backend() == "tpu":
        # assembled node-block ELL apply: built once per solve (jit
        # hoists it out of the Krylov loop), no per-iteration scatter
        from calibr8_tpu.solve.ellpack import EllOperator

        # pass the UN-swapped Jacobian + the transpose flag: the TPU
        # assembly folds the transpose into its scatter ids, so the
        # only wholesale consumer of the swapped op_e disappears and
        # XLA can fuse the swapaxes into MG/BGS's per-(i,j) slices
        # instead of materializing the 1.6 GB trailing copy (the scale
        # adjoint sat 1.4 GB over the 16 GB HBM)
        op = EllOperator(disc, J_e, diag, bc_dofs, transpose=transpose)
    else:

        def op(v):
            out = ebe_matvec_disc(op_e, disc, v)
            return apply_dbcs_matvec(out, diag, v, bc_dofs)

    if mg is not None:
        # geometric multigrid V-cycle (the MueLu AMG analog, solve/mg.py);
        # mg_state (from mg_make_state) hoists the hierarchy build out
        # of this program — preconditioner lag + executable-size split
        M = mg.make(
            op_e, diag, bc_dofs, op, transpose=transpose, state=mg_state
        )
    elif cfg.preconditioner == "block_gs":
        from calibr8_tpu.solve.precond import BlockJacobiGS

        # transpose solves use the TRANSPOSED forward preconditioner,
        # built from the forward Jacobians (solve/precond.py)
        M = BlockJacobiGS(disc, J_e, diag, bc_dofs, transpose=transpose)
    else:
        safe_diag = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)

        def M(v):
            return v / safe_diag

    return op, M


def solve_cycle(cfg, J_e, disc, diag, b, x, stag, bc_dofs,
                transpose=False, mg=None, mg_state=None, tol=None):
    """ONE right-preconditioned GMRES(m) restart cycle + true-residual
    update — the building block of HOST-ORCHESTRATED outer restarts.

    Why this exists: the axon TPU tunnel KILLS any single dispatch
    whose device execution runs past ~50-60 s (the worker process
    crashes; bisected with a pure-matmul fori_loop by
    scripts/probe_long_dispatch.py — 47.6 s runs, 60 s dies).  At
    1.1M DOF a full solve_info dispatch at restart=100 is 80+ s, which
    is why every scale adjoint rerun died UNAVAILABLE while restart=40
    (~32 s/cycle) survived.  Running the outer restart loop on HOST
    bounds each dispatch to one cycle; the ~30 ms tunnel RTT per cycle
    is noise against multi-second cycles.

    Semantics mirror ONE body iteration of solve_info's outer
    while_loop exactly, including the full-length-cycle-after-stall
    recovery (stag > 0 disables the early exit).  Returns
    (x_next, rn, rn_new, stag_next, k_used); the true residual of
    x_next is min(rn, rn_new) by construction (x_next is whichever of
    x/candidate has the smaller true residual).
    """
    from calibr8_tpu.fem.assembly import jac_is_trailing
    from calibr8_tpu.solve.gmres import gmres_cycle

    trailing = jac_is_trailing(J_e, disc)
    if transpose:
        op_e = J_e.swapaxes(0, 1) if trailing else J_e.swapaxes(-1, -2)
    else:
        op_e = J_e
    op, M = _gmres_setup(
        cfg, J_e, op_e, disc, diag, bc_dofs, transpose, mg, mg_state
    )
    restart = min(cfg.restart, disc.n_dofs)
    # tol may arrive as a TRACED scalar (mixed-precision IR passes a
    # different relative target per refinement pass — a python float
    # would retrace/recompile the cycle program every pass)
    atol = (cfg.tol if tol is None else tol) * jnp.linalg.norm(b)

    def opM(v):
        return op(M(v))

    r = b - op(x)
    rn = jnp.linalg.norm(r)
    cyc_atol = jnp.where(stag > 0, 0.0, 0.1 * atol)
    dy, _, k_used = gmres_cycle(opM, r, restart, cyc_atol)
    cand = x + M(dy)
    rn_new = jnp.linalg.norm(b - op(cand))
    better = jnp.isfinite(rn_new) & (rn_new < rn)
    x_next = jnp.where(better, cand, x)
    progress = better & (rn_new <= 0.95 * rn)
    stag_next = jnp.where(progress, 0, stag + 1)
    return x_next, rn, rn_new, stag_next, k_used


def residual_hp(J_e, disc, diag, b, x, bc_dofs, transpose=False):
    """True residual r = b - A x in the highest enabled precision.

    With jax x64 enabled (CALIBR8_IR=1 or the f64 default config) the
    element blocks, RHS, and iterate promote to f64 for the matvec —
    the measuring stick of mixed-precision iterative refinement.  The
    f32-arithmetic relres floor at 1M+ DOF (~eps32 * ||A|| ||x|| /
    ||b||, measured 1.5-2e-4 for the 1.1M-DOF transposed system) is an
    EVALUATION artifact: only an f64 residual can certify convergence
    below it, exactly as the reference's f64 Belos status checks do
    (source/calibr8/src/linear_solve.cpp:106-123).

    Returns (r_lp, relres_hp): the residual cast to b's dtype (the
    next correction solve's RHS) and the high-precision relative
    residual scalar.  x may already be the f64 accumulator — it is
    promoted, never demoted.
    """
    # canonicalize_dtype respects BOTH the global x64 flag and the
    # scoped jax.experimental.enable_x64() context this is traced under
    hp = jax.dtypes.canonicalize_dtype(jnp.float64)
    from calibr8_tpu.fem.assembly import jac_is_trailing

    trailing = jac_is_trailing(J_e, disc)
    if transpose:
        op_e = J_e.swapaxes(0, 1) if trailing else J_e.swapaxes(-1, -2)
    else:
        op_e = J_e
    op64 = op_e.astype(hp)
    x64 = x.astype(hp)
    b64 = b.astype(hp)
    out = ebe_matvec_disc(op64, disc, x64)
    out = apply_dbcs_matvec(out, diag.astype(hp), x64, bc_dofs)
    r = b64 - out
    nb = jnp.linalg.norm(b64)
    relres = jnp.linalg.norm(r) / jnp.where(nb > 0, nb, 1.0)
    return r.astype(b.dtype), relres


def host_ir_loop(cycle_call, resid_step, b_like, tol, max_iters,
                 restart, refine_iters=1, max_passes=4,
                 inner_floor=3e-4):
    """Mixed-precision iterative refinement around host-cycled f32
    GMRES solves: f64 solution accumulator + f64 true residual + f32
    correction solves.

      z64 = 0; d = 0
      repeat: (z64, r32, relres64) = resid_step(z64, d)   # z += d,
              if relres64 <= tol: done                    # f64 measure
              d = f32-solve A d = r32 to rel target tol/relres64
    The first pass solves the full system to the f32 floor; each later
    pass needs only a SHALLOW correction solve (the relative target is
    tol/relres64 — e.g. 0.59 after a 1.7e-4 floor stall against tol
    1e-4), so refinement costs a handful of Krylov iterations plus one
    f64 matvec per pass.  Convergence criterion and the returned
    relres are the f64 truth.

    cycle_call(rhs, z, stag:int32, tol_scalar) -> solve_cycle tuple,
    traced WITHOUT x64.  resid_step(z64_or_None, d) -> (z64_new, r_lp,
    relres_hp), traced by the caller under
    jax.experimental.enable_x64() — the accumulator update z64 + d and
    the promoted residual live in the ONLY x64 program; everything
    else stays bit-identical to the plain f32 pipeline (process-wide
    x64 recompiles the hierarchy programs with i64 index types and
    crashed the remote TPU compile helper at 1.1M DOF).  Returns
    (z64, relres_float, total_iters, passes).
    """
    z64 = None
    d = jnp.zeros_like(b_like)
    total_ki = 0
    relres = float("inf")
    for p in range(max_passes):
        z64, r_lp, relres_hp = resid_step(z64, d)
        relres = float(relres_hp)
        if relres <= tol or relres != relres:
            return z64, relres, total_ki, p
        # relative target for this correction: tol/relres makes the
        # OVERALL f64 relres <= tol, clamped to [inner_floor, 0.5].
        # The floor matters: an f32 correction solve cannot reach below
        # ~2e-4 relative (measured 1.7e-4 at 1.1M DOF), and REQUESTING
        # less sends the solver into its stall-recovery cycles — the
        # first capture burned ~60 extra full-length iterations
        # grinding at the floor before the second pass cleaned up.
        # Asking for 3e-4 converges cleanly and the f64 accumulation
        # squares the reduction across passes (3e-4 -> 9e-8 in two).
        inner_tol = min(0.5, max(tol / relres, inner_floor))
        norm_r = float(jnp.linalg.norm(r_lp))
        d, _, ki = host_restart_loop(
            lambda z, stag: cycle_call(
                r_lp, z, stag, jnp.asarray(inner_tol, r_lp.dtype)
            ),
            jnp.zeros_like(r_lp), norm_r, inner_tol, max_iters,
            restart, refine_iters,
        )
        total_ki += ki
    z64, r_lp, relres_hp = resid_step(z64, d)
    return z64, float(relres_hp), total_ki, max_passes


def host_restart_loop(cycle_call, x0, norm_b, tol, max_iters, restart,
                      refine_iters=1):
    """Outer GMRES restart loop on HOST over a jitted solve_cycle
    wrapper — same termination discipline as solve_info's while_loop
    (converged, or two consecutive no-progress cycles), with every
    float() fetch bounding the device dispatch to one cycle (see
    solve_cycle's docstring for the ~50-60 s axon dispatch ceiling).

    cycle_call(x, stag:int32) -> (x_next, rn, rn_new, stag_next,
    k_used) device tuple; x0 seeds the first cycle (zeros for a fresh
    solve).  Returns (x, relres_float, total_iters).
    """
    atol = float(tol) * float(norm_b)
    safe_nb = float(norm_b) if float(norm_b) > 0 else 1.0
    n_outer = max(1, -(-int(max_iters) // int(restart))) + int(refine_iters)
    x = x0
    stag = 0
    ki = 0
    relres = float('inf')
    for it in range(n_outer):
        x, rn, rn_new, stag_d, k = cycle_call(x, stag)
        rn_f = float(rn)
        rn_new_f = float(rn_new)
        stag = int(stag_d)
        ki += int(k)
        relres = min(rn_new_f, rn_f) / safe_nb
        if min(rn_new_f, rn_f) <= atol or stag >= 2:
            break
    return x, relres, ki

"""Global Newton solve with backtracking Armijo line search.

Mirrors the reference primal Newton loop (source/calibr8/src/primal.cpp:31-209)
and its line search (source/calibr8/src/line_search.hpp): merit
phi = 1/2 ||R||^2, base slope phi'(0) = -||R_0||^2, trial slope
phi'(alpha) = R(alpha) . (A(alpha) dx), Hermite-cubic backtracking with
safeguards, and contraction on failed local (constitutive) solves.

Because the local state is re-solved functionally at every residual
evaluation (xi = local_solve(x, ...)), the merit is a pure function of
alpha — no snapshot/restore of integration-point fields is needed
(the reference must copy fields: primal.cpp:63-195).

Each Newton iteration reuses the line search's accepted-trial assembly
as the next iteration's base assembly (the reference re-assembles).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.fem.bcs import apply_dbcs_matvec, apply_dbcs_residual
from calibr8_tpu.fem.assembly import ebe_matvec_disc
from calibr8_tpu.solve import linear as linear_mod


@dataclass
class LineSearchParams:
    """Deck sublist 'line search' (line_search.hpp:25-38)."""

    c1: float = 1.0e-4
    backtrack_min: float = 0.5
    backtrack_max: float = 0.9
    max_evals: int = 4
    print_info: bool = False


@dataclass
class NewtonCfg:
    max_iters: int = 15
    abs_tol: float = 1e-8
    rel_tol: float = 1e-8
    print_convergence: bool = False
    linear: linear_mod.LinearCfg = field(default_factory=linear_mod.LinearCfg)
    line_search: LineSearchParams = field(default_factory=LineSearchParams)


def _cubic_min(phi_0, dphi_0, a, phi, slope_a):
    """Two-point Hermite cubic minimizer (line_search.hpp:59-76)."""
    d1 = dphi_0 + slope_a - 3.0 * (phi_0 - phi) / (0.0 - a)
    radicand = d1 * d1 - dphi_0 * slope_a
    if radicand < 0.0:
        return 0.5 * a
    d2 = np.sqrt(radicand)
    denom = slope_a - dphi_0 + 2.0 * d2
    if denom == 0.0:
        return 0.5 * a
    return a - a * (slope_a + d2 - d1) / denom


class NewtonSolveError(RuntimeError):
    pass


class StepSolver:
    """Solves one pseudo-time step: R(x; x_prev, xi(x), p) = 0."""

    def __init__(self, assembler, cfg: NewtonCfg, use_pallas: bool | None = None):
        self.assembler = assembler
        self.cfg = cfg
        self._pallas_assemble = None
        if use_pallas is None:
            import os

            use_pallas = (
                os.environ.get("CALIBR8_PALLAS", "1") != "0"
                and jax.devices()[0].platform == "tpu"
            )
        if use_pallas:
            from calibr8_tpu.fem import pallas_assembly

            if pallas_assembly.supports_pallas(assembler):
                raw = pallas_assembly.make_pallas_assemble(assembler)
                self._pallas_assemble = raw
                self._pallas_prepare = jax.jit(raw.prepare)
                self._prepared = None  # (id(x_prev), id(xi_prev)) cache
        self._assemble = jax.jit(self._assemble_impl)
        self._slope = jax.jit(self._slope_impl)

    def _assemble_impl(self, x, x_prev, xi_prev, params, bc_dofs, bc_vals, ext_force):
        a = self.assembler
        if self._pallas_assemble is not None:
            # J_e comes back in the kernel's trailing (nde, nde, E_pad)
            # layout; the EBE matvec, preconditioner, and dense scatter
            # all accept it directly (fem/assembly.py:ebe_matvec_disc)
            R, J_e, diag, xi, path, nfail = self._pallas_assemble.assemble_prepared(
                x, x_prev, xi_prev, params, trailing_J=True
            )
            R = R - ext_force
            R_bc = apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals)
            return dict(
                xi=xi,
                path=path,
                nfail=nfail,
                R=R_bc,
                J_e=J_e,
                diag=diag,
                norm=jnp.linalg.norm(R_bc),
            )
        loc = a.local_solve(x, x_prev, xi_prev, params)
        R, J_e, diag = a.residual_and_jacobian(
            x, x_prev, loc.xi, xi_prev, loc.path, params
        )
        R = R - ext_force
        R_bc = apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals)
        nfail = jnp.sum(loc.failed)
        norm = jnp.linalg.norm(R_bc)
        return dict(
            xi=loc.xi,
            path=loc.path,
            nfail=nfail,
            R=R_bc,
            J_e=J_e,
            diag=diag,
            norm=norm,
        )

    def _slope_impl(self, J_e, diag, R, dx, bc_dofs):
        n_dofs = R.shape[0]
        Adx = ebe_matvec_disc(J_e, self.assembler.disc, dx)
        Adx = apply_dbcs_matvec(Adx, diag, dx, bc_dofs)
        return jnp.dot(R, Adx)

    def _linear_solve(self, base, bc_dofs):
        """Solve J dx = -R (overridden by the domain-decomposed solver,
        parallel/dist.py)."""
        dx, relres = linear_mod.solve_info(
            self.cfg.linear,
            base["J_e"],
            self.assembler.disc,
            base["diag"],
            -base["R"],
            bc_dofs,
            mg=getattr(self, "mg_factory", None),
            mg_state=getattr(self, "_mg_state", None),
        )
        return self._check_linear(dx, relres)

    def _maybe_build_mg_state(self, base, bc_dofs):
        """Preconditioner reuse (deck 'preconditioner reuse: step' —
        the MueLu reuse discipline, linear_solve.cpp:36-123): build the
        multigrid hierarchy state ONCE per Newton step from the base
        Jacobian and lag it across the step's iterations.  The fine
        operator stays current and GMRES checks the TRUE residual, so
        lag only affects iteration counts, never correctness."""
        self._mg_state = None
        mg = getattr(self, "mg_factory", None)
        if (
            self.cfg.linear.precond_reuse == "step"
            and mg is not None
            and getattr(mg, "recursive", False)
        ):
            self._mg_state = linear_mod.mg_make_state(
                self.cfg.linear, base["J_e"], self.assembler.disc,
                base["diag"], bc_dofs, mg,
            )

    def _check_linear(self, dx, relres):
        """Belos-status-check analog (linear_solve.cpp:106-123): a
        diverged Krylov solve must not feed garbage into the Newton
        update — the reference fail()s (primal.cpp:163-195)."""
        rr = float(relres)
        if not np.isfinite(rr) or rr > 0.5:
            raise NewtonSolveError(
                f"linear solve diverged (relative residual {rr:.3e})"
            )
        if self.cfg.print_convergence and rr > 10.0 * self.cfg.linear.tol:
            print(f" > linear solve: loose relative residual {rr:.3e}")
        return dx

    def solve_at_step(
        self,
        x,
        x_prev,
        xi_prev,
        params,
        bc_dofs,
        bc_vals,
        ext_force,
        step: int = 0,
    ):
        """Returns (x, xi, path, info). Raises NewtonSolveError on failure
        (the reference fail()s: primal.cpp:99-104, 183-191, 203-207)."""
        cfg = self.cfg
        do_print = cfg.print_convergence
        disc = self.assembler.disc

        if do_print:
            print(f"ON PRIMAL STEP ({step})")

        from calibr8_tpu.utils import timers

        if self._pallas_assemble is not None:
            # x_prev / xi_prev are constant for the whole step: hoist
            # their gather+relayout out of every assembly
            x_prev, xi_prev = self._pallas_prepare(x_prev, xi_prev)

        with timers.phase("primal/assemble"):
            base = self._assemble(
                x, x_prev, xi_prev, params, bc_dofs, bc_vals, ext_force
            )
            jax.block_until_ready(base["norm"])
        if int(base["nfail"]) > 0:
            raise NewtonSolveError(
                f"primal step {step}: local solve failed at the base point"
            )
        with timers.phase("primal/mg_state"):
            self._maybe_build_mg_state(base, bc_dofs)

        converged = False
        resid_norm_0 = 1.0
        it = 1
        while it <= cfg.max_iters:
            if do_print:
                print(f" > ({it}) Newton iteration")
            abs_norm = float(base["norm"])
            if it == 1:
                resid_norm_0 = abs_norm
            rel_norm = abs_norm / max(resid_norm_0, 1e-300)
            if do_print:
                print(f" > absolute ||R|| = {abs_norm:e}")
                print(f" > relative ||R|| = {rel_norm:e}")
            if abs_norm < cfg.abs_tol or rel_norm < cfg.rel_tol:
                converged = True
                break

            with timers.phase("primal/linear_solve"):
                dx = self._linear_solve(base, bc_dofs)
                jax.block_until_ready(dx)

            # --- Armijo backtracking line search (line_search.hpp) ---
            ls = cfg.line_search
            phi_0 = 0.5 * abs_norm * abs_norm
            dphi_0 = -2.0 * phi_0
            armijo_slope = ls.c1 * dphi_0

            alpha = 1.0
            best = None  # (phi, alpha, assembled-state)
            accepted = None
            for n in range(1, ls.max_evals + 1):
                x_t = x + alpha * dx
                with timers.phase("primal/assemble"):
                    trial = self._assemble(
                        x_t, x_prev, xi_prev, params, bc_dofs, bc_vals, ext_force
                    )
                    jax.block_until_ready(trial["norm"])
                if int(trial["nfail"]) > 0:
                    alpha *= 0.5
                    continue
                tn = float(trial["norm"])
                phi = 0.5 * tn * tn
                if best is None or phi < best[0]:
                    best = (phi, alpha, trial)
                if phi <= phi_0 + alpha * armijo_slope:
                    accepted = (alpha, trial)
                    if do_print and n > 1:
                        print(f" > line search: alpha = {alpha:.3e} ({n} evals)")
                    break
                slope = float(
                    self._slope(trial["J_e"], trial["diag"], trial["R"], dx, bc_dofs)
                )
                alpha_model = _cubic_min(phi_0, dphi_0, alpha, phi, slope)
                alpha = min(
                    max(alpha_model, ls.backtrack_min * alpha),
                    ls.backtrack_max * alpha,
                )

            if accepted is None:
                if best is None:
                    raise NewtonSolveError(
                        f"primal step {step}, Newton iter {it}: line search could "
                        "not assemble at any trial step (local solve diverged)"
                    )
                if do_print:
                    print(
                        f" > line search: reached max evals, alpha = {best[1]:.3e}"
                    )
                accepted = (best[1], best[2])

            alpha, base = accepted
            x = x + alpha * dx
            it += 1

        if not converged:
            raise NewtonSolveError(
                f"Newton's method failed in {cfg.max_iters} iterations"
            )

        info = dict(iterations=it, resid_norm=float(base["norm"]))
        return x, base["xi"], base["path"], info

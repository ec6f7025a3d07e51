"""Two-level (global/local) adjoint over pseudo-time steps.

Re-design of the reference adjoint path (source/calibr8/src/adjoint.cpp,
evaluations.cpp eval_adjoint_jacobian :349-520, solve_adjoint_local
:528-655, eval_qoi_gradient :758-930): marching BACKWARD over load
steps with per-integration-point history vectors

  f (element-dof sized)  and  g (local-state sized),

the recursion at step n is

  LHS       = (dR/dx + dR/dxi dxi_dx)^T          (condensed, transposed)
  RHS_e     = -dJ/dx + f + dxi_dx^T (g - dJ/dxi)
  solve        LHS z = RHS  with adjoint DBC rows (z = 0 on constrained)
  phi       = (dC/dxi)^{-T} (g' - (dR/dxi)^T z_e),  g' = g - dJ/dxi
  f_next    = -(dC/dx_prev)^T phi
  g_next    = -(dC/dxi_prev)^T phi
  dJ/dp    += sum_IP [ (dC/dp)^T phi + dJ/dp|direct + (dR/dp)^T z ]

This IS reverse-mode differentiation of the forward step recursion with
the local Newton solves differentiated implicitly — here realized with
explicit jacfwd blocks on the same pure element/model functions used by
the primal (no Sacado-style seeded re-evaluations), vmapped over
elements, with the branch path forced to the recorded primal branch
(the reference's force_path discipline for verification is the default
here, which also makes recomputation bit-consistent).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from calibr8_tpu.fem.bcs import zero_dbc_rows
from calibr8_tpu.solve import linear as linear_mod
from calibr8_tpu.utils.smallsolve import gauss_solve_T


class AdjointStepResult(NamedTuple):
    z: jnp.ndarray  # (n_dofs,) global adjoint
    phi: jnp.ndarray  # (n_elem, nxi) local adjoint
    f: jnp.ndarray  # (n_elem, nde) history for the previous step
    g: jnp.ndarray  # (n_elem, nxi) history for the previous step
    grad: jnp.ndarray  # (n_sets, n_params) parameter-gradient contribution
    relres: jnp.ndarray  # true residual of the transposed Krylov solve


class AdjointSolveError(RuntimeError):
    """A diverged adjoint Krylov solve (would silently corrupt dJ/dp)."""


class Adjoint:
    """Backward sweep driver.  Usage:

        adj = Adjoint(assembler, qoi, dbcs, linear_cfg)
        grad, zs = adj.sweep(traj, params_all, time_grid)
    """

    def __init__(self, assembler, qoi, dbcs, linear_cfg=None, mg_factory=None):
        self.assembler = assembler
        self.qoi = qoi
        self.dbcs = dbcs
        # multigrid preconditioner factory for the TRANSPOSED solves
        # (mirrored-sweep cycle, solve/mg.py mixed_wrap transpose=True);
        # pass prob.mg_factory to precondition the adjoint the same way
        # the reference's Teko/MueLu stack serves both directions
        # (linear_solve.cpp:36-123)
        self.mg_factory = mg_factory
        cfg = linear_cfg or linear_mod.LinearCfg()
        # the reference tightens the Belos tolerance for the adjoint and
        # runs an iterative-refinement loop (adjoint.cpp:41-49,113-180)
        import dataclasses

        self.linear_cfg = dataclasses.replace(
            cfg,
            tol=min(cfg.tol, 1e-8),
            refine_iters=max(cfg.refine_iters, 2),
        )
        self._step = jax.jit(self._step_impl)

    # -- element-block helpers -----------------------------------------
    def _blocks(self, x, x_prev, xi, xi_prev, path, params_all, parts="all"):
        """Per-element derivative blocks via ONE fused linearization in
        trailing (element-axis-last) layout — see
        Assembler.make_adjoint_blocks_kernel.  Returns trailing-layout
        blocks (suffix _T, element axis minor-most).  `parts` selects
        the seed groups ("solve"/"post" split past the element-chunk
        threshold — see _step_impl)."""
        a = self.assembler
        disc = a.disc
        if getattr(self, "_blocks_kernels", None) is None:
            self._blocks_kernels = {}
        kern = self._blocks_kernels.get(parts)
        if kern is None:
            kern = a.make_adjoint_blocks_kernel(parts)
            self._blocks_kernels[parts] = kern
        x_e = a.gather(x)
        xp_e = a.gather(x_prev)
        pars = a.params_per_elem(params_all)
        return kern(
            x_e.T,
            xp_e.T,
            xi.T,
            xi_prev.T,
            path,
            jnp.moveaxis(disc.grad_N, 0, -1),
            disc.detJ,
            disc.h,
            pars.T,
        )

    def _qoi_partials(self, x, x_prev, xi, params_all, aux):
        """Global QoI partials dJ/dx (n_dofs,), dJ/dxi (n_elem, nxi),
        dJ/dp (n_sets, n_params) — the analog of QoI<FADT> seeded
        evaluations (qoi.cpp:226-233), computed per element in trailing
        layout by QoI.partials (jax.grad of the elem-first `evaluate`
        materializes 32-43x tile-padded cotangents at the 1M-DOF
        scale — see qoi/base.py)."""
        disc = self.assembler.disc
        if self.qoi is None:
            return (
                jnp.zeros(disc.n_dofs, disc.dtype),
                jnp.zeros((disc.n_elem, self.assembler.nxi), disc.dtype),
                jnp.zeros_like(params_all),
            )
        return self.qoi.partials(x, x_prev, xi, params_all, aux)

    def _step_impl(
        self, x, x_prev, xi, xi_prev, path, params_all, f, g, bc_dofs, aux
    ):
        z, relres, B, g_modT, dJ_dp = self.step_solve(
            x, x_prev, xi, xi_prev, path, params_all, f, g, bc_dofs, aux
        )
        return self.step_post(
            x, x_prev, xi, xi_prev, path, params_all,
            z, relres, B, g_modT, dJ_dp,
        )

    def step_blocks(
        self, x, x_prev, xi, xi_prev, path, params_all, f, g, bc_dofs, aux
    ):
        """Pre-solve half of step_solve WITHOUT the Krylov solve:
        blocks + RHS + operator diagonal.  Returns
        (J_total_T, diag, rhs, B, g_modT, dJ_dp); B is None in two-pass
        mode.  A separate entry point so the scale bench can run
        blocks | krylov | post as THREE jit programs — the combined
        blocks+solve program declared 11.2 GB of temps at 1.1M DOF
        (the element-block linearize and the MG make/Krylov workspace
        co-declared), which together with 1.9 GB of generated code and
        the setup-resident arrays sat at the 16 GB HBM edge."""
        a = self.assembler
        disc = a.disc
        # Past the element-chunk threshold, split the blocks into a
        # pre-solve pass (seeds [xi, x_e] -> dxi_dx, J_total) and a
        # POST-solve recompute of the rest: holding all 8 trailing
        # E-blocks alive across the Krylov solve measured 15.9 GB of
        # compiled temps at 1.1M DOF against 16 GB HBM, while the
        # split costs ~13% more tangent seeds.
        from calibr8_tpu.fem.assembly import _elem_chunk_size

        two_pass = disc.n_elem > _elem_chunk_size()
        B = self._blocks(
            x, x_prev, xi, xi_prev, path, params_all,
            parts="solve" if two_pass else "all",
        )
        dJ_dx, dJ_dxi, dJ_dp = self._qoi_partials(x, x_prev, xi, params_all, aux)

        # RHS = -dJ/dx + scatter[ f + dxi_dx^T (g - dJ/dxi) ]
        # (all element math in trailing layout; one transpose before the
        # row-based scatter)
        g_modT = (g - dJ_dxi).T  # (nxi, n_elem)
        rhs_eT = f.T + jnp.einsum("ije,ie->je", B["dxi_dx_T"], g_modT)
        rhs = -dJ_dx + disc.scatter_elem(rhs_eT.T)
        rhs = zero_dbc_rows(rhs, bc_dofs)

        # diag of the (untransposed) operator for the DBC row scaling
        nde = B["J_total_T"].shape[0]
        dgT = jnp.stack([B["J_total_T"][i, i] for i in range(nde)], axis=0)
        diag = disc.scatter_elem(dgT.T)
        return (
            B["J_total_T"], diag, rhs,
            (None if two_pass else B), g_modT, dJ_dp,
        )

    def step_krylov(self, J_total_T, diag, rhs, bc_dofs,
                    return_iters: bool = False, mg_state=None):
        """The transposed Krylov solve (MG make + GMRES), program 2 of
        the scale three-way split.  mg_state (from
        linear.mg_make_state(..., transpose=True)) hoists the MG
        hierarchy build into its own program — preconditioner lag."""
        return linear_mod.solve_info(
            self.linear_cfg,
            J_total_T,
            self.assembler.disc,
            diag,
            rhs,
            bc_dofs,
            transpose=True,
            mg=getattr(self, "mg_factory", None),
            return_iters=return_iters,
            mg_state=mg_state,
        )

    def step_solve(
        self, x, x_prev, xi, xi_prev, path, params_all, f, g, bc_dofs, aux
    ):
        """Pre-solve blocks + RHS + the transposed Krylov solve.
        Returns (z, relres, B, g_modT, dJ_dp); B is None in two-pass
        mode (the post-solve blocks are recomputed by step_post — at
        the 1M-DOF scale holding all 8 trailing E-blocks across the
        solve blew the 16 GB HBM).  step_solve/step_post are separate
        entry points so the scale bench can run them as TWO jit
        programs whose temps never co-reside."""
        J_total_T, diag, rhs, B, g_modT, dJ_dp = self.step_blocks(
            x, x_prev, xi, xi_prev, path, params_all, f, g, bc_dofs, aux
        )
        mg_state = None
        mg = getattr(self, "mg_factory", None)
        if (
            self.linear_cfg.precond_reuse == "step"
            and mg is not None
            and getattr(mg, "recursive", False)
        ):
            # deck 'preconditioner reuse: step': the TRANSPOSED
            # hierarchy state builds outside the Krylov program — at
            # scale this is what keeps the solve executable under the
            # ~2 GB load ceiling (the adjoint solves once per time
            # step, so there is no within-step amortization; the win
            # here is the program split itself)
            mg_state = linear_mod.mg_make_state(
                self.linear_cfg, J_total_T, self.assembler.disc, diag,
                bc_dofs, mg, transpose=True,
            )
        z, relres = self.step_krylov(
            J_total_T, diag, rhs, bc_dofs, mg_state=mg_state
        )
        return z, relres, B, g_modT, dJ_dp

    def step_post(
        self, x, x_prev, xi, xi_prev, path, params_all,
        z, relres, B, g_modT, dJ_dp,
    ):
        """Post-solve half: local adjoint phi, f/g history updates and
        the parameter-gradient contribution.  B is None in two-pass
        mode — the post blocks are recomputed here, anchored on the
        solve output so XLA cannot hoist the recompute above the solve
        (0*z cannot fold because z may be non-finite)."""
        a = self.assembler
        disc = a.disc
        if B is None:
            anchor = (0.0 * z[0]).astype(x.dtype)
            B = self._blocks(
                x + anchor, x_prev, xi, xi_prev, path, params_all,
                parts="post",
            )
        z_eT = disc.gather_elem(z).T  # (nde, n_elem)
        rhs_phiT = g_modT - jnp.einsum("jie,je->ie", B["dR_dxi_T"], z_eT)
        phiT = gauss_solve_T(
            B["dC_dxi_T"].swapaxes(0, 1), rhs_phiT[:, None, :]
        )[:, 0, :]
        f_nextT = -jnp.einsum("ije,ie->je", B["dC_dxprev_T"], phiT)
        g_nextT = -jnp.einsum("ije,ie->je", B["dC_dxiprev_T"], phiT)

        # parameter gradient: (dC/dp)^T phi + dJ/dp + (dR/dp)^T z
        grad_e = (
            jnp.einsum("ipe,ie->ep", B["dC_dp_T"], phiT)
            + jnp.einsum("jpe,je->ep", B["dR_dp_T"], z_eT)
        )
        n_sets = params_all.shape[0]
        grad = (
            jax.ops.segment_sum(grad_e, disc.es_ids, num_segments=n_sets)
            + dJ_dp
        )

        return AdjointStepResult(
            z=z, phi=phiT.T, f=f_nextT.T, g=g_nextT.T, grad=grad,
            relres=relres,
        )

    def _check_linear(self, relres, step):
        """Belos-status-check analog for the transposed solve
        (adjoint.cpp:113-180 runs refinement until converged; a solve
        that still diverged must not feed garbage into dJ/dp)."""
        import numpy as np

        rr = float(relres)
        if not np.isfinite(rr) or rr > 0.5:
            raise AdjointSolveError(
                f"adjoint linear solve diverged at step {step} "
                f"(relative residual {rr:.3e})"
            )

    # -- public sweep ---------------------------------------------------
    def sweep(self, traj, params_all, time_grid, bc_dofs=None):
        """Backward over all steps; returns (grad (n_sets, n_params),
        adjoint trajectory [(z, phi)] indexed by step)."""
        a = self.assembler
        disc = a.disc
        nde = disc.edofs.shape[1]
        f = jnp.zeros((disc.n_elem, nde), disc.dtype)
        g = jnp.zeros((disc.n_elem, a.nxi), disc.dtype)
        grad = jnp.zeros_like(params_all)
        zs = {}
        n = time_grid.num_steps
        for step in range(n, 0, -1):
            t = time_grid.time(step)
            if bc_dofs is None:
                bcd, _ = self.dbcs.arrays(t, step)
            else:
                bcd = bc_dofs
            aux = (
                self.qoi.setup_step(
                    step, t, time_grid.dt(step), time_grid.total_time
                )
                if self.qoi is not None
                else ()
            )
            from calibr8_tpu.utils import timers

            with timers.phase("adjoint/step"):
                res = self._step(
                    traj.x[step],
                    traj.x[step - 1],
                    traj.xi[step],
                    traj.xi[step - 1],
                    traj.path[step],
                    params_all,
                    f,
                    g,
                    bcd,
                    aux,
                )
                jax.block_until_ready(res.grad)
            self._check_linear(res.relres, step)
            f, g = res.f, res.g
            grad = grad + res.grad
            zs[step] = (res.z, res.phi)
        return grad, zs

"""Batched element assembly: residuals, condensed Jacobians, scatter.

The TPU re-design of the reference's assembly drivers
(reference: source/calibr8/src/evaluations.cpp — eval_forward_jacobian
:12-154, eval_global_residual :156-260): the element loop over
(element set, element, integration point) with Sacado FADT seeding
becomes ONE vmapped pure element kernel over all elements, and the
ghost->owned Tpetra Export-ADD scatter (linear_alg.hpp:38-53) becomes a
jax.ops.segment_sum over precomputed element-DOF indices.

Static local condensation (the heart of eval_forward_jacobian):
  dxi_dx = -(dC/dxi)^{-1} dC/dx            (evaluations.cpp:112)
  J_e    = dR/dx + dR/dxi dxi_dx           (total element Jacobian)
computed with jax.jacfwd on the pure element functions and batched
jnp.linalg.solve over tiny (nxi x nxi) systems.

The element Jacobians are kept unassembled (n_elem, nde, nde) for
element-by-element (EBE) matvecs — batched einsum (MXU-friendly) +
segment_sum — rather than forming a CRS matrix; a dense scatter is
provided for small problems and tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from calibr8_tpu.mechanics.global_residual import MechanicsSpec, elem_kinematics, make_elem_residual
from calibr8_tpu.models.newton import make_local_solver
from calibr8_tpu.utils.smallsolve import gauss_solve, gauss_solve_T


def _elem_chunk_size():
    import os

    return int(os.environ.get("CALIBR8_ELEM_CHUNK", 1 << 18))


def chunked_trailing(kernel, chunk=None):
    """Evaluate a trailing-layout element kernel in element chunks.

    The fused tangent kernels materialize (n_out, n_seeds) per-element
    intermediates; at 1.5M elements the adjoint-blocks linearize alone
    holds a 7 GB (E, 52, 23) temp — the round-3 scale-mesh HBM OOM.
    jax.lax.map over element chunks bounds the live temp to one chunk
    while leaving the per-chunk math identical (same trailing layout,
    same vmap).  All inputs and outputs carry the element axis
    minor-most; the pad replicates the last element so padded lanes
    stay numerically valid, then is sliced off.  Engages only past
    `chunk` elements (env CALIBR8_ELEM_CHUNK, default 262144), so
    small problems compile the exact same program as before.
    """
    if chunk is None:
        chunk = _elem_chunk_size()

    def wrapped(*args):
        E = args[4].shape[0]  # path
        if E <= chunk:
            return kernel(*args)
        # fori_loop + dynamic slices, NOT lax.map: map stacks every
        # output (nc, ..., chunk) and the re-layout copy then holds
        # BOTH the stacked and the final arrays — for the adjoint
        # blocks that double-buffer alone was ~11 GB at 1.5M elements
        # (the scale adjoint's 17.4 GB of compiled temps vs 16 GB HBM,
        # invariant under chunk size).  Writing each chunk's outputs
        # straight into their final-layout slot materializes every
        # output exactly once; inputs slice per chunk with no stacked
        # input copies either.
        nchunks = -(-E // chunk)

        def slice_args(start, size):
            return tuple(
                jax.lax.dynamic_slice_in_dim(a, start, size, a.ndim - 1)
                for a in args
            )

        shapes = jax.eval_shape(lambda *a: kernel(*a), *slice_args(0, chunk))
        outs = jax.tree.map(
            lambda s: jnp.zeros(s.shape[:-1] + (E,), s.dtype), shapes
        )

        # a remainder chunk must NOT call kernel() at a second shape —
        # that instantiates a second copy of the fused element kernel
        # in generated code, against the ~2 GB executable-load ceiling.
        # Instead the FINAL chunk overlaps backwards (start = E - chunk)
        # so every iteration runs the one full-chunk kernel; the
        # overlapped elements are recomputed with identical values and
        # rewritten in place.  No padded input copies either.
        def body(c, outs):
            start = jnp.minimum(c * chunk, E - chunk)
            o = kernel(*slice_args(start, chunk))
            return jax.tree.map(
                lambda acc, oc: jax.lax.dynamic_update_slice_in_dim(
                    acc, oc, start, acc.ndim - 1
                ),
                outs,
                o,
            )

        return jax.lax.fori_loop(0, nchunks, body, outs)

    return wrapped


def mm_T(A, B):
    """(m, k, E) @ (k, n, E) -> (m, n, E) as unrolled lane FMAs.

    NOT jnp.einsum: XLA lowers the batched contraction as dot_general
    with the element batch dim leading, whose (16, 16) minor dims
    tile-pad 8x in HBM — a 12 GB temp at 1.5M elements (the scale-mesh
    adjoint OOM)."""
    m, kk = A.shape[0], A.shape[1]
    n = B.shape[1]
    rows = []
    for i in range(m):
        cols = []
        for j in range(n):
            acc = A[i, 0] * B[0, j]
            for k2 in range(1, kk):
                acc = acc + A[i, k2] * B[k2, j]
            cols.append(acc)
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)


class Assembler:
    """Bundles the vmapped kernels for one (model, mechanics spec) pair."""

    def __init__(self, disc, model, spec: MechanicsSpec, local_cfg=None):
        self.disc = disc
        self.model = model
        self.spec = spec
        local_cfg = local_cfg or {}
        self.local_cfg = local_cfg
        self.elem_res = make_elem_residual(model, spec)
        self._local_solve = make_local_solver(
            model,
            max_iters=local_cfg.get("max_iters", 100),
            abs_tol=local_cfg.get("abs_tol", 1e-12),
            rel_tol=local_cfg.get("rel_tol", 1e-12),
        )
        self.nxi = model.nxi()

    # -- gathers -------------------------------------------------------
    def gather(self, x):
        """(n_dofs,) -> (n_elem, nde) element dof values (row-based)."""
        return self.disc.gather_elem(x)

    def params_per_elem(self, params_all):
        """(n_sets, n_params) -> (n_elem, n_params)."""
        return params_all[self.disc.es_ids]

    def kinematics(self, x, x_prev):
        x_e = self.gather(x)
        xp_e = self.gather(x_prev)
        return jax.vmap(elem_kinematics, in_axes=(None, 0, 0, 0))(
            self.spec, x_e, xp_e, self.disc.grad_N
        )

    # -- local constitutive solve --------------------------------------
    def local_solve_from_elems(self, x_e, xp_e, xi_prev, pars, grad_N):
        """local_solve on explicit element arrays (x_e (n, nde), ...) —
        shared by the global-gather path and the distributed
        (halo-gathered) path (parallel/dist.py)."""
        from calibr8_tpu.models.base import Kinematics
        from calibr8_tpu.models.newton import LocalSolveResult

        kin = jax.vmap(elem_kinematics, in_axes=(None, 0, 0, 0))(
            self.spec, x_e, xp_e, grad_N
        )
        kin_T = Kinematics(
            grad_u=jnp.moveaxis(kin.grad_u, 0, -1),
            grad_u_prev=jnp.moveaxis(kin.grad_u_prev, 0, -1),
        )
        res = jax.vmap(
            self._local_solve,
            in_axes=(-1, Kinematics(-1, -1), -1),
            out_axes=LocalSolveResult(-1, -1, -1, -1),
        )(xi_prev.T, kin_T, pars.T)
        return LocalSolveResult(
            xi=res.xi.T, path=res.path, failed=res.failed, iters=res.iters
        )

    def local_solve(self, x, x_prev, xi_prev, params_all):
        """Solve C = 0 at every integration point.

        Returns LocalSolveResult with fields batched over elements.
        The vmap runs with the element axis minor-most (TPU lanes).
        """
        return self.local_solve_from_elems(
            self.gather(x),
            self.gather(x_prev),
            xi_prev,
            self.params_per_elem(params_all),
            self.disc.grad_N,
        )

    # -- residual ------------------------------------------------------
    def residual_elems(self, x, x_prev, xi, params_all):
        x_e = self.gather(x)
        xp_e = self.gather(x_prev)
        pars = self.params_per_elem(params_all)
        geom = (self.disc.grad_N, self.disc.detJ, self.disc.h)

        def one(x_e_, xp_e_, xi_, gN, dJ, h, par):
            return self.elem_res(x_e_, xp_e_, xi_, (gN, dJ, h), par)

        return jax.vmap(one)(
            x_e, xp_e, xi, self.disc.grad_N, self.disc.detJ, self.disc.h, pars
        )

    def residual(self, x, x_prev, xi, params_all):
        R_e = self.residual_elems(x, x_prev, xi, params_all)
        return self.disc.scatter_elem(R_e)

    # -- condensed element Jacobian ------------------------------------
    def make_rj_kernel(self):
        """Build the trailing-layout fused residual+Jacobian kernel.

        Returns f(x_eT (nde, n), xp_eT, xiT (nxi, n), xipT, path (n,),
        gN_T (npe, d, n), detJ (n,), h (n,), parsT) -> (R_eT (nde, n),
        J_T (nde, nde, n)) — the statically condensed total element
        Jacobian dR/dx + dR/dxi dxi/dx with the local branch forced to
        `path`.  Shared by the single-chip path (residual_and_jacobian)
        and the domain-decomposed path (parallel/dist.py).
        """
        model, spec = self.model, self.spec
        elem_res = self.elem_res
        nxi = self.nxi
        nde = self.spec.ndofs_elem

        # TPU layout note: the many-seed tangent passes of the fused
        # Jacobian are ~20x faster when the ELEMENT axis is the
        # minor-most (lane) axis, so the per-element closure is vmapped
        # with in_axes/out_axes = -1 over transposed element arrays.
        def one(x_e_, xp_e_, xi_, xip_, path_, gN, dJ, h, par):
            geom = (gN, dJ, h)

            if not model.needs_local_newton():

                def R(xe__):
                    return elem_res(xe__, xp_e_, xi_, geom, par)

                R0, Rlin = jax.linearize(R, x_e_)
                J = jax.vmap(Rlin, in_axes=1, out_axes=1)(
                    jnp.eye(nde, dtype=x_e_.dtype)
                )
                return R0, J

            # ONE fused linearization over v = [xi, x_e] of G = [C, R]
            # yields all four blocks (dC/dxi, dC/dx, dR/dxi, dR/dx) with
            # a single primal evaluation and nxi+nde tangent passes —
            # the moral minimum for the static condensation
            # (evaluations.cpp:86-132 re-evaluates with 2 seedings).
            def G(v):
                xi__ = v[:nxi]
                xe__ = v[nxi:]
                kin = elem_kinematics(spec, xe__, xp_e_, gN)
                C = model.residual(xi__, xip_, kin, par, path_)
                R = elem_res(xe__, xp_e_, xi__, geom, par)
                return jnp.concatenate([C, R])

            v0 = jnp.concatenate([xi_, x_e_])
            G0, JG = jax.linearize(G, v0)
            JG = jax.vmap(JG, in_axes=1, out_axes=1)(
                jnp.eye(nxi + nde, dtype=v0.dtype)
            )
            return G0, JG

        vone = jax.vmap(
            one,
            in_axes=(-1, -1, -1, -1, 0, -1, 0, 0, -1),
            out_axes=(-1, -1),
        )

        def kernel(x_eT, xp_eT, xiT, xipT, path, gN_T, detJ, h, parsT):
            G0_T, JG_T = vone(
                x_eT, xp_eT, xiT, xipT, path, gN_T, detJ, h, parsT
            )
            if not model.needs_local_newton():
                return G0_T, JG_T
            # static condensation entirely in trailing layout (the full
            # (nxi+nde)^2-per-element JG never gets relayouted):
            # J = dR/dx - dR/dxi (dC/dxi)^{-1} dC/dx
            dC_dxi_T = JG_T[:nxi, :nxi]
            dC_dx_T = JG_T[:nxi, nxi:]
            dR_dxi_T = JG_T[nxi:, :nxi]
            dR_dx_T = JG_T[nxi:, nxi:]
            R_eT = G0_T[nxi:, :]
            dxi_dx_T = -gauss_solve_T(dC_dxi_T, dC_dx_T)
            J_T = dR_dx_T + mm_T(dR_dxi_T, dxi_dx_T)
            return R_eT, J_T

        return chunked_trailing(kernel)

    def make_adjoint_blocks_kernel(self, parts="all"):
        """Trailing-layout fused kernel for the adjoint element blocks.

        ONE linearization over the seed vector of G = [C; R] yields the
        blocks the backward sweep needs with a single primal evaluation
        — replacing the reference's five separate FADT seedings
        (eval_adjoint_jacobian evaluations.cpp:349-520,
        solve_adjoint_local :528-655, eval_qoi_gradient :758-930) and
        the previous 8-jacfwd form, which ran element-axis-first (~20x
        slower tangent passes).

        `parts` selects the seed groups (the 1M-DOF scale adjoint blew
        HBM holding ALL blocks alive across the Krylov solve — splitting
        lets Adjoint._step_impl compute only [xi, x_e] seeds before the
        solve and recompute the rest after it, cutting solve-time
        liveness from 8 trailing E-arrays to none at +13% tangent
        seeds):
          * "all":   seeds [xi, x_e, xp_e, xi_prev, p] -> every block
          * "solve": seeds [xi, x_e] -> dxi_dx_T, J_total_T
          * "post":  seeds [xi, xp_e, xi_prev, p] -> dC_dxi_T,
                     dR_dxi_T, dC_dxprev_T, dC_dxiprev_T, dC_dp_T,
                     dR_dp_T

        Returns f(x_eT (nde,n), xp_eT, xiT (nxi,n), xipT, path (n,),
        gN_T (npe,d,n), detJ (n,), h (n,), parsT (np,n)) -> dict of
        trailing-layout blocks.
        """
        model, spec = self.model, self.spec
        elem_res = self.elem_res
        nxi = self.nxi
        nde = self.spec.ndofs_elem

        def one(x_e_, xp_e_, xi_, xip_, path_, gN, dJ, h, par):
            geom = (gN, dJ, h)
            n_p = par.shape[0]

            if parts == "solve":

                def G(v):
                    xi__ = v[:nxi]
                    xe__ = v[nxi:]
                    kin = elem_kinematics(spec, xe__, xp_e_, gN)
                    C = model.residual(xi__, xip_, kin, par, path_)
                    R = elem_res(xe__, xp_e_, xi__, geom, par)
                    return jnp.concatenate([C, R])

                v0 = jnp.concatenate([xi_, x_e_])
            elif parts == "post":

                def G(v):
                    xi__ = v[:nxi]
                    xpe__ = v[nxi : nxi + nde]
                    xip__ = v[nxi + nde : 2 * nxi + nde]
                    p__ = v[2 * nxi + nde :]
                    kin = elem_kinematics(spec, x_e_, xpe__, gN)
                    C = model.residual(xi__, xip__, kin, p__, path_)
                    R = elem_res(x_e_, xpe__, xi__, geom, p__)
                    return jnp.concatenate([C, R])

                v0 = jnp.concatenate([xi_, xp_e_, xip_, par])
            else:

                def G(v):
                    xi__ = v[:nxi]
                    xe__ = v[nxi : nxi + nde]
                    xpe__ = v[nxi + nde : nxi + 2 * nde]
                    xip__ = v[nxi + 2 * nde : 2 * nxi + 2 * nde]
                    p__ = v[2 * nxi + 2 * nde :]
                    kin = elem_kinematics(spec, xe__, xpe__, gN)
                    C = model.residual(xi__, xip__, kin, p__, path_)
                    R = elem_res(xe__, xpe__, xi__, geom, p__)
                    return jnp.concatenate([C, R])

                v0 = jnp.concatenate([xi_, x_e_, xp_e_, xip_, par])

            _, JG = jax.linearize(G, v0)
            return jax.vmap(JG, in_axes=1, out_axes=1)(
                jnp.eye(v0.shape[0], dtype=v0.dtype)
            )

        vone = jax.vmap(
            one,
            in_axes=(-1, -1, -1, -1, 0, -1, 0, 0, -1),
            out_axes=-1,
        )

        def kernel(x_eT, xp_eT, xiT, xipT, path, gN_T, detJ, h, parsT):
            JG_T = vone(x_eT, xp_eT, xiT, xipT, path, gN_T, detJ, h, parsT)
            if parts == "solve":
                dC_dxi_T = JG_T[:nxi, :nxi]
                dC_dx_T = JG_T[:nxi, nxi:]
                dR_dxi_T = JG_T[nxi:, :nxi]
                dR_dx_T = JG_T[nxi:, nxi:]
                dxi_dx_T = -gauss_solve_T(dC_dxi_T, dC_dx_T)
                J_total_T = dR_dx_T + mm_T(dR_dxi_T, dxi_dx_T)
                return dict(dxi_dx_T=dxi_dx_T, J_total_T=J_total_T)
            if parts == "post":
                c0, c1, c2 = nxi, nxi + nde, 2 * nxi + nde
                return dict(
                    dC_dxi_T=JG_T[:nxi, :c0],
                    dC_dxprev_T=JG_T[:nxi, c0:c1],
                    dC_dxiprev_T=JG_T[:nxi, c1:c2],
                    dC_dp_T=JG_T[:nxi, c2:],
                    dR_dxi_T=JG_T[nxi:, :c0],
                    dR_dp_T=JG_T[nxi:, c2:],
                )
            c0, c1, c2, c3 = nxi, nxi + nde, nxi + 2 * nde, 2 * nxi + 2 * nde
            dC_dxi_T = JG_T[:nxi, :c0]
            dC_dx_T = JG_T[:nxi, c0:c1]
            dC_dxprev_T = JG_T[:nxi, c1:c2]
            dC_dxiprev_T = JG_T[:nxi, c2:c3]
            dC_dp_T = JG_T[:nxi, c3:]
            dR_dxi_T = JG_T[nxi:, :c0]
            dR_dx_T = JG_T[nxi:, c0:c1]
            dR_dp_T = JG_T[nxi:, c3:]
            # static condensation in trailing layout
            dxi_dx_T = -gauss_solve_T(dC_dxi_T, dC_dx_T)
            J_total_T = dR_dx_T + mm_T(dR_dxi_T, dxi_dx_T)
            return dict(
                dC_dxi_T=dC_dxi_T,
                dC_dxprev_T=dC_dxprev_T,
                dC_dxiprev_T=dC_dxiprev_T,
                dC_dp_T=dC_dp_T,
                dR_dxi_T=dR_dxi_T,
                dR_dp_T=dR_dp_T,
                dxi_dx_T=dxi_dx_T,
                J_total_T=J_total_T,
            )

        return chunked_trailing(kernel)

    def residual_and_jacobian(self, x, x_prev, xi, xi_prev, path, params_all):
        """Returns (R (n_dofs,), J_e (n_elem, nde, nde), diag (n_dofs,)).

        J_e is the statically condensed total element Jacobian
        dR/dx + dR/dxi * dxi/dx with the local branch forced to `path`.
        """
        x_e = self.gather(x)
        xp_e = self.gather(x_prev)
        pars = self.params_per_elem(params_all)

        if getattr(self, "_rj_kernel", None) is None:
            self._rj_kernel = self.make_rj_kernel()
        R_eT, J_T = self._rj_kernel(
            x_e.T,
            xp_e.T,
            xi.T,
            xi_prev.T,
            path,
            jnp.moveaxis(self.disc.grad_N, 0, -1),
            self.disc.detJ,
            self.disc.h,
            pars.T,
        )
        R_e = R_eT.T
        J_e = jnp.moveaxis(J_T, -1, 0)

        R = self.disc.scatter_elem(R_e)
        diag = self.disc.scatter_elem(jnp.diagonal(J_e, axis1=1, axis2=2))
        return R, J_e, diag


# ----------------------------------------------------------------------
# scatter / matvec primitives
# ----------------------------------------------------------------------


def jac_is_trailing(J_e, disc):
    """True if J_e is in trailing layout (nde, nde, E_pad); False for
    elem-first (n_elem, nde, nde).  Squareness of the two leading axes
    alone misclassifies an elem-first array whenever n_elem == nde
    (e.g. a 12-element 3D mixed mesh), so disambiguate against the
    discretization.  On the doubly-square corner (n_elem == nde ==
    E_pad) elem-first wins: trailing arrays are lane-padded (E_pad a
    multiple of 128) everywhere they are produced."""
    nde = disc.edofs.shape[1]
    s = J_e.shape
    if len(s) != 3:
        raise ValueError(f"element Jacobian must be rank-3, got {s}")
    if s[0] == disc.n_elem and s[1] == nde and s[2] == nde:
        return False
    if s[0] == nde and s[1] == nde and s[2] >= disc.n_elem:
        return True
    raise ValueError(
        f"unrecognized element-Jacobian layout {s} "
        f"(n_elem={disc.n_elem}, nde={nde})"
    )


def scatter_residual(R_e, edofs, n_dofs):
    """Element residuals -> global residual (the Export-ADD analog).

    Generic scalar-index fallback; the hot path is Disc.scatter_elem
    (row-based, ~4x faster on TPU)."""
    return jax.ops.segment_sum(
        R_e.reshape(-1), edofs.reshape(-1), num_segments=n_dofs
    )


def ebe_matvec_disc(J_e, disc, v):
    """Element-by-element J @ v with row-based gather/scatter.  Accepts
    the Jacobian in elem-first (n_elem, nde, nde) or trailing
    (nde, nde, E_pad) layout — the trailing form (the Pallas kernel's
    native output) runs the per-element matvec as rank-1 lane-aligned
    FMAs, ~6x faster than the batched-small-matmul lowering."""
    if jac_is_trailing(J_e, disc):
        return ebe_matvec_T(J_e, disc, v)
    from calibr8_tpu.fem import pallas_matvec

    if jax.default_backend() == "tpu" and pallas_matvec._pick_block(
        J_e.shape[0]
    ):
        # elem-first from the XLA assembly path: one (jit-hoisted)
        # relayout to trailing, then the Pallas kernel per iteration
        return ebe_matvec_T(jnp.moveaxis(J_e, 0, -1), disc, v)
    v_e = disc.gather_elem(v)
    Jv_e = jnp.einsum("eij,ej->ei", J_e, v_e)
    return disc.scatter_elem(Jv_e)


def ebe_matvec_T(J_T, disc, v):
    """Trailing-layout EBE matvec: y = sum_e P_e^T J_e P_e v with
    J_T (nde, nde, E_pad).  On TPU the per-element contraction runs in
    a Pallas kernel (fem/pallas_matvec.py) — the XLA lowering below
    re-streams the 200 MB of element Jacobians per FMA and measures
    ~40x off the HBM floor."""
    from calibr8_tpu.fem import pallas_matvec

    if pallas_matvec.supports(J_T):
        return pallas_matvec.ebe_matvec_T_tpu(J_T, disc, v)
    nde = J_T.shape[0]
    v_eT = disc.gather_elem(v).T  # (nde, n_elem)
    n_elem = v_eT.shape[1]
    rows = []
    for i in range(nde):
        acc = J_T[i, 0, :n_elem] * v_eT[0]
        for j in range(1, nde):
            acc = acc + J_T[i, j, :n_elem] * v_eT[j]
        rows.append(acc)
    y_e = jnp.stack(rows, axis=0).T  # (n_elem, nde)
    return disc.scatter_elem(y_e)


def ebe_matvec(J_e, edofs, v, n_dofs):
    """Element-by-element J @ v: gather, batched matvec, scatter-add
    (scalar-index fallback; prefer ebe_matvec_disc)."""
    v_e = v[edofs]
    Jv_e = jnp.einsum("eij,ej->ei", J_e, v_e)
    return jax.ops.segment_sum(
        Jv_e.reshape(-1), edofs.reshape(-1), num_segments=n_dofs
    )


def dense_matrix(J_e, edofs, n_dofs):
    """Scatter element Jacobians to a dense (n_dofs, n_dofs) matrix.

    For small test problems and direct solves only.
    """
    rows = jnp.repeat(edofs[:, :, None], edofs.shape[1], axis=2)
    cols = jnp.repeat(edofs[:, None, :], edofs.shape[1], axis=1)
    flat = rows.reshape(-1) * n_dofs + cols.reshape(-1)
    A = jax.ops.segment_sum(
        J_e.reshape(-1), flat, num_segments=n_dofs * n_dofs
    )
    return A.reshape(n_dofs, n_dofs)

"""Preconditioners for the EBE Krylov solves.

Native replacement for the reference's Teko block-2x2 Gauss-Seidel
preconditioner with MueLu AMG / Ifpack2 relaxation blocks
(reference: source/calibr8/src/linear_solve.cpp:36-123, deck
'Preconditioner Types: Teko: BGS2x2').

Structure (the same u/p block split):
  z_u = M_u^{-1} r_u
  z_p = M_p^{-1} (r_p - A_pu z_u)        (lower block Gauss-Seidel)
with M_u = node-block Jacobi (d x d blocks assembled from the element
Jacobians, batch-inverted) optionally wrapped in Chebyshev smoothing,
and M_p = point Jacobi on the pressure block.  All pieces are batched
tensor ops — no sparse matrices, no setup graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.utils.smallsolve import gauss_solve, gauss_solve_T


def node_block_diagonal(disc, J_e):
    """Assemble the (n_nodes, ndpn, ndpn) node-diagonal blocks from the
    element Jacobians (elem-first or trailing layout): contributions
    where row-node == col-node."""
    npe = disc.spec.npe
    ndpn = disc.ndpn
    n_elem = disc.n_elem
    from calibr8_tpu.fem.assembly import jac_is_trailing

    if jac_is_trailing(J_e, disc):  # trailing (nde, nde, E_pad)
        rows = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.stack(
                            [
                                J_e[n * ndpn + i, n * ndpn + j, :n_elem]
                                for j in range(ndpn)
                            ],
                            0,
                        )
                        for i in range(ndpn)
                    ],
                    0,
                )
                for n in range(npe)
            ],
            0,
        )  # (npe, ndpn, ndpn, n_elem)
        rows = rows.reshape(npe, ndpn * ndpn, n_elem)
        rows = jnp.moveaxis(rows, -1, 0).reshape(n_elem * npe, ndpn * ndpn)
        return disc.scatter_rows(rows).reshape(disc.n_nodes, ndpn, ndpn)
    Jb = J_e.reshape(n_elem, npe, ndpn, npe, ndpn)
    # per element, per node: the (ndpn, ndpn) self block (row node ==
    # col node); advanced indexing puts the diagonal axis first
    self_blocks = Jb[:, jnp.arange(npe), :, jnp.arange(npe), :]  # (npe, E, ndpn, ndpn)
    self_blocks = jnp.moveaxis(self_blocks, 0, 1)  # (E, npe, ndpn, ndpn)
    return disc.scatter_rows(
        self_blocks.reshape(n_elem * npe, ndpn * ndpn)
    ).reshape(disc.n_nodes, ndpn, ndpn)


class BlockJacobiGS:
    """Block u/p Gauss-Seidel with node-block-Jacobi inner solves.

    transpose=True applies the TRANSPOSE of the forward preconditioner
    (build it from the FORWARD element Jacobians): for the lower
    block-GS M = [[U, 0], [-s a U, s]] (U = Au^-1, a = A_pu, s = 1/app)
    the transpose is z_p = s r_p; z_u = U^T (r_u - a^T z_p).  Using the
    forward-ordered preconditioner on the transposed operator stalls
    GMRES (measured: the adjoint solve burned 10^4 iterations without
    reaching 1e-4)."""

    def __init__(self, disc, J_e, diag, bc_dofs, transpose=False):
        self.disc = disc
        self.transpose = transpose
        d = disc.spec.dim
        blocks = node_block_diagonal(disc, J_e)  # (n_nodes, ndpn, ndpn)
        # Dirichlet rows: replace the row of the block by the unit row
        # scaled with the assembled diagonal (consistent with the
        # operator's DBC row treatment)
        D = disc.nodemat(diag)  # (n_nodes, ndpn)
        bc_mask = jnp.zeros(disc.n_dofs, bool).at[bc_dofs].set(True)
        bc_nm = disc.nodemat(bc_mask.astype(J_e.dtype))  # 1.0 where constrained
        eye = jnp.eye(disc.ndpn, dtype=J_e.dtype)
        rowsel = bc_nm[:, :, None]  # (n_nodes, ndpn, 1)
        blocks = blocks * (1.0 - rowsel) + rowsel * eye[None, :, :] * D[:, :, None]
        # trailing layout (d, d, n_nodes): the leading-batch form lands
        # the tiny d x d matrices on the TPU tiles and runs ~20x slower
        AuT = jnp.moveaxis(blocks[:, :d, :d], 0, -1)
        # invert ONCE at setup (solve-per-apply costs ~1.8 ms/iteration
        # at 196k elements; the apply is then d^2 lane FMAs)
        eyeT = jnp.zeros((d, d, AuT.shape[-1]), AuT.dtype)
        for i in range(d):
            eyeT = eyeT.at[i, i].set(1.0)
        self.Au_invT = gauss_solve_T(AuT, eyeT)  # (d, d, N)
        self.ApuT = (
            jnp.moveaxis(blocks[:, d, :d], 0, -1) if disc.spec.mixed else None
        )  # (d, n_nodes)
        self.app = blocks[:, d, d] if disc.spec.mixed else None
        self.d = d

    def __call__(self, r):
        disc = self.disc
        d = self.d
        RT = disc.nodemat(r).T  # (ndpn, n_nodes)
        safe_app = (
            jnp.where(jnp.abs(self.app) > 1e-300, self.app, 1.0)
            if disc.spec.mixed
            else None
        )
        if self.transpose:
            if disc.spec.mixed:
                zp = RT[d] / safe_app
                ru = [RT[j] - self.ApuT[j] * zp for j in range(d)]
            else:
                ru = [RT[j] for j in range(d)]
            # U^T: transposed indexing of the precomputed inverse
            zuT = jnp.stack(
                [
                    sum(self.Au_invT[j, i] * ru[j] for j in range(d))
                    for i in range(d)
                ],
                axis=0,
            )
            Z = (
                jnp.concatenate([zuT, zp[None, :]], axis=0).T
                if disc.spec.mixed
                else zuT.T
            )
            return disc.nodemat_to_flat(Z)
        zuT = jnp.stack(
            [
                sum(self.Au_invT[i, j] * RT[j] for j in range(d))
                for i in range(d)
            ],
            axis=0,
        )  # (d, N)
        if disc.spec.mixed:
            rp = RT[d]
            for j in range(d):
                rp = rp - self.ApuT[j] * zuT[j]
            zp = rp / safe_app
            Z = jnp.concatenate([zuT, zp[None, :]], axis=0).T
        else:
            Z = zuT.T
        return disc.nodemat_to_flat(Z)

"""Distributed AMG preconditioner for the domain-decomposed solver.

The reference preconditions its (MPI-distributed) Teko blocks with
MueLu AMG (source/calibr8/src/linear_solve.cpp:36-123); round 2's dist
path had only one-level block Jacobi/GS, whose iteration counts grow
with refinement.  This module runs the aggregation AMG (solve/amg.py)
under the sharded Krylov solve:

  * the FINE level stays SHARDED: Chebyshev smoothing uses the
    assembled per-part matvec (the same `op` the Krylov loop applies)
    and the sharded node-block diagonal inverse;
  * the level-1 Galerkin blocks are assembled per part (one masked
    einsum + segment_sum into the GLOBAL aggregate ELL slots) and
    PSUMMED — the aggregate space (~n_nodes/9 rigid-mode dofs) is
    REPLICATED, as are all coarser levels (the MueLu "repartition to
    fewer ranks at coarse levels" analog, taken to its n_parts=1
    limit: coarse grids are small, so replicated V/W-cycle work is a
    ~1/9 fraction of the fine-level work);
  * levels >= 1 reuse AMGPrecondFactory._u_chain/_p_chain_from_A1
    verbatim — identical hierarchy, smoothers and coarse solves as the
    single-device path;
  * fine <-> level-1 transfers are plain jnp ops on the sharded
    (P, N_own, ndpn) residual (XLA inserts the cross-part collectives
    for the aggregate segment_sum).

The resulting M(r) has the same (P, N_own, ndpn) -> (P, N_own, ndpn)
signature as DistContext.make_precond, so it drops into the existing
sharded GMRES.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.solve.amg import (
    AMGPrecondFactory,
    _chebyshev,
    _power_lmax,
)
from calibr8_tpu.utils.smallsolve import gauss_solve


class DistAMG:
    """Host setup once per (mesh, partition); make() once per Jacobian."""

    def __init__(self, ctx, factory: AMGPrecondFactory | None = None):
        self.ctx = ctx
        disc = ctx.disc
        self.factory = factory or AMGPrecondFactory(disc)
        f = self.factory
        part = ctx.part
        d = disc.spec.dim
        m = f.m
        lv1 = f.levels[0]
        n1 = lv1.n
        K1 = lv1.K
        agg = np.asarray(lv1.agg_prev)  # (n_nodes,)
        B = np.asarray(lv1.P)  # (n_nodes, d, m)

        # owned-node maps (padding -> dummy aggregate n1, zero modes)
        own = np.asarray(part.own_nodes)  # (P, N_own), -1 pad
        valid = own >= 0
        agg_own = np.where(valid, agg[np.where(valid, own, 0)], n1)
        B_own = np.where(
            valid[:, :, None, None], B[np.where(valid, own, 0)], 0.0
        )
        self.agg_own = jnp.asarray(agg_own.astype(np.int32))
        self.B_own = jnp.asarray(B_own, disc.dtype)

        # local-node rigid modes per part (for the element Galerkin)
        loc = np.asarray(part.local_nodes)  # (P, N_loc), -1 pad
        lvalid = loc >= 0
        B_loc = np.where(
            lvalid[:, :, None, None], B[np.where(lvalid, loc, 0)], 0.0
        )
        # per-element node blocks: (P, E_loc, npe, d, m)
        conn = np.asarray(ctx.conn)  # (P, E_loc, npe) local node ids
        P_, E_loc, npe = conn.shape
        Bc = np.stack(
            [B_loc[p][conn[p]] for p in range(P_)], axis=0
        )  # (P, E_loc, npe, d, m)
        self.Bc = jnp.asarray(Bc, disc.dtype)

        # element-entry -> global level-1 ELL slot, reindexed per part
        emap = np.asarray(lv1.emap).reshape(disc.n_elem, npe, npe)
        elems = np.asarray(part.elems)  # (P, E_loc), -1 pad
        evalid = elems >= 0
        emap_part = np.where(
            evalid[:, :, None, None],
            emap[np.where(evalid, elems, 0)],
            n1 * K1,
        )
        self.emap_part = jnp.asarray(emap_part.astype(np.int32))
        self.n1, self.K1, self.m, self.d = n1, K1, m, d
        self.npe = npe

    # ------------------------------------------------------------------
    def make(self, J_T, diag, bc_mask, op_full, transpose=False):
        """Build M(r) for one assembled sharded state.

        J_T (P, nde, nde, E_loc) element Jacobians, diag/bc_mask
        (P, N_own, ndpn), op_full the assembled sharded matvec (with
        Dirichlet rows) the Krylov loop uses.  transpose=True expects
        J_T ALREADY row/col-swapped (the dist adjoint convention) —
        the hierarchy then belongs to the transposed operator — and
        mirrors the u/p sweep order (p first), the multigrid analog
        of the transposed block-GS the adjoint needs."""
        ctx = self.ctx
        f = self.factory
        disc = ctx.disc
        d, m, n1, K1 = self.d, self.m, self.n1, self.K1
        npe = self.npe
        ndpn = ctx.ndpn
        mixed = disc.spec.mixed
        dtype = J_T.dtype

        own_mask = ctx.own_mask  # (P, N_own) bool
        mask_all = jnp.where(bc_mask, 0.0, 1.0).astype(dtype) * (
            own_mask.astype(dtype)[..., None]
        )  # (P, N_own, ndpn)
        mask_u = mask_all[..., :d]

        # ---- element-node Dirichlet masks (halo-gathered) -------------
        mask_loc = ctx.halo_gather(mask_all)  # (P, N_loc, ndpn)
        m_e = jax.vmap(lambda ml, c: ml[c])(mask_loc, ctx.conn)
        # (P, E_loc, npe, ndpn)

        # ---- level-1 Galerkin (sharded segment_sum + psum) ------------
        uslots = jnp.asarray(f.uslots)
        J_uu = jnp.take(jnp.take(J_T, uslots, axis=1), uslots, axis=2)
        # (P, nde_u, nde_u, E_loc) -> masked elem-first node blocks
        m_eu = m_e[..., :d].reshape(*m_e.shape[:2], npe * d)  # (P,E,nde_u)
        m_euT = jnp.moveaxis(m_eu, 1, -1)  # (P, nde_u, E)
        JTm = J_uu * m_euT[:, :, None, :] * m_euT[:, None, :, :]
        Jblk = jnp.moveaxis(JTm, -1, 1).reshape(
            JTm.shape[0], JTm.shape[-1], npe, d, npe, d
        ).transpose(0, 1, 2, 4, 3, 5)  # (P, E, npe, npe, d, d)

        G = jnp.einsum(
            "peadm,peabdf,pebfn->peabmn", self.Bc, Jblk, self.Bc
        )
        P_ = G.shape[0]
        E_loc = G.shape[1]
        A1_parts = jax.vmap(
            lambda g, em: jax.ops.segment_sum(
                g.reshape(E_loc * npe * npe, m * m),
                em.reshape(-1),
                num_segments=n1 * K1 + 1,
            )
        )(G, self.emap_part)
        A1 = jnp.sum(A1_parts, axis=0)[:-1]  # (n1*K1, m*m)
        # _u_chain consumes the replicated level-1 blocks in TRAILING
        # layout (m, m, n1*K1) — see solve/amg.py layout rationale
        A1_T = A1.T.reshape(m, m, n1 * K1)

        cycle = f._u_chain(A1_T, dtype)

        # ---- fine level (sharded) -------------------------------------
        blocks = ctx.node_blocks(J_T)  # (P, N_own, ndpn, ndpn)
        eye = jnp.eye(ndpn, dtype=dtype)
        rowsel = bc_mask.astype(dtype)[..., None]
        blocks = blocks * (1.0 - rowsel) + rowsel * eye * diag[..., None]
        padsel = (~own_mask).astype(dtype)[..., None, None]
        blocks = blocks * (1.0 - padsel) + padsel * eye
        Bu_inv = gauss_solve(
            blocks[..., :d, :d],
            jnp.broadcast_to(
                jnp.eye(d, dtype=dtype), blocks[..., :d, :d].shape
            ),
            pivot=True,
        )

        def embed_u(v_u):  # (P, N_own, d) -> full ndpn
            if not mixed:
                return v_u
            return jnp.concatenate(
                [v_u, jnp.zeros(v_u.shape[:-1] + (1,), v_u.dtype)], axis=-1
            )

        def op_u(v_u):
            return op_full(embed_u(v_u))[..., :d]

        def fine_dinv(r_u):
            return jnp.einsum("pnij,pnj->pni", Bu_inv, r_u)

        if f.smoother == "chebyshev":
            n_fine = int(np.prod(mask_u.shape))

            def mv_flat(v):
                return op_u(v.reshape(mask_u.shape)).reshape(-1)

            def dinv_flat(v):
                return fine_dinv(v.reshape(mask_u.shape)).reshape(-1)

            lmax_f = _power_lmax(mv_flat, dinv_flat, n_fine, dtype)
            _smooth_flat = _chebyshev(
                mv_flat, dinv_flat, lmax_f, f.cheb_degree, f.cheb_ratio
            )

            def fine_smooth(r_u):
                return _smooth_flat(r_u.reshape(-1)).reshape(mask_u.shape)

        else:

            def fine_smooth(r_u):
                return f.omega * fine_dinv(r_u)

        agg_own = self.agg_own  # (P, N_own)
        B_own = self.B_own  # (P, N_own, d, m)

        def restrict1(r_u):  # sharded (P, N_own, d) -> replicated (n1*m,)
            R = jnp.einsum("pndm,pnd->pnm", B_own, r_u)
            out = jax.ops.segment_sum(
                R.reshape(-1, m), agg_own.reshape(-1), num_segments=n1 + 1
            )
            return out[:-1].reshape(-1)

        def prolong1(ec):  # replicated (n1*m,) -> sharded (P, N_own, d)
            Ep = jnp.concatenate(
                [ec.reshape(n1, m), jnp.zeros((1, m), ec.dtype)], axis=0
            )
            return jnp.einsum("pndm,pnm->pnd", B_own, Ep[agg_own])

        kappa = f.overcorr

        def vcycle(r_u):
            z = fine_smooth(r_u)
            r2 = (r_u - op_u(z)) * mask_u
            ec = cycle(0, restrict1(r2))
            z = z + kappa * prolong1(ec) * mask_u
            r3 = r_u - op_u(z)
            return z + fine_smooth(r3)

        if not mixed:
            return vcycle

        # ---- pressure chain (sharded fine, replicated coarse) ---------
        pslots = jnp.asarray(f.pslots)
        J_pp = jnp.take(jnp.take(J_T, pslots, axis=1), pslots, axis=2)
        m_ep = m_e[..., d]  # (P, E_loc, npe)
        m_epT = jnp.moveaxis(m_ep, 1, -1)  # (P, npe, E)
        JppTm = J_pp * m_epT[:, :, None, :] * m_epT[:, None, :, :]
        vals_p = jnp.moveaxis(JppTm, -1, 1).reshape(P_, E_loc * npe * npe)
        A1p_parts = jax.vmap(
            lambda g, em: jax.ops.segment_sum(
                g, em.reshape(-1), num_segments=n1 * K1 + 1
            )
        )(vals_p, self.emap_part)
        A1_p = jnp.sum(A1p_parts, axis=0)[:-1].reshape(n1, K1)
        p_cycle = f._p_chain_from_A1(A1_p, dtype)

        mask_p = mask_all[..., d]
        diag_p = diag[..., d]
        app = jnp.where(jnp.abs(diag_p) > 1e-300, diag_p, 1.0)

        def embed_p(v_p):
            return jnp.concatenate(
                [jnp.zeros(v_p.shape + (d,), v_p.dtype), v_p[..., None]],
                axis=-1,
            )

        def op_p(v_p):
            return op_full(embed_p(v_p))[..., d]

        def p_fine_dinv(r_p):
            return r_p / app

        if f.smoother == "chebyshev":
            n_p = int(np.prod(mask_p.shape))

            def pmv_flat(v):
                return op_p(v.reshape(mask_p.shape)).reshape(-1)

            def pdinv_flat(v):
                return p_fine_dinv(v.reshape(mask_p.shape)).reshape(-1)

            lmax_p = _power_lmax(pmv_flat, pdinv_flat, n_p, dtype)
            _psmooth_flat = _chebyshev(
                pmv_flat, pdinv_flat, lmax_p, f.cheb_degree, f.cheb_ratio
            )

            def p_fine_smooth(r_p):
                return _psmooth_flat(r_p.reshape(-1)).reshape(mask_p.shape)

        else:

            def p_fine_smooth(r_p):
                return f.omega * p_fine_dinv(r_p)

        def p_restrict1(r_p):
            out = jax.ops.segment_sum(
                r_p.reshape(-1), agg_own.reshape(-1), num_segments=n1 + 1
            )
            return out[:-1]

        def p_prolong1(ec):
            ep = jnp.concatenate([ec, jnp.zeros(1, ec.dtype)])
            return ep[agg_own]

        def p_vcycle(r_p):
            z = p_fine_smooth(r_p)
            r2 = (r_p - op_p(z)) * mask_p
            ec = p_cycle(0, p_restrict1(r2))
            z = z + kappa * p_prolong1(ec) * mask_p
            r3 = r_p - op_p(z)
            return z + p_fine_smooth(r3)

        if transpose:

            def M(r):  # (P, N_own, ndpn)
                z_p = p_vcycle(r[..., d])
                r_u = (r - op_full(embed_p(z_p)))[..., :d]
                z_u = vcycle(r_u)
                return jnp.concatenate([z_u, z_p[..., None]], axis=-1)

        else:

            def M(r):  # (P, N_own, ndpn)
                z_u = vcycle(r[..., :d])
                r_p = (r - op_full(embed_u(z_u)))[..., d]
                z_p = p_vcycle(r_p)
                return jnp.concatenate([z_u, z_p[..., None]], axis=-1)

        return M

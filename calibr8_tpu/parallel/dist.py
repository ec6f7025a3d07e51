"""Domain-decomposed solves: sharded DOF vectors + halo exchange.

This is the scalable multi-chip path — the true analog of the
reference's parallel story (one mesh part per MPI rank, ghost-overlap
assembly, Tpetra Import/Export halo maps, Export-ADD reductions;
reference: source/calibr8/src/linear_alg.hpp:15-53, disc.cpp:293-321).

Layout:
  * DOF vectors are (n_parts, N_own, ndpn) node matrices, sharded over
    the 'parts' mesh axis — each device holds ONLY the nodes its part
    owns (plus static padding).  Memory per device is O(N / n_parts).
  * Element arrays (connectivity, geometry, local state, element
    Jacobians) are (n_parts, E_loc, ...), sharded the same way.
  * The halo exchange is one jax.lax.all_to_all over the precomputed
    pairwise slot maps (parallel/partition.py): owned -> ghost copies
    (the Tpetra Import) before element gathers, and the reverse
    ghost-contribution reduction onto owners (the Export-ADD) after
    element scatters.  On TPU hardware these collectives ride ICI.
  * Krylov vectors stay sharded end-to-end; dot products are plain
    jnp.vdot on the sharded global view (XLA inserts the psum).

The per-element kernels are the SAME pure functions as the single-chip
path (fem/assembly.py make_rj_kernel, models/newton.py local solver) —
only the gather/scatter boundary differs, exactly as the reference
shares its element loop between serial and MPI runs.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from calibr8_tpu.parallel.partition import Partition, build_partition
from calibr8_tpu.solve import linear as linear_mod
from calibr8_tpu.solve.newton import NewtonCfg, StepSolver
from calibr8_tpu.utils.smallsolve import gauss_solve, gauss_solve_T


class DistContext:
    """Sharded discretization + halo-exchange kernels for one Problem."""

    def __init__(self, prob, n_parts=None, devices=None, pad_multiple=8):
        self.prob = prob
        disc = prob.disc
        self.disc = disc
        if devices is None:
            devices = jax.devices()
        if n_parts is None:
            n_parts = len(devices)
        self.mesh = Mesh(np.asarray(devices[:n_parts]), ("parts",))
        part = build_partition(
            np.asarray(disc.conn),
            np.asarray(disc.coords),
            n_parts,
            pad_multiple=pad_multiple,
        )
        self.part = part
        self.dtype = disc.dtype
        self.ndpn = disc.ndpn
        self.npe = disc.spec.npe
        self.nde = disc.spec.ndofs_elem
        self.nxi = prob.assembler.nxi

        sh = NamedSharding(self.mesh, P("parts"))
        self._shard = sh
        rep = NamedSharding(self.mesh, P())
        self._rep = rep

        def put(x):
            return jax.device_put(jnp.asarray(x), sh)

        # element selection (padding -> element 0 with zeroed geometry)
        emask = part.elems >= 0
        esel = np.where(emask, part.elems, 0)
        self._emask = emask
        self._esel = esel
        m = emask.astype(np.float64)
        self.conn = put(part.conn_local.astype(np.int32))
        self.gN = put(np.asarray(disc.grad_N)[esel] * m[..., None, None])
        self.detJ = put(np.asarray(disc.detJ)[esel] * m)
        self.h = put(np.where(emask, np.asarray(disc.h)[esel], 1.0))
        self.es = put(np.where(emask, np.asarray(disc.es_ids)[esel], 0))
        self.send = put(part.send_slots)
        self.recv = put(part.recv_slots)
        # per-part local ELLPACK maps (scatter-free Krylov matvec)
        self.nbr_local = put(part.nbr_local)
        self.ell_idx_local = put(part.ell_idx_local)

        # owned-node selection (padding -> node 0, masked to zero)
        omask = part.own_nodes >= 0
        self._omask = omask
        self._osel = np.where(omask, part.own_nodes, 0)
        self.own_mask = put(omask)  # (P, N_own) bool

        self._build_kernels()

        # distributed AMG preconditioner when the deck asked for a
        # multigrid hierarchy (parallel/dist_mg.py; the adjoint gets
        # the mirrored-sweep transposed cycle)
        self._mg = None
        if getattr(prob, "mg_factory", None) is not None:
            from calibr8_tpu.parallel.dist_mg import DistAMG
            from calibr8_tpu.solve.amg import AMGPrecondFactory

            f = (
                prob.mg_factory
                if isinstance(prob.mg_factory, AMGPrecondFactory)
                else None
            )
            self._mg = DistAMG(self, f)

    # -- layout converters (host side) ----------------------------------
    def to_dist(self, x):
        """Flat (n_dofs,) -> sharded (P, N_own, ndpn)."""
        X = self.disc.nodemat(jnp.asarray(x, self.dtype))
        Xd = jnp.asarray(X)[self._osel] * self._omask[..., None]
        return jax.device_put(Xd, self._shard)

    def from_dist(self, Xd):
        """Sharded (P, N_own, ndpn) -> flat (n_dofs,) (gathers to host)."""
        Xd = np.asarray(Xd)
        out = np.zeros((self.part.n_nodes, self.ndpn))
        out[self.part.own_nodes[self._omask]] = Xd[self._omask]
        return self.disc.nodemat_to_flat(jnp.asarray(out, self.dtype))

    def from_dist_device(self, Xd):
        """Pure-jnp dist -> flat scatter (differentiable; used where a
        global view is needed, e.g. QoI evaluation in the adjoint)."""
        own = jnp.asarray(self._osel).reshape(-1)
        w = jnp.asarray(self._omask, Xd.dtype).reshape(-1, 1)
        X = jnp.zeros((self.part.n_nodes, self.ndpn), Xd.dtype)
        X = X.at[own].add(Xd.reshape(-1, self.ndpn) * w)
        return self.disc.nodemat_to_flat(X)

    def to_dist_elem(self, a, fill=0.0):
        """(n_elem, ...) -> sharded (P, E_loc, ...)."""
        a = np.asarray(a)
        out = a[self._esel].copy()
        out[~self._emask] = fill
        return jax.device_put(jnp.asarray(out), self._shard)

    def from_dist_elem(self, A):
        A = np.asarray(A)
        out = np.zeros((self.disc.n_elem,) + A.shape[2:], A.dtype)
        out[self.part.elems[self._emask]] = A[self._emask]
        return jnp.asarray(out)

    def from_dist_elem_device(self, A):
        """Pure-jnp dist element array -> global element order."""
        sel = jnp.asarray(self._esel).reshape(-1)
        w = jnp.asarray(self._emask, A.dtype).reshape(
            (-1,) + (1,) * (A.ndim - 2)
        )
        flat = A.reshape((-1,) + A.shape[2:]) * w
        out = jnp.zeros((self.disc.n_elem,) + A.shape[2:], A.dtype)
        return out.at[sel].add(flat)

    def bc_dist(self, bc_dofs, bc_vals):
        """Flat DBC dof/value arrays -> (mask (P,N_own,ndpn) bool, vals)."""
        n = self.disc.n_dofs
        m = jnp.zeros(n, self.dtype).at[bc_dofs].set(1.0)
        g = jnp.zeros(n, self.dtype).at[bc_dofs].set(bc_vals)
        return self.to_dist(m) > 0.5, self.to_dist(g)

    def zeros(self):
        return jax.device_put(
            jnp.zeros((self.part.n_parts, self.part.N_own, self.ndpn), self.dtype),
            self._shard,
        )

    def init_xi_dist(self):
        """Initial local state for every (padded) local element."""
        row = np.asarray(self.prob.assembler.model.init_xi(), np.float64)
        out = np.tile(row[None, None, :], (self.part.n_parts, self.part.E_loc, 1))
        return jax.device_put(jnp.asarray(out, self.dtype), self._shard)

    # -- shard_map kernels ----------------------------------------------
    def _build_kernels(self):
        part = self.part
        N_own, N_loc, H = part.N_own, part.N_loc, part.H
        nparts = part.n_parts
        E, npe, ndpn, nde = part.E_loc, self.npe, self.ndpn, self.nde
        assembler = self.prob.assembler
        rj_kernel = assembler.make_rj_kernel()
        mesh = self.mesh

        # per-shard fused Pallas kernel (same fast path as single-chip):
        # the halo gather supplies the element dofs, the Export-ADD the
        # scatter, and the kernel fuses local solve + condensed element
        # Jacobian in between.  CALIBR8_PALLAS_INTERPRET=1 exercises the
        # identical code path in interpret mode off-TPU (parity tests).
        import os

        from calibr8_tpu.fem import pallas_assembly

        pallas_elems = None
        interp = os.environ.get("CALIBR8_PALLAS_INTERPRET") == "1"
        on_tpu = (
            jax.default_backend() == "tpu" and self.dtype == jnp.float32
        )
        if (
            os.environ.get("CALIBR8_PALLAS", "1") != "0"
            and (on_tpu or interp)
            and pallas_assembly.supports_pallas(assembler)
        ):
            pallas_elems = pallas_assembly.make_pallas_assemble(
                assembler, interpret=interp, n_elem=E
            )

        def gather(x_own, send, recv):
            """Owned block -> local [owned | ghost] block (Tpetra Import)."""
            c = x_own.shape[-1]
            xp = jnp.concatenate(
                [x_own, jnp.zeros((1, c), x_own.dtype)], axis=0
            )
            buf = xp[send]  # (nparts, H, c): what I send to each part
            out = jax.lax.all_to_all(buf, "parts", 0, 0, tiled=True)
            x_loc = jnp.zeros((N_loc + 1, c), x_own.dtype)
            x_loc = x_loc.at[:N_own].set(x_own)
            # .add, not .set: every real ghost slot receives exactly one
            # value (padding slots collide on the dummy row with zeros),
            # and scatter-add is transposable — custom_linear_solve
            # (gmres) requires a transposable operator.
            x_loc = x_loc.at[recv.reshape(-1)].add(out.reshape(-1, c))
            return x_loc[:N_loc]

        def scatter_add(y_loc, send, recv):
            """Ghost contributions reduced onto owners (Export-ADD)."""
            c = y_loc.shape[-1]
            yp = jnp.concatenate(
                [y_loc, jnp.zeros((1, c), y_loc.dtype)], axis=0
            )
            buf = yp[recv]  # ghost contribs grouped by owning part
            out = jax.lax.all_to_all(buf, "parts", 0, 0, tiled=True)
            y_own = jnp.concatenate(
                [y_loc[:N_own], jnp.zeros((1, c), y_loc.dtype)], axis=0
            )
            y_own = y_own.at[send.reshape(-1)].add(out.reshape(-1, c))
            return y_own[:N_own]

        def local_scatter(rows_e, conn):
            """(E, nde) element values -> (N_loc, ndpn) local node sums."""
            rows = rows_e.reshape(E * npe, ndpn)
            return jax.ops.segment_sum(
                rows, conn.reshape(-1), num_segments=N_loc
            )

        def ebe_T(J_T, v_eT):
            """Trailing-layout element matvec as lane-aligned FMAs."""
            rows = []
            for i in range(nde):
                acc = J_T[i, 0] * v_eT[0]
                for j in range(1, nde):
                    acc = acc + J_T[i, j] * v_eT[j]
                rows.append(acc)
            return jnp.stack(rows, axis=0)

        # check_vma=False ONLY for the AD-bearing element kernels
        # (assemble_sm, blocks_sm): they linearize with replicated eye()
        # seeds against device-varying primals, which the varying
        # manual-axes checker rejects.  Every pure data-movement /
        # matvec kernel keeps the checker on — it is exactly the net
        # that catches silent replication bugs in halo exchange.
        sm = partial(jax.shard_map, mesh=mesh)
        sm_ad = partial(jax.shard_map, mesh=mesh, check_vma=False)
        pp = P("parts")

        @partial(
            sm_ad,
            in_specs=(pp, pp, pp, P(), pp, pp, pp, pp, pp, pp, pp),
            out_specs=(pp, pp, pp, pp, pp, P()),
        )
        def assemble_sm(
            x_own, xp_own, xi_prev, params, conn, gN, detJ, h, es, send, recv
        ):
            x_own, xp_own, xi_prev = x_own[0], xp_own[0], xi_prev[0]
            conn, gN, detJ, h, es = conn[0], gN[0], detJ[0], h[0], es[0]
            send, recv = send[0], recv[0]
            x_loc = gather(x_own, send, recv)
            xp_loc = gather(xp_own, send, recv)
            x_e = x_loc[conn].reshape(E, nde)
            xp_e = xp_loc[conn].reshape(E, nde)
            pars = params[es]
            if pallas_elems is not None:
                pe = pallas_elems.E_pad - E

                def padE(a, fill=0.0):
                    if not pe:
                        return a
                    return jnp.pad(
                        a,
                        [(0, 0)] * (a.ndim - 1) + [(0, pe)],
                        constant_values=fill,
                    )

                # pars pads with EDGE values: zero material params hit
                # 0/0 (e.g. tau = h^2/2mu) even at zero weight
                pars_Tp = (
                    jnp.pad(pars.T, [(0, 0), (0, pe)], mode="edge")
                    if pe
                    else pars.T
                )
                R_Tp, J_Tp, xi_Tp, path2, fail2 = pallas_elems(
                    padE(x_e.T),
                    padE(xp_e.T),
                    padE(xi_prev.T),
                    padE(jnp.moveaxis(gN, 0, -1)),
                    padE(detJ[None, :]),
                    padE(h[None, :], 1.0),
                    pars_Tp,
                )
                R_eT, J_T = R_Tp[:, :E], J_Tp[:, :, :E]
                xi, path = xi_Tp[:, :E].T, path2[0, :E]
                failed = fail2[0, :E]
            else:
                loc = assembler.local_solve_from_elems(
                    x_e, xp_e, xi_prev, pars, gN
                )
                R_eT, J_T = rj_kernel(
                    x_e.T,
                    xp_e.T,
                    loc.xi.T,
                    xi_prev.T,
                    loc.path,
                    jnp.moveaxis(gN, 0, -1),
                    detJ,
                    h,
                    pars.T,
                )
                xi, path, failed = loc.xi, loc.path, loc.failed
            R_own = scatter_add(local_scatter(R_eT.T, conn), send, recv)
            dg = jnp.stack([J_T[i, i] for i in range(nde)], axis=0)  # (nde, E)
            diag_own = scatter_add(local_scatter(dg.T, conn), send, recv)
            nfail = jax.lax.psum(jnp.sum(failed), "parts")
            return (
                R_own[None],
                J_T[None],
                diag_own[None],
                xi[None],
                path[None],
                nfail,
            )

        @partial(sm, in_specs=(pp, pp, pp, pp, pp), out_specs=pp)
        def matvec_sm(J_T, v_own, conn, send, recv):
            J_T, v_own = J_T[0], v_own[0]
            conn, send, recv = conn[0], send[0], recv[0]
            v_loc = gather(v_own, send, recv)
            v_eT = v_loc[conn].reshape(E, nde).T
            y_eT = ebe_T(J_T, v_eT)
            y_own = scatter_add(local_scatter(y_eT.T, conn), send, recv)
            return y_own[None]

        @partial(sm, in_specs=(pp, pp, pp, pp), out_specs=pp)
        def node_blocks_sm(J_T, conn, send, recv):
            """Node-diagonal (ndpn x ndpn) blocks of the assembled
            operator (for the block Jacobi/GS preconditioner)."""
            J_T, conn = J_T[0], conn[0]
            send, recv = send[0], recv[0]
            rows = jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.stack(
                                [
                                    J_T[n * ndpn + i, n * ndpn + j]
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
            )  # (npe, ndpn, ndpn, E)
            rows = jnp.moveaxis(rows.reshape(npe, ndpn * ndpn, E), -1, 0)
            rows = rows.reshape(E * npe, ndpn * ndpn)
            y_loc = jax.ops.segment_sum(
                rows, conn.reshape(-1), num_segments=N_loc
            )
            blocks = scatter_add(y_loc, send, recv)
            return blocks.reshape(1, N_own, ndpn, ndpn)

        K_ell = part.K_ell

        @partial(sm, in_specs=(pp, pp), out_specs=pp)
        def ell_assemble_sm(J_T, ell_idx):
            """Per-part node-block ELL assembly over the LOCAL node
            space (rows = local slots; one segment_sum per part)."""
            J_T, ell_idx = J_T[0], ell_idx[0]
            rows = []
            for a in range(npe):
                for b in range(npe):
                    blk = [
                        J_T[a * ndpn + i, b * ndpn + j]
                        for i in range(ndpn)
                        for j in range(ndpn)
                    ]
                    rows.append(jnp.stack(blk, 0))  # (ndpn^2, E)
            V = jnp.stack(rows, 0)  # (npe^2, ndpn^2, E)
            vals = jnp.moveaxis(V, -1, 0).reshape(E * npe * npe, -1)
            ids = ell_idx.reshape(-1)  # (E*npe^2,), (e, a, b) order
            A = jax.ops.segment_sum(
                vals, ids, num_segments=N_loc * K_ell + 1
            )
            return A[None]

        @partial(sm, in_specs=(pp, pp, pp, pp, pp), out_specs=pp)
        def ell_matvec_sm(A, v_own, nbr, send, recv):
            """Scatter-free local ELL apply: one halo gather in, one
            Export-ADD out; the per-row contraction replaces the
            per-element matvec + local scatter."""
            A, nbr = A[0], nbr[0]
            send, recv = send[0], recv[0]
            x_loc = gather(v_own[0], send, recv)  # (N_loc, ndpn)
            xp = jnp.concatenate(
                [x_loc, jnp.zeros((1, ndpn), x_loc.dtype)], axis=0
            )
            G = xp[nbr]  # (N_loc, K, ndpn)
            Ab = A[: N_loc * K_ell].reshape(N_loc, K_ell, ndpn, ndpn)
            y_loc = jnp.einsum("nsij,nsj->ni", Ab, G)
            y_own = scatter_add(y_loc, send, recv)
            return y_own[None]

        # Pallas per-part ELL apply (TPU): the einsum above lowers to
        # batched small matmuls; the solve/ellpack.py block kernel runs
        # the same contraction as lane-aligned rank-1 FMAs with the
        # LOCAL NODE axis on the 128 lanes (measured ~3x faster per
        # Krylov iteration single-chip).  The assembled blocks arrive
        # pre-transposed (K, ndpn, ndpn, N_pad) once per Jacobian.
        self.N_pad_ell = -(-N_loc // 128) * 128

        # check_vma=False: pallas_call's out ShapeDtypeStruct carries
        # no vma annotation, which the vma checker rejects inside
        # shard_map (the apply itself is per-part with explicit halo
        # exchange, so there is nothing for the checker to verify)
        @partial(sm_ad, in_specs=(pp, pp, pp, pp, pp), out_specs=pp)
        def ell_matvec_T_sm(A_T, v_own, nbr, send, recv):
            from jax import custom_derivatives as _cd

            from calibr8_tpu.solve import ellpack as _ellpack

            A_T, nbr = A_T[0], nbr[0]  # (K, ndpn, ndpn, N_pad), (N_loc, K)
            send, recv = send[0], recv[0]
            x_loc = gather(v_own[0], send, recv)
            xp = jnp.concatenate(
                [x_loc, jnp.zeros((1, ndpn), x_loc.dtype)], axis=0
            )
            G = xp[nbr]  # (N_loc, K, ndpn)
            N_pad = self.N_pad_ell
            G_T = jnp.moveaxis(G, 0, -1)  # (K, ndpn, N_loc)
            G_T = jnp.pad(G_T, ((0, 0), (0, 0), (0, N_pad - N_loc)))
            blk = _ellpack._pick_block(N_pad) or 128
            fwd = _ellpack._make_kernel(K_ell, ndpn, N_pad, G_T.dtype, blk)
            bwd = _ellpack._make_kernel(
                K_ell, ndpn, N_pad, G_T.dtype, blk, transpose=True
            )
            Y_T = _cd.linear_call(
                lambda a, g: fwd(a, g), lambda a, ct: bwd(a, ct), A_T, G_T
            )  # (ndpn, N_pad)
            y_loc = Y_T[:, :N_loc].T
            y_own = scatter_add(y_loc, send, recv)
            return y_own[None]

        adjoint_blocks = assembler.make_adjoint_blocks_kernel()

        @partial(
            sm_ad,
            in_specs=(pp, pp, pp, pp, pp, P(), pp, pp, pp, pp, pp, pp),
            out_specs=pp,
        )
        def blocks_sm(
            x_own, xp_own, xi, xi_prev, path, params,
            conn, gN, detJ, h, es, send_recv,
        ):
            send, recv = send_recv[0, 0], send_recv[0, 1]
            x_own, xp_own = x_own[0], xp_own[0]
            xi, xi_prev, path = xi[0], xi_prev[0], path[0]
            conn, gN, detJ, h, es = conn[0], gN[0], detJ[0], h[0], es[0]
            x_loc = gather(x_own, send, recv)
            xp_loc = gather(xp_own, send, recv)
            x_e = x_loc[conn].reshape(E, nde)
            xp_e = xp_loc[conn].reshape(E, nde)
            pars = params[es]
            B = adjoint_blocks(
                x_e.T,
                xp_e.T,
                xi.T,
                xi_prev.T,
                path,
                jnp.moveaxis(gN, 0, -1),
                detJ,
                h,
                pars.T,
            )
            return {k: v[None] for k, v in B.items()}

        @partial(sm, in_specs=(pp, pp), out_specs=pp)
        def halo_gather_sm(v_own, send_recv):
            send, recv = send_recv[0, 0], send_recv[0, 1]
            return gather(v_own[0], send, recv)[None]

        self._halo_gather_sm = halo_gather_sm

        @partial(sm, in_specs=(pp, pp, pp), out_specs=pp)
        def gather_elem_sm(v_own, conn, send_recv):
            send, recv = send_recv[0, 0], send_recv[0, 1]
            v_loc = gather(v_own[0], send, recv)
            return v_loc[conn[0]].reshape(1, E, nde)

        @partial(sm, in_specs=(pp, pp, pp), out_specs=pp)
        def scatter_elem_sm(rows_e, conn, send_recv):
            send, recv = send_recv[0, 0], send_recv[0, 1]
            y = scatter_add(local_scatter(rows_e[0], conn[0]), send, recv)
            return y[None]

        self._assemble_sm = assemble_sm
        self._matvec_sm = matvec_sm
        self._ell_assemble_sm = ell_assemble_sm
        self._ell_matvec_sm = ell_matvec_sm
        self._ell_matvec_T_sm = ell_matvec_T_sm
        # per-part halo helpers, reusable by other shard_map kernels on
        # this mesh (parallel/dist_mg.py builds its Galerkin sums here)
        self._gather_local = gather
        self._scatter_add_local = scatter_add
        self._sm = sm
        self._pp = pp
        self._node_blocks_sm = node_blocks_sm
        self._blocks_sm = blocks_sm
        self._gather_elem_sm = gather_elem_sm
        self._scatter_elem_sm = scatter_elem_sm
        self._send_recv = jnp.stack([self.send, self.recv], axis=1)

    # -- public device ops ------------------------------------------------
    def assemble(self, Xd, Xd_prev, xi_prev, params):
        """Returns (R, J_T (P, nde, nde, E), diag, xi, path, nfail)."""
        return self._assemble_sm(
            Xd,
            Xd_prev,
            xi_prev,
            params,
            self.conn,
            self.gN,
            self.detJ,
            self.h,
            self.es,
            self.send,
            self.recv,
        )

    def matvec(self, J_T, Vd):
        return self._matvec_sm(J_T, Vd, self.conn, self.send, self.recv)

    def ell_assemble(self, J_T):
        """Per-part local node-block ELL of the (possibly pre-swapped)
        element Jacobians, built once per Krylov solve."""
        return self._ell_assemble_sm(J_T, self.ell_idx_local)

    def ell_matvec(self, A_ell, Vd):
        return self._ell_matvec_sm(
            A_ell, Vd, self.nbr_local, self.send, self.recv
        )

    def ell_trailing(self, A_ell):
        """(P, N_loc*K+1, ndpn^2) row-layout ELL blocks -> padded
        trailing layout (P, K, ndpn, ndpn, N_pad) for the Pallas apply;
        one transpose per Jacobian, amortized over ~10^2 matvecs.
        Per-part op on the sharded batch axis — no collectives."""
        P_, N_loc, K = A_ell.shape[0], self.part.N_loc, self.part.K_ell
        ndpn = self.ndpn
        Ab = A_ell[:, : N_loc * K].reshape(P_, N_loc, K, ndpn, ndpn)
        A_T = jnp.moveaxis(Ab, 1, -1)  # (P, K, ndpn, ndpn, N_loc)
        return jnp.pad(
            A_T,
            ((0, 0), (0, 0), (0, 0), (0, 0), (0, self.N_pad_ell - N_loc)),
        )

    def ell_matvec_T(self, A_T, Vd):
        return self._ell_matvec_T_sm(
            A_T, Vd, self.nbr_local, self.send, self.recv
        )

    def node_blocks(self, J_T):
        return self._node_blocks_sm(J_T, self.conn, self.send, self.recv)

    def adjoint_blocks(self, Xd, XPd, xi, xi_prev, path, params):
        """All adjoint element blocks, sharded, trailing layout within
        each part: e.g. dC_dxi_T (P, nxi, nxi, E_loc)."""
        return self._blocks_sm(
            Xd, XPd, xi, xi_prev, path, params,
            self.conn, self.gN, self.detJ, self.h, self.es, self._send_recv,
        )

    def halo_gather(self, Vd):
        """Sharded owned-node values (P, N_own, c) -> local-with-ghost
        values (P, N_loc, c) via the all_to_all Import."""
        return self._halo_gather_sm(Vd, self._send_recv)

    def gather_elem(self, Vd):
        """Sharded DOFs -> sharded element dof values (P, E, nde)."""
        return self._gather_elem_sm(Vd, self.conn, self._send_recv)

    def scatter_elem(self, rows):
        """(P, E, nde) element values -> assembled sharded DOFs."""
        return self._scatter_elem_sm(rows, self.conn, self._send_recv)

    # -- linear solve ------------------------------------------------------
    def make_precond(self, J_T, diag, bc_mask, transpose=False):
        blocks = self.node_blocks(J_T)  # (P, N_own, ndpn, ndpn)
        if transpose:
            # J_T arrives pre-swapped for transpose solves; the
            # preconditioner is the TRANSPOSE of the forward block GS,
            # built from the forward blocks (solve/precond.py)
            blocks = blocks.swapaxes(-1, -2)
        d = self.disc.spec.dim
        ndpn = self.ndpn
        eye = jnp.eye(ndpn, dtype=blocks.dtype)
        # Dirichlet rows -> unit row * assembled diagonal; padded owned
        # slots -> identity
        rowsel = bc_mask.astype(blocks.dtype)[..., None]  # (P, N, ndpn, 1)
        blocks = blocks * (1.0 - rowsel) + rowsel * eye * diag[..., None]
        padsel = (~self.own_mask).astype(blocks.dtype)[..., None, None]
        blocks = blocks * (1.0 - padsel) + padsel * eye
        Au_inv = gauss_solve(
            blocks[..., :d, :d],
            jnp.broadcast_to(
                jnp.eye(d, dtype=blocks.dtype), blocks[..., :d, :d].shape
            ),
            pivot=True,
        )
        if self.disc.spec.mixed:
            Apu = blocks[..., d, :d]  # (P, N, d)
            app = blocks[..., d, d]
            app = jnp.where(jnp.abs(app) > 1e-300, app, 1.0)
        else:
            Apu = app = None

        def M(r):
            if transpose:
                if Apu is None:
                    return jnp.einsum("pnji,pnj->pni", Au_inv, r[..., :d])
                zp = r[..., d] / app
                ru = r[..., :d] - Apu * zp[..., None]
                zu = jnp.einsum("pnji,pnj->pni", Au_inv, ru)
                return jnp.concatenate([zu, zp[..., None]], axis=-1)
            zu = jnp.einsum("pnij,pnj->pni", Au_inv, r[..., :d])
            if Apu is None:
                return zu
            rp = r[..., d] - jnp.einsum("pnj,pnj->pn", Apu, zu)
            zp = rp / app
            return jnp.concatenate([zu, zp[..., None]], axis=-1)

        return M

    def solve_linear(self, cfg, J_T, diag, b, bc_mask, transpose=False):
        """Solve J x = b with Dirichlet rows diag * x_row = b_row, all
        vectors sharded.  transpose=True expects J_T's element row/col
        axes ALREADY swapped (same trick as the single-chip path) and
        switches the preconditioner to the transposed forward one.  The
        whole solve is jitted once per LinearCfg (the shard_map matvec
        would otherwise be re-traced every Krylov call)."""
        key = (cfg, transpose)
        fn = self._lin_cache.get(key) if hasattr(self, "_lin_cache") else None
        if not hasattr(self, "_lin_cache"):
            self._lin_cache = {}
        if fn is None:
            fn = jax.jit(partial(self._solve_linear_impl, cfg, transpose))
            self._lin_cache[key] = fn
        return fn(J_T, diag, b, bc_mask)

    def _solve_linear_impl(self, cfg, transpose, J_T, diag, b, bc_mask):
        if cfg.operator != "ebe":
            # assembled per-part ELL apply: built once per solve (jit
            # hoists it out of the Krylov loop), scatter-free per
            # iteration (solve/ellpack.py rationale, sharded form).  On
            # TPU the apply runs the Pallas block kernel over a
            # once-per-Jacobian trailing transpose of the blocks.
            A_ell = self.ell_assemble(J_T)
            if (
                jax.default_backend() == "tpu"
                and A_ell.dtype != jnp.float64
            ):
                # f64 Pallas never compiles on this TPU stack (X64
                # rewrite has no tpu_custom_call rule) — f64 stays on
                # the einsum apply
                A_T = self.ell_trailing(A_ell)

                def op(v):
                    out = self.ell_matvec_T(A_T, v)
                    return jnp.where(bc_mask, diag * v, out)

            else:

                def op(v):
                    out = self.ell_matvec(A_ell, v)
                    return jnp.where(bc_mask, diag * v, out)

        else:

            def op(v):
                out = self.matvec(J_T, v)
                return jnp.where(bc_mask, diag * v, out)

        if self._mg is not None:
            M = self._mg.make(J_T, diag, bc_mask, op, transpose=transpose)
        else:
            M = self.make_precond(J_T, diag, bc_mask, transpose=transpose)
        method = cfg.method
        if method in ("auto", "dense"):
            method = "gmres"
        n = int(np.prod(b.shape))

        norm_b = jnp.sqrt(jnp.vdot(b, b).real)
        safe_nb = jnp.where(norm_b > 0, norm_b, 1.0)
        from calibr8_tpu.solve.gmres import gmres_cycle, pcg

        if method == "cg":
            x, _ = pcg(op, b, M, cfg.tol, cfg.max_iters)
            for _ in range(max(cfg.refine_iters, 1)):
                r = b - op(x)
                dx, _ = pcg(op, r, M, cfg.tol, cfg.max_iters)
                x = jnp.where(
                    jnp.sqrt(jnp.vdot(r, r).real) > cfg.tol * norm_b,
                    x + dx,
                    x,
                )
            r = b - op(x)
            return x, jnp.sqrt(jnp.vdot(r, r).real) / safe_nb

        # GMRES with MANUAL guarded restarts from the true residual
        # (see solve/linear.py) — cfg.max_iters counts TOTAL inner
        # iterations, each cycle is the own-rolled jitted GMRES(m)
        # with early exit (solve/gmres.py; sharded operands reduce
        # globally through its jnp dots).  RIGHT preconditioning
        # (operator = op∘M, dx = M y): a left-applied M would minimize
        # the PRECONDITIONED residual, a wildly distorted norm under
        # the mixed u/p block preconditioner (see solve/linear.py).
        restart = min(cfg.restart, n)
        n_outer = (
            max(1, -(-cfg.max_iters // restart)) + max(cfg.refine_iters, 1)
        )
        atol = cfg.tol * norm_b

        def opM(v):
            return op(M(v))

        def cond_fn(c):
            _, it, _, done = c
            return (it < n_outer) & jnp.logical_not(done)

        def body(c):
            x, it, stag, _ = c
            r = b - op(x)
            rn = jnp.sqrt(jnp.vdot(r, r).real)
            # in-cycle target one digit below atol; after a no-progress
            # cycle the next runs FULL LENGTH (the optimistic-estimate
            # stall fix) — see solve/linear.py
            cyc_atol = jnp.where(stag > 0, 0.0, 0.1 * atol)
            dy, _, _ = gmres_cycle(opM, r, restart, cyc_atol)
            cand = x + M(dy)
            rn_new = jnp.sqrt(
                jnp.vdot(b - op(cand), b - op(cand)).real
            )
            better = jnp.isfinite(rn_new) & (rn_new < rn)
            x_next = jnp.where(better, cand, x)
            # no-progress cycles (slow, non-improving, or non-finite)
            # must persist two consecutive cycles before exiting —
            # see solve/linear.py
            progress = better & (rn_new <= 0.95 * rn)
            stag_next = jnp.where(progress, 0, stag + 1)
            done = (jnp.minimum(rn_new, rn) <= atol) | (stag_next >= 2)
            return (x_next, it + 1, stag_next, done)

        x, _, _, _ = jax.lax.while_loop(
            cond_fn, body, (jnp.zeros_like(b), 0, 0, False)
        )
        r = b - op(x)
        return x, jnp.sqrt(jnp.vdot(r, r).real) / safe_nb


class DistStepSolver(StepSolver):
    """The primal Newton + Armijo line search on the sharded layout.

    Reuses StepSolver.solve_at_step verbatim (the control flow is layout
    agnostic); only assembly, slope, and the linear solve are overridden.
    `bc_dofs`/`bc_vals` arguments carry the (mask, values) dist arrays.
    """

    def __init__(self, ctx: DistContext, cfg: NewtonCfg):
        self.ctx = ctx
        self.assembler = ctx.prob.assembler
        self.cfg = cfg
        self._pallas_assemble = None
        self._assemble = jax.jit(self._assemble_impl)
        self._slope = jax.jit(self._slope_impl)

    def _assemble_impl(
        self, x, x_prev, xi_prev, params, bc_mask, bc_vals, ext_force
    ):
        R, J_T, diag, xi, path, nfail = self.ctx.assemble(
            x, x_prev, xi_prev, params
        )
        R = R - ext_force
        R = jnp.where(bc_mask, diag * (x - bc_vals), R)
        return dict(
            xi=xi,
            path=path,
            nfail=nfail,
            R=R,
            J_e=J_T,
            diag=diag,
            norm=jnp.sqrt(jnp.vdot(R, R).real),
        )

    def _slope_impl(self, J_e, diag, R, dx, bc_mask):
        Adx = self.ctx.matvec(J_e, dx)
        Adx = jnp.where(bc_mask, diag * dx, Adx)
        return jnp.vdot(R, Adx).real

    def _linear_solve(self, base, bc_mask):
        dx, relres = self.ctx.solve_linear(
            self.cfg.linear, base["J_e"], base["diag"], -base["R"], bc_mask
        )
        return self._check_linear(dx, relres)


class DistAdjoint:
    """Backward (in pseudo-time) adjoint sweep on the sharded layout —
    the dist analog of solve/adjoint.py Adjoint, with identical math:
    history vectors f/g live as sharded element arrays, the transposed
    condensed solve runs on sharded Krylov vectors, and the parameter
    gradient reduction is a segment-sum the partitioner lowers to a
    cross-device psum (the PCU_Add_Doubles analog,
    adjoint_objective.cpp:109).  QoI partials are taken by jax.grad
    through the pure dist->global scatter (one nodal vector is
    materialized per step; all element-level work stays sharded)."""

    def __init__(self, ctx: DistContext, qoi=None, linear_cfg=None):
        self.ctx = ctx
        self.qoi = qoi if qoi is not None else ctx.prob.qoi
        cfg = linear_cfg or ctx.prob.step_solver.cfg.linear
        self.linear_cfg = dc_replace(
            cfg, tol=min(cfg.tol, 1e-8), refine_iters=max(cfg.refine_iters, 2)
        )
        self._step = jax.jit(self._step_impl)

    def _qoi_partials(self, Xd, XPd, xi, params, aux):
        ctx = self.ctx
        if self.qoi is None:
            return (
                jnp.zeros_like(Xd),
                jnp.zeros_like(xi),
                jnp.zeros_like(params),
            )

        def Jfn(X_, xi_, p_):
            return self.qoi.evaluate(
                ctx.from_dist_device(X_),
                ctx.from_dist_device(XPd),
                ctx.from_dist_elem_device(xi_),
                p_,
                aux,
            )

        return jax.grad(Jfn, argnums=(0, 1, 2))(Xd, xi, params)

    def _step_impl(
        self, Xd, XPd, xi, xi_prev, path, params, f, g, bc_mask, aux
    ):
        ctx = self.ctx
        nde = ctx.nde
        B = ctx.adjoint_blocks(Xd, XPd, xi, xi_prev, path, params)
        dJ_dX, dJ_dxi, dJ_dp = self._qoi_partials(Xd, XPd, xi, params, aux)

        # RHS = -dJ/dx + scatter[ f + dxi_dx^T (g - dJ/dxi) ]
        g_modT = jnp.swapaxes(g - dJ_dxi, 1, 2)  # (P, nxi, E)
        rhs_eT = jnp.swapaxes(f, 1, 2) + jnp.einsum(
            "pije,pie->pje", B["dxi_dx_T"], g_modT
        )
        rhs = -dJ_dX + ctx.scatter_elem(jnp.swapaxes(rhs_eT, 1, 2))
        rhs = jnp.where(bc_mask, 0.0, rhs)

        dgT = jnp.stack(
            [B["J_total_T"][:, i, i] for i in range(nde)], axis=1
        )  # (P, nde, E)
        diag = ctx.scatter_elem(jnp.swapaxes(dgT, 1, 2))
        # transpose FIRST, then Dirichlet rows (adjoint.cpp:133-145)
        z, relres = ctx.solve_linear(
            self.linear_cfg,
            B["J_total_T"].swapaxes(1, 2),
            diag,
            rhs,
            bc_mask,
            transpose=True,
        )

        # local adjoint and history updates
        z_eT = jnp.swapaxes(ctx.gather_elem(z), 1, 2)  # (P, nde, E)
        rhs_phiT = g_modT - jnp.einsum("pjie,pje->pie", B["dR_dxi_T"], z_eT)
        phiT = jax.vmap(gauss_solve_T)(
            B["dC_dxi_T"].swapaxes(1, 2), rhs_phiT[:, :, None, :]
        )[:, :, 0, :]
        f_next = -jnp.swapaxes(
            jnp.einsum("pije,pie->pje", B["dC_dxprev_T"], phiT), 1, 2
        )
        g_next = -jnp.swapaxes(
            jnp.einsum("pije,pie->pje", B["dC_dxiprev_T"], phiT), 1, 2
        )

        # parameter gradient: (dC/dp)^T phi + dJ/dp + (dR/dp)^T z
        grad_e = jnp.einsum("piqe,pie->peq", B["dC_dp_T"], phiT) + jnp.einsum(
            "pjqe,pje->peq", B["dR_dp_T"], z_eT
        )
        n_sets = params.shape[0]
        grad = (
            jax.ops.segment_sum(
                grad_e.reshape(-1, grad_e.shape[-1]),
                ctx.es.reshape(-1),
                num_segments=n_sets,
            )
            + dJ_dp
        )
        return z, jnp.swapaxes(phiT, 1, 2), f_next, g_next, grad, relres

    def sweep(self, traj, params_all, time_grid, dbcs=None):
        """traj is the dict from DistPrimal.run.  Returns (grad, zs)."""
        ctx = self.ctx
        prob = ctx.prob
        dbcs = dbcs or prob.dbcs
        P_, E = ctx.part.n_parts, ctx.part.E_loc
        f = jnp.zeros((P_, E, ctx.nde), ctx.dtype)
        g = jnp.zeros((P_, E, ctx.nxi), ctx.dtype)
        grad = jnp.zeros_like(params_all)
        zs = {}
        n = time_grid.num_steps
        for step in range(n, 0, -1):
            t = time_grid.time(step)
            bc_dofs, _ = dbcs.arrays(t, step)
            bc_mask, _ = ctx.bc_dist(bc_dofs, jnp.zeros_like(bc_dofs, ctx.dtype))
            aux = (
                self.qoi.setup_step(
                    step, t, time_grid.dt(step), time_grid.total_time
                )
                if self.qoi is not None
                else ()
            )
            z, phi, f, g, dgrad, relres = self._step(
                traj["x"][step],
                traj["x"][step - 1],
                traj["xi"][step],
                traj["xi"][step - 1],
                traj["path"][step],
                params_all,
                f,
                g,
                bc_mask,
                aux,
            )
            rr = float(relres)
            if not np.isfinite(rr) or rr > 0.5:
                from calibr8_tpu.solve.adjoint import AdjointSolveError

                raise AdjointSolveError(
                    f"dist adjoint linear solve diverged at step {step} "
                    f"(relative residual {rr:.3e})"
                )
            grad = grad + dgrad
            zs[step] = (z, phi)
        return grad, zs


class DistPrimal:
    """Forward load-stepping loop on the sharded layout (the dist analog
    of solve/primal.py Primal.run; QoI evaluation reuses the global QoI
    on a device-scattered view — QoIs are cheap reductions)."""

    def __init__(self, ctx: DistContext, cfg: NewtonCfg | None = None):
        self.ctx = ctx
        prob = ctx.prob
        self.solver = DistStepSolver(ctx, cfg or prob.step_solver.cfg)

    def run(self, params_all=None, qoi_eval=True):
        ctx = self.ctx
        prob = ctx.prob
        params = prob.params0 if params_all is None else params_all
        tg = prob.time_grid
        x = ctx.zeros()
        xi = ctx.init_xi_dist()
        path = jax.device_put(
            jnp.zeros((ctx.part.n_parts, ctx.part.E_loc), jnp.int32),
            ctx._shard,
        )
        traj = dict(x=[x], xi=[xi], path=[path], qoi_values=[])
        for step in range(1, tg.num_steps + 1):
            t = tg.time(step)
            bc_dofs, bc_vals = prob.dbcs.arrays(t, step)
            bc_mask, bc_g = ctx.bc_dist(bc_dofs, bc_vals)
            ext = (
                ctx.to_dist(prob.tbcs.array(t))
                if prob.tbcs is not None
                else ctx.zeros()
            )
            x_new, xi_new, path_new, _ = self.solver.solve_at_step(
                x, x, xi, params, bc_mask, bc_g, ext, step=step
            )
            J_step = 0.0
            if qoi_eval and prob.qoi is not None:
                aux = prob.qoi.setup_step(step, t, tg.dt(step), tg.total_time)
                J_step = float(
                    prob.qoi.evaluate(
                        ctx.from_dist_device(x_new),
                        ctx.from_dist_device(x),
                        ctx.from_dist_elem_device(xi_new),
                        params,
                        aux,
                    )
                )
                J_step = prob.qoi.postprocess(J_step, step)
            traj["x"].append(x_new)
            traj["xi"].append(xi_new)
            traj["path"].append(path_new)
            traj["qoi_values"].append(J_step)
            x, xi, path = x_new, xi_new, path_new
        return traj

"""Geometric two-level multigrid preconditioner on the nested hierarchy.

Native replacement for the reference's MueLu AMG inside the Teko block
preconditioner (reference: source/calibr8/src/linear_solve.cpp:36-123 —
block Gauss-Seidel whose DIAGONAL BLOCKS are MueLu AMG with
node-coordinates nullspace).  AMG's job there is h-independent Krylov
convergence on large meshes; here the same is achieved GEOMETRICALLY:
when the solve mesh was produced by uniform refinement (mesh/refine.py
— the NestedDisc machinery), the refinement chain IS the hierarchy.

Mirroring the reference's structure, the V-cycle acts on the
DISPLACEMENT (u) block only, inside the same u/p block Gauss-Seidel
used by the one-level preconditioner (solve/precond.py):

  z_u = V(1,1)-cycle on A_uu applied to r_u
  z_p = app^{-1} (r_p - A_pu z_u)

with
  * prolongation P: composite P1 interpolation through all levels
    (each fine node averages its two edge-endpoint parents; composed
    levels give up-to-2^L-entry rows, kept as padded (idx, weight)
    arrays — duplicate columns simply sum);
  * coarse operator: Galerkin A_c = (MP)^T A_uu (MP) assembled
    elementwise from the UNASSEMBLED fine element Jacobians (one
    segment_sum — no fine CRS matrix ever exists), with M masking
    Dirichlet rows so BCs are handled purely by the smoother;
  * smoother: damped node-block (d x d) Jacobi, pre + post;
  * coarse solve: dense LU (the base mesh is 4^L-8^L times smaller).

The cycle is a FIXED linear operator, so it is a valid preconditioner
for plain (non-flexible) GMRES/CG.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.solve.precond import node_block_diagonal
from calibr8_tpu.utils.smallsolve import gauss_solve


def _coarse_dense_state(A, ns_iters: int = 40):
    """Factorization-as-arrays for the dense coarse solve: the LU pair
    on CPU, the Newton-Schulz explicit inverse on TPU (see
    _coarse_dense_solver).  The returned pytree is reusable across
    Newton iterations (mg.make_state preconditioner lag)."""
    if jax.default_backend() != "tpu":
        return jax.scipy.linalg.lu_factor(A)
    n = A.shape[0]
    a1 = jnp.max(jnp.sum(jnp.abs(A), axis=0))
    ainf = jnp.max(jnp.sum(jnp.abs(A), axis=1))
    X0 = A.T / (a1 * ainf)
    eye = jnp.eye(n, dtype=A.dtype)
    eps = 1e-6 if A.dtype == jnp.float32 else 1e-13
    tol2 = (eps * eps) * n

    def body(c):
        X, it, _ = c
        R = eye - A @ X
        rn2 = jnp.sum(R * R)
        return (X + X @ R, it + 1, rn2 < tol2)

    def cond(c):
        _, it, done = c
        return (it < ns_iters) & jnp.logical_not(done)

    X, _, _ = jax.lax.while_loop(
        cond, body, (X0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    return X


def _coarse_apply(st):
    """Coarse-solve closure from a _coarse_dense_state pytree."""
    if jax.default_backend() != "tpu":
        return lambda b: jax.scipy.linalg.lu_solve(st, b)
    return lambda b: st @ b


def _coarse_dense_solver(A, ns_iters: int = 40):
    """Direct solver for the dense coarse system, picked per backend:

    * CPU: LAPACK LU (fast there);
    * TPU: explicit inverse by NEWTON-SCHULZ iteration
      X <- X (2I - A X) = X + X R, X0 = A^T / (||A||_1 ||A||_inf) —
      pure MXU matmuls (LU's sequential triangular factor/solves
      measured ~6 s per Newton step on v5e), quadratically convergent,
      and the apply is one matvec, trivially a fixed linear operator.
      The loop EXITS EARLY on ||I - A X||_F (quadratic convergence
      reaches the dtype floor in ~10-20 iterations on well-scaled
      coarse ops; the fixed 35-iteration unroll was pure overhead).

    A weak iterative coarse solve (Chebyshev) loses the V-cycle's
    h-independence (measured 41 -> 101 iterations under one refinement)
    — the coarse LOW modes are exactly what multigrid exists to kill,
    so the coarse solve must be accurate."""
    return _coarse_apply(_coarse_dense_state(A, ns_iters))


def composite_parents(refine_chain):
    """Compose the per-level (node -> 2 parent nodes, weight 1/2) maps
    of a uniform-refinement chain into base-level interpolation rows.

    Returns (idx (n_fine, K), w (n_fine, K)) with K = 2^levels;
    duplicate columns are allowed (weights add under summation)."""
    n_base = int(refine_chain[0].node_parents.max()) + 1
    idx = np.arange(n_base, dtype=np.int32)[:, None]
    w = np.ones((n_base, 1))
    for r in refine_chain:
        pa = r.node_parents[:, 0]
        pb = r.node_parents[:, 1]
        idx = np.concatenate([idx[pa], idx[pb]], axis=1)
        w = np.concatenate([0.5 * w[pa], 0.5 * w[pb]], axis=1)
    return idx, w


def _level_ell_enabled():
    """Level matvecs through the assembled node-block ELL (Pallas on
    TPU, einsum elsewhere) instead of unrolled EBE lane FMAs.  Default
    on; CALIBR8_MG_LEVEL_ELL=0 restores the EBE form (A/B, bisect)."""
    import os

    return os.environ.get("CALIBR8_MG_LEVEL_ELL", "1") != "0"


def fine_u_setup(disc, J_e, diag, bc_dofs, op, uslots, omega):
    """Fine-level u-block pieces shared by the geometric (this module)
    and aggregation (solve/amg.py) multigrid preconditioners: u-block
    element Jacobians (trailing layout when available), the u-block
    matvec `op_u`, the damped node-block Jacobi smoother, the Dirichlet
    u-mask, and the u/p block-GS closure pieces (Apu, app)."""
    from calibr8_tpu.fem.assembly import jac_is_trailing

    d = disc.spec.dim
    spec = disc.spec
    n_u = disc.n_dofs_u
    trailing = jac_is_trailing(J_e, disc)
    if trailing:
        # u-block in trailing layout (nde_u, nde_u, n_e): the
        # elem-first (n_e, 12, 12) form pads ~14x on TPU tiles
        # (1.5 GB per temp at 196k elements -> HBM OOM)
        J_uuT = jnp.take(
            jnp.take(J_e, jnp.asarray(uslots), axis=0),
            jnp.asarray(uslots),
            axis=1,
        )[:, :, : disc.n_elem]
        J_uu = None
    else:
        J_uu = J_e[:, uslots, :][:, :, uslots]
        J_uuT = None

    # node-diagonal blocks with Dirichlet row replacement (the same
    # treatment as BlockJacobiGS, solve/precond.py)
    blocks = node_block_diagonal(disc, J_e)  # (n_nodes, ndpn, ndpn)
    D = disc.nodemat(diag)
    bc_mask = jnp.zeros(disc.n_dofs, bool).at[bc_dofs].set(True)
    dtype = J_e.dtype
    bc_nm = disc.nodemat(bc_mask.astype(dtype))
    eye = jnp.eye(disc.ndpn, dtype=dtype)
    rowsel = bc_nm[:, :, None]
    blocks = blocks * (1.0 - rowsel) + rowsel * eye[None] * D[:, :, None]

    Bu = blocks[:, :d, :d]
    Bu_inv = gauss_solve(
        Bu, jnp.broadcast_to(jnp.eye(d, dtype=dtype), Bu.shape),
        pivot=True,
    )  # (n_nodes, d, d)
    Apu = blocks[:, d, :d] if spec.mixed else None
    Aup = blocks[:, :d, d] if spec.mixed else None
    app = blocks[:, d, d] if spec.mixed else None
    if spec.mixed:
        app = jnp.where(jnp.abs(app) > 1e-300, app, 1.0)

    conn = disc.conn
    diag_u = diag[:n_u]
    bc_u = bc_mask[:n_u]

    if op is not None:
        # restrict the FULL operator (the fast assembled-ELL apply
        # on TPU): y_u = A_uu v_u is op([v_u; 0]) truncated — the p
        # columns see zeros, the p rows are dropped
        n_p = disc.n_dofs - n_u

        def op_u(v):
            z = jnp.concatenate([v, jnp.zeros(n_p, v.dtype)])
            return op(z)[:n_u]

    elif trailing:

        def op_u(v):
            # a u-only matvec via a zero-padded full vector would
            # need the full disc; do the trailing loop directly
            V = v.reshape(disc.n_nodes, d)
            v_eT = V[conn].reshape(disc.n_elem, -1).T
            nde_u = len(uslots)
            rows = []
            for i in range(nde_u):
                acc = J_uuT[i, 0] * v_eT[0]
                for j in range(1, nde_u):
                    acc = acc + J_uuT[i, j] * v_eT[j]
                rows.append(acc)
            Y = disc.scatter_rows(
                jnp.stack(rows, 0).T.reshape(-1, d)
            )
            out = Y.reshape(-1)
            return jnp.where(bc_u, diag_u * v, out)

    else:

        def op_u(v):
            V = v.reshape(disc.n_nodes, d)
            v_e = V[conn].reshape(disc.n_elem, -1)
            y_e = jnp.einsum("eij,ej->ei", J_uu, v_e)
            Y = disc.scatter_rows(y_e.reshape(-1, d))
            out = Y.reshape(-1)
            return jnp.where(bc_u, diag_u * v, out)

    mask_u = jnp.where(bc_u, 0.0, 1.0).astype(dtype)
    m_eT = (
        mask_u.reshape(disc.n_nodes, d)[conn]
        .reshape(disc.n_elem, -1)
        .T
    )  # (nde_u, n_e)

    def smooth(r):
        Z = jnp.einsum(
            "nij,nj->ni", Bu_inv, r.reshape(disc.n_nodes, d)
        )
        return omega * Z.reshape(-1)

    # lazy MASKED u-block slice accessor for the Galerkin consumers:
    # jt_mask(i, j) -> (n_e,) = (M J M)[u-slot i, u-slot j].  Slicing
    # J_e directly keeps the whole product fused — materializing the
    # masked copy (J_uuT * m * m) was a 1.12 GB HLO buffer at 1.5M
    # elements (measured in the scale-run OOM report).
    us_np = np.asarray(uslots)
    n_e = disc.n_elem
    if trailing:

        def jt_mask(i, j):
            return (
                J_e[int(us_np[i]), int(us_np[j]), :n_e]
                * m_eT[i]
                * m_eT[j]
            )

        def jt_mask_slice(i, j, s, c):
            # element-range slice of the lazy masked accessor: the
            # chunked Galerkin build (galerkin_u) bounds its stage-1
            # temps to one chunk; slicing BEFORE the multiply keeps
            # the product fused at chunk size
            row = jax.lax.dynamic_slice_in_dim(
                J_e[int(us_np[i]), int(us_np[j])], s, c, 0
            )
            mi = jax.lax.dynamic_slice_in_dim(m_eT[i], s, c, 0)
            mj = jax.lax.dynamic_slice_in_dim(m_eT[j], s, c, 0)
            return row * mi * mj

    else:

        def jt_mask(i, j):
            return J_uu[:, i, j] * m_eT[i] * m_eT[j]

        def jt_mask_slice(i, j, s, c):
            row = jax.lax.dynamic_slice_in_dim(J_uu[:, i, j], s, c, 0)
            mi = jax.lax.dynamic_slice_in_dim(m_eT[i], s, c, 0)
            mj = jax.lax.dynamic_slice_in_dim(m_eT[j], s, c, 0)
            return row * mi * mj

    return dict(
        trailing=trailing,
        J_uuT=J_uuT,
        jt_mask=jt_mask,
        jt_mask_slice=jt_mask_slice,
        J_uu=J_uu,
        op_u=op_u,
        smooth=smooth,
        Bu_inv=Bu_inv,
        Apu=Apu,
        Aup=Aup,
        app=app,
        mask_u=mask_u,
        m_eT=m_eT,
        bc_u=bc_u,
        diag_u=diag_u,
        dtype=dtype,
    )


def mixed_wrap(disc, vcycle, fu, transpose=False):
    """Wrap a u-block cycle into the u/p block Gauss-Seidel the
    one-level preconditioner uses (solve/precond.py):
    z_u = cycle(r_u); z_p = app^{-1} (r_p - A_pu z_u).

    transpose=True mirrors the sweep (p first, then u corrected
    through the operator's up-coupling) — the analog of the transposed
    block-GS that the adjoint systems need (solve/precond.py
    transpose=True; forward ordering measurably stalls the adjoint
    Krylov).  The element blocks in `fu` already belong to the
    TRANSPOSED operator (solve/linear.py swaps before building the
    preconditioner), so only the sweep order changes here."""
    d = disc.spec.dim
    n_u = disc.n_dofs_u
    spec = disc.spec
    Apu = fu["Apu"]
    Aup = fu["Aup"]
    app = fu["app"]

    if transpose and spec.mixed:

        def M(r):
            z_p = r[n_u:] / app
            Ru = r[:n_u].reshape(disc.n_nodes, d) - Aup * z_p[:, None]
            z_u = vcycle(Ru.reshape(-1))
            return jnp.concatenate([z_u, z_p])

        return M

    def M(r):
        r_u = r[:n_u]
        z_u = vcycle(r_u)
        if not spec.mixed:
            return z_u
        Zu = z_u.reshape(disc.n_nodes, d)
        r_p = r[n_u:] - jnp.sum(Apu * Zu, axis=1)
        z_p = r_p / app
        return jnp.concatenate([z_u, z_p])

    return M


def _pair_p_loc(child_conn, parent_conn, node_parents, elem_parent):
    """Per-child-element NODE interpolation (n_e, npe, npe):
    P[e, l, m] = weight of parent local node m in child local node l
    (P1: midpoints average their two edge endpoints, original nodes
    map to themselves)."""
    npe = child_conn.shape[1]
    n_e = child_conn.shape[0]
    P = np.zeros((n_e, npe, npe))
    pc = parent_conn[elem_parent]  # (n_e, npe)
    for l in range(npe):
        v = child_conn[:, l]
        for k in range(2):
            cn = node_parents[v, k]
            pos = np.full(n_e, -1, dtype=np.int64)
            for m in range(npe):
                pos = np.where(pc[:, m] == cn, m, pos)
            assert np.all(pos >= 0), "parent node escaped parent element"
            np.add.at(P, (np.arange(n_e), l, pos), 0.5)
    return P


class MGPrecondFactory:
    """Per-problem MG setup (host, once); make() builds the
    preconditioner for one assembled element-Jacobian state (once per
    Newton iteration).

    For 1-2 refinement levels the cycle is the proven COMPOSITE
    two-level form (all levels folded into one prolongation, dense
    base solve).  For >= 3 levels it RECURSES level by level — a
    two-level cycle over an 8^3-fold composite coarsening loses
    h-independence (the smoother must cover the whole intermediate
    band), and the Galerkin product of an EBE operator through P1
    interpolation stays EBE on the parent mesh (each child element
    lands exactly in its parent's block), so every level keeps the
    trailing element-block form with no assembled matrices."""

    def __init__(self, disc, refine_chain, base_mesh=None,
                 omega: float = 0.7):
        self.disc = disc
        spec = disc.spec
        d = spec.dim
        self.d = d
        self.omega = omega
        idx, w = composite_parents(refine_chain)
        assert idx.shape[0] == disc.n_nodes, (
            f"hierarchy fine nodes {idx.shape[0]} != disc nodes {disc.n_nodes}"
        )
        self.K = idx.shape[1]
        self.n_c = int(idx.max()) + 1
        self.parents_idx = jnp.asarray(idx, jnp.int32)  # (n_f, K)
        self.parents_w = jnp.asarray(w, disc.dtype)  # (n_f, K)
        self.n_cu = self.n_c * d

        # u-block slots within the node-interleaved element dof vector
        npe = spec.npe
        ndpn = spec.ndofs_per_node
        uslots = np.array(
            [l * ndpn + q for l in range(npe) for q in range(d)],
            dtype=np.int64,
        )
        self.uslots = uslots
        conn = np.asarray(disc.conn)  # (n_e, npe)
        # deep chains recurse level by level (_make_recursive) and
        # never touch the composite maps — skip building them (cd alone
        # is n_e * nde_u * K int64 = 1.2 GB at 1.5M elements)
        self.recursive = base_mesh is not None and len(refine_chain) >= 3
        if not self.recursive:
            # coarse u-dof ids per fine element u-slot and parent column
            pidx = idx[conn]  # (n_e, npe, K)
            cd = np.zeros((disc.n_elem, npe * d, self.K), dtype=np.int64)
            for l in range(npe):
                for q in range(d):
                    cd[:, l * d + q, :] = pidx[:, l, :] * d + q
            self.cd = jnp.asarray(cd)
            self.wgt = jnp.asarray(
                np.repeat(w[conn], d, axis=1), disc.dtype
            )  # (n_e, npe*d, K)

        # -- coarse-ELEMENT-block Galerkin maps --------------------------
        # every fine element's Galerkin contribution lands entirely in
        # its BASE parent element's (nde_u x nde_u) block (composite
        # interpolation stays within the containing base element), so
        # A_c assembles as ONE segment_sum of per-element local products
        # instead of K^2 scatters into the dense matrix (measured ~5 s
        # per Newton step at 196k elements on TPU).
        self._coarse_maps = None
        if base_mesh is not None:
            ep = refine_chain[-1].elem_parent
            for r in reversed(refine_chain[:-1]):
                ep = r.elem_parent[ep]
            # chain refers to the UNSORTED fine mesh; map disc's
            # elem-set-sorted element order back to it by conn rows
            fine_conn = np.ascontiguousarray(
                np.asarray(refine_chain[-1].fine.conn), dtype=np.int64
            )
            conn64 = np.ascontiguousarray(conn, dtype=np.int64)
            row_of = {
                fine_conn[i].tobytes(): i for i in range(len(fine_conn))
            }
            perm = np.array(
                [row_of[conn64[k].tobytes()] for k in range(len(conn64))]
            )
            self._perm = perm
        if base_mesh is not None and not self.recursive:
            base_parent = ep[perm]  # (n_e_sorted,) base element id
            base_conn = np.asarray(base_mesh.conn)  # (n_ce, npe)
            n_ce = base_conn.shape[0]
            # local interpolation: fine u-slot -> parent's coarse u-slot
            nde_u = npe * d
            P_loc = np.zeros((disc.n_elem, nde_u, nde_u))
            for l in range(npe):
                nodes = conn[:, l]  # fine node per element
                for k in range(self.K):
                    cnode = idx[nodes, k]  # (n_e,)
                    wk = w[nodes, k]
                    # position of cnode within the base parent's conn
                    pos = np.full(disc.n_elem, -1, dtype=np.int64)
                    for m in range(npe):
                        hit = base_conn[base_parent, m] == cnode
                        pos = np.where(hit, m, pos)
                    ok = pos >= 0
                    assert np.all(ok | (wk == 0.0)), (
                        "composite parent escaped the base element"
                    )
                    pos = np.where(ok, pos, 0)
                    for q in range(d):
                        np.add.at(
                            P_loc,
                            (
                                np.arange(disc.n_elem),
                                l * d + q,
                                pos * d + q,
                            ),
                            np.where(ok, wk, 0.0),
                        )
            cdofs = (
                base_conn[:, :, None] * d + np.arange(d)[None, None, :]
            ).reshape(n_ce, nde_u)
            self._coarse_maps = dict(
                P_locT=jnp.asarray(
                    np.moveaxis(P_loc, 0, -1), disc.dtype
                ),  # (nde_u, nde_u, n_e)
                base_parent=jnp.asarray(base_parent, jnp.int32),
                cdofs=jnp.asarray(cdofs, jnp.int64),
                n_ce=n_ce,
            )

        # recursive per-pair hierarchy for deep chains
        if self.recursive:
            self._build_pair_levels(disc, refine_chain, base_mesh)

    # -- constant hoisting (axon remote-compile 413 at 1M+ DOF) ----------
    _PAIR_HOIST = (
        "P_nT", "elem_parent", "pa", "pb", "parent_conn",
        "ell_nbr", "ell_ids",
    )

    def hoist_args(self):
        """Big static transfer arrays as a pytree to pass through jit
        ARGUMENTS (mirrors Disc.hoist_args): the level-0 P_nT alone is
        (npe, npe, n_elem) ~100 MB at 1.5M elements, and embedded-
        constant compiles overflow the axon remote-compile request
        (HTTP 413) there."""
        st = {}
        if self.recursive:
            st["pairs"] = [
                {k: pr[k] for k in self._PAIR_HOIST} for pr in self._pairs
            ]
        else:
            st["cd"] = self.cd
            st["wgt"] = self.wgt
            if self._coarse_maps is not None:
                st["coarse_maps"] = {
                    k: self._coarse_maps[k]
                    for k in ("P_locT", "base_parent", "cdofs")
                }
        return st

    @contextlib.contextmanager
    def bind(self, st):
        """Temporarily substitute hoisted arrays (typically tracers)
        while make()/the cycle are traced."""
        olds = (
            getattr(self, "_pairs", None),
            getattr(self, "cd", None),
            getattr(self, "wgt", None),
            self._coarse_maps,
        )
        try:
            if "pairs" in st:
                self._pairs = [
                    dict(pr, **hp) for pr, hp in zip(self._pairs, st["pairs"])
                ]
            if "cd" in st:
                self.cd = st["cd"]
                self.wgt = st["wgt"]
            if "coarse_maps" in st:
                self._coarse_maps = dict(
                    self._coarse_maps, **st["coarse_maps"]
                )
            yield
        finally:
            self._pairs, self.cd, self.wgt, self._coarse_maps = olds

    def _build_pair_levels(self, disc, refine_chain, base_mesh):
        """Host maps for the recursive hierarchy: one entry per
        ADJACENT level pair (child -> parent), finest first."""
        L = len(refine_chain)
        pairs = []
        for l in range(L):
            r = refine_chain[L - 1 - l]
            if l == 0:
                child_conn = np.asarray(disc.conn)
                elem_parent = np.asarray(r.elem_parent)[self._perm]
            else:
                child_conn = np.asarray(r.fine.conn)
                elem_parent = np.asarray(r.elem_parent)
            parent_mesh = (
                refine_chain[L - 2 - l].fine if L - 2 - l >= 0 else base_mesh
            )
            parent_conn = np.asarray(parent_mesh.conn)
            node_parents = np.asarray(r.node_parents)
            P_n = _pair_p_loc(
                child_conn, parent_conn, node_parents, elem_parent
            )
            # uniform refinement emits children GROUPED by parent
            # (child i of parent i // k); when that holds the Galerkin
            # child-reduce is a static reshape-sum instead of a
            # segment_sum (detected host-side, so the jit program
            # never carries the choice)
            n_pe = parent_conn.shape[0]
            k = len(elem_parent) // max(n_pe, 1)
            grouped = len(elem_parent) == n_pe * k and np.array_equal(
                elem_parent, np.repeat(np.arange(n_pe), k)
            )
            # node-pair ELL maps of the PARENT mesh: the level matvecs
            # (u and p chains share them) apply through the assembled
            # ELL Pallas kernel — one custom call per matvec instead of
            # the unrolled EBE FMA forest (hundreds of fused
            # element-length ops per instantiation; ~0.5 GB of TPU code
            # per V-cycle inline site at 1.5M elements, over the ~2 GB
            # executable-load ceiling)
            from calibr8_tpu.solve.ellpack import ell_maps_from_conn

            pmaps = ell_maps_from_conn(parent_conn, parent_mesh.n_nodes)
            pairs.append(
                dict(
                    P_nT=jnp.asarray(
                        np.moveaxis(P_n, 0, -1), disc.dtype
                    ),  # (npe, npe, n_e_child)
                    group_k=k if grouped else None,
                    elem_parent=jnp.asarray(elem_parent, jnp.int32),
                    pa=jnp.asarray(node_parents[:, 0], jnp.int32),
                    pb=jnp.asarray(node_parents[:, 1], jnp.int32),
                    parent_conn=jnp.asarray(parent_conn, jnp.int32),
                    n_parent_nodes=parent_mesh.n_nodes,
                    n_parent_elems=parent_conn.shape[0],
                    ell_nbr=jnp.asarray(pmaps["nbr"], jnp.int32),
                    ell_ids=jnp.asarray(pmaps["ell_ids_T"], jnp.int32),
                    ell_K=pmaps["K"],
                    # host ints (static slice offsets) — never traced
                    ell_offs=pmaps.get("offsets"),
                )
            )
        self._pairs = pairs

    def _make_recursive(self, J_e, diag, bc_dofs, op=None, transpose=False,
                        state=None, capture=None):
        """Recursive multilevel V-cycle over the refinement chain;
        Chebyshev smoothing per level, EBE Galerkin coarse operators,
        dense base solve.  Pressure gets its own scalar chain through
        the same transfers (the diagonal-only p treatment is
        h-dependent — measured on the AMG path).

        state/capture implement the PRECONDITIONER-STATE split (the
        MueLu reuse discipline, linear_solve.cpp:36-123): the heavy
        per-Jacobian arrays — level Galerkin products (assembled to
        node-block ELL values), node-block diagonal inverses, power-
        iteration spectral bounds, and the Newton-Schulz coarse
        inverses — form a pytree built ONCE per hierarchy rebuild
        (make_state) and passed back as jit arguments (make(state=)).
        The Krylov program then contains only the cycle applies: the
        Galerkin/lmax/NS code (~0.8 GB generated TPU code at 1.5M
        elements, scripts/ablate_code_size.py) leaves the solve
        executable, and the rebuild cost amortizes across Newton
        iterations (preconditioner lag)."""
        from calibr8_tpu.solve.amg import _chebyshev, _power_lmax

        # code-size attribution knobs (compile-only ablations against
        # the chip's ~2 GB executable-load ceiling;
        # scripts/ablate_code_size.py): each disables one cycle
        # ingredient.  NEVER set in production runs.
        import os as _os

        _ablate = _os.environ.get("CALIBR8_MG_ABLATE", "")

        def _mk_cheb(op_l, dinv, lmax):
            if "nosmooth" in _ablate:
                return dinv
            return _chebyshev(op_l, dinv, lmax, cheb_deg, cheb_ratio)

        def _mk_lmax(op_l, dinv, n, dtype):
            if "nolmax" in _ablate:
                return jnp.asarray(1.0, dtype)
            return _power_lmax(op_l, dinv, n, dtype)

        def _mk_coarse(A):
            if "nocoarse" in _ablate:
                return lambda r: r
            return _coarse_dense_solver(A)

        disc = self.disc
        d = self.d
        spec = disc.spec
        npe = spec.npe
        fu = fine_u_setup(
            disc, J_e, diag, bc_dofs, op, self.uslots, self.omega
        )
        dtype = fu["dtype"]
        mask_u = fu["mask_u"]
        m_eT = fu["m_eT"]
        op_u = fu["op_u"]
        # level-0 element blocks come through the LAZY masked accessor
        # (fine_u_setup jt_mask) — materializing the masked copy was a
        # 1.12 GB HLO buffer at 1.5M elements
        jt0 = fu["jt_mask"]
        cheb_deg = getattr(self, "cheb_degree", 6)
        cheb_ratio = getattr(self, "cheb_ratio", 12.0)
        # XLA:TPU unrolls the constant-bound smoother loops, so the
        # smoother code scales ~linearly with the degree at every
        # cycle site (the 'cycle' ablation: 0.51 GB of 1.06 at deg 6).
        # Until M carries an explicit linear_call transpose (which
        # would legalize dynamic trip bounds), a reduced degree is the
        # code-size lever against the chip's ~2 GB load ceiling.
        cheb_deg = int(_os.environ.get("CALIBR8_MG_CHEB_DEGREE", cheb_deg))

        def _reduce_child(pr):
            """(E_child,) -> (E_parent,) sum over children, per vector.
            Uniform refinement emits children GROUPED by parent, so the
            reduce is a static reshape-sum there; otherwise one rank-1
            segment_sum.  Rank-1 keeps everything off the tile-padded
            layouts (an (npe, d, npe, d, E) einsum intermediate padded
            32x -> 27 GB at 1.5M elements)."""
            k = pr.get("group_k")
            if k is not None:
                # child j of parent i sits at i*k + j: strided rank-1
                # slices, NOT v.reshape(n_p, k).sum(-1) — that reshape
                # materializes an (n_p, k) temp whose k-lane minor dim
                # tile-pads 16x (measured: ~20 live 96 MB temps = the
                # 2.2 GB HBM overshoot at 1.5M elements)
                def red(v, k=k):
                    acc = v[0::k]
                    for j in range(1, k):
                        acc = acc + v[j::k]
                    return acc

                return red
            return lambda v: jax.ops.segment_sum(
                v, pr["elem_parent"], num_segments=pr["n_parent_elems"]
            )

        def _galerkin_block(jt, P, red):
            """One block of the Galerkin triple product: element blocks
            via the lazy accessor jt(i, j) -> (C,), transfers P (npe,
            npe, C) -> (nde_u, nde_u, n_red) as unrolled trailing-layout
            lane FMAs (NOT a rank-5 einsum — XLA materializes those
            with the tiny dims on the tiled axes, 32x HBM padding)."""
            # stage 1: H[l][q][dd][r] = sum_m jt(l d + q, m d + r) P[m, dd]
            H = [
                [
                    [[None] * d for _ in range(npe)]
                    for _ in range(d)
                ]
                for _ in range(npe)
            ]
            for l in range(npe):
                for q in range(d):
                    for dd in range(npe):
                        for r2 in range(d):
                            acc = jt(l * d + q, r2) * P[0, dd]
                            for m in range(1, npe):
                                acc = acc + (
                                    jt(l * d + q, m * d + r2) * P[m, dd]
                                )
                            H[l][q][dd][r2] = acc
            # stage 2 + child reduce: G[c d + q, dd d + r]
            rows = []
            for c in range(npe):
                for q in range(d):
                    cols = []
                    for dd in range(npe):
                        for r2 in range(d):
                            acc = P[0, c] * H[0][q][dd][r2]
                            for l in range(1, npe):
                                acc = acc + P[l, c] * H[l][q][dd][r2]
                            cols.append(red(acc))
                    rows.append(jnp.stack(cols, 0))
            return jnp.stack(rows, 0)

        from calibr8_tpu.fem.assembly import _elem_chunk_size

        gal_chunk = _elem_chunk_size()

        def galerkin_u(jt, jt_sl, pr, E_ch):
            """Galerkin coarse blocks, chunked over PARENT elements
            past the element-chunk threshold: the one-shot stage-1
            holds npe^2 d^2 = 144 full-length child vectors (0.9 GB at
            1.5M elements) right when the scale newton sits at the HBM
            edge.  Chunking needs children GROUPED by parent
            (group_k); the segment_sum pairing falls back to the
            one-shot form."""
            k = pr.get("group_k")
            if k is None or E_ch <= gal_chunk:
                return _galerkin_block(jt, pr["P_nT"], _reduce_child(pr))
            n_par = pr["n_parent_elems"]
            pch = max(1, gal_chunk // k)
            nchunks = -(-n_par // pch)

            def red_in_chunk(v, k=k):
                acc = v[0::k]
                for j in range(1, k):
                    acc = acc + v[j::k]
                return acc

            P = pr["P_nT"]
            nde_u = npe * d
            out = jnp.zeros((nde_u, nde_u, n_par), dtype)

            def chunk_at(s_par, csize_par):
                s_ch = s_par * k
                c_ch = csize_par * k
                jt_c = lambda i, j: jt_sl(i, j, s_ch, c_ch)  # noqa: E731
                P_c = jax.lax.dynamic_slice_in_dim(P, s_ch, c_ch, 2)
                return _galerkin_block(jt_c, P_c, red_in_chunk)

            # backward-overlapping final chunk: a remainder-shaped
            # chunk_at would instantiate the Galerkin stage kernels a
            # second time in generated code (executable-size ceiling);
            # overlapped parents recompute identical blocks in place.
            def body(c, out):
                s = jnp.minimum(c * pch, n_par - pch)
                blk = chunk_at(s, pch)
                return jax.lax.dynamic_update_slice_in_dim(out, blk, s, 2)

            return jax.lax.fori_loop(0, nchunks, body, out)

        def mk_level_u(JT, pr, st=None):
            """Level u-block operator + Chebyshev smoother.  st=None
            computes the per-Jacobian arrays (assembled ELL values or
            the raw Galerkin blocks, node-block diagonal inverse,
            power-iteration lmax) and returns them as the third value;
            st given rebuilds the closures from those arrays alone."""
            conn = pr["parent_conn"]
            n_nodes = pr["n_parent_nodes"]
            nde_u = npe * d
            from calibr8_tpu.solve.ellpack import LevelEllOperator

            if st is None:
                st = {}
                if _level_ell_enabled():
                    # assembled node-block ELL apply: ONE Pallas custom
                    # call per matvec.  The unrolled EBE form below
                    # compiles to ~150 fused element-length vector ops,
                    # and a V-cycle instantiates a level matvec at every
                    # smoother/residual site of every Krylov inline copy
                    # (~0.5 GB of TPU code per cycle at 1.5M elements —
                    # over the ~2 GB executable-load ceiling); it also
                    # pays the element scatter every apply.
                    st["A_T"] = LevelEllOperator(
                        JT, pr["ell_nbr"], pr["ell_ids"], pr["ell_K"],
                        n_nodes, d, offsets=pr.get("ell_offs"),
                    ).A_T
                    st["JT"] = None
                else:
                    st["A_T"] = None
                    st["JT"] = JT

                blocks = jnp.zeros((n_nodes, d, d), JT.dtype)
                for l in range(npe):
                    blk = jnp.stack(
                        [
                            jnp.stack(
                                [JT[l * d + q, l * d + r2] for r2 in range(d)],
                                0,
                            )
                            for q in range(d)
                        ],
                        0,
                    )  # (d, d, E)
                    blocks = blocks.at[conn[:, l]].add(
                        jnp.moveaxis(blk, -1, 0)
                    )
                dg = jnp.abs(
                    jnp.diagonal(blocks, axis1=1, axis2=2)
                )
                fix = (dg < 1e-30).astype(JT.dtype)
                blocks = blocks + fix[:, :, None] * jnp.eye(d, dtype=JT.dtype)
                st["Binv"] = gauss_solve(
                    blocks,
                    jnp.broadcast_to(
                        jnp.eye(d, dtype=JT.dtype), blocks.shape
                    ),
                    pivot=True,
                )

            if st["A_T"] is not None:
                op_l = LevelEllOperator.from_assembled(
                    st["A_T"], pr["ell_nbr"], pr["ell_K"], n_nodes, d,
                    offsets=pr.get("ell_offs"),
                )
                dtype_l = st["A_T"].dtype
            else:
                JT_l = st["JT"]
                dtype_l = JT_l.dtype

                def op_l(v):
                    V = v.reshape(n_nodes, d)
                    v_eT = V[conn].reshape(-1, nde_u).T
                    rows = []
                    for i in range(nde_u):
                        acc = JT_l[i, 0] * v_eT[0]
                        for j in range(1, nde_u):
                            acc = acc + JT_l[i, j] * v_eT[j]
                        rows.append(acc)
                    Y = jax.ops.segment_sum(
                        jnp.stack(rows, 0).T.reshape(-1, d),
                        conn.reshape(-1),
                        num_segments=n_nodes,
                    )
                    return Y.reshape(-1)

            Binv = st["Binv"]

            def dinv(r):
                return jnp.einsum(
                    "nij,nj->ni", Binv, r.reshape(n_nodes, d)
                ).reshape(-1)

            if "lmax" not in st:
                st["lmax"] = _mk_lmax(op_l, dinv, n_nodes * d, dtype_l)
            smooth = _mk_cheb(op_l, dinv, st["lmax"])
            return op_l, smooth, st

        # build the u chain: Galerkin down the pairs (level 0 through
        # the lazy masked accessor; deeper levels are 8x smaller per
        # step and slice their materialized parent blocks)
        L = len(self._pairs)
        nde_u = npe * d
        pr_last = self._pairs[-1]
        n_b = pr_last["n_parent_nodes"]
        conn_b = pr_last["parent_conn"]
        level_ops = []  # (op_l, smooth_l) for levels 1..L-1
        if state is not None:
            for l in range(L - 1):
                op_l, smooth_l, _ = mk_level_u(
                    None, self._pairs[l], st=state["u"][l]
                )
                level_ops.append((op_l, smooth_l))
            coarse_st = state["Xb"]
        else:
            jt_l = jt0
            jt_sl_l = fu["jt_mask_slice"]
            E_ch_l = disc.n_elem
            J_l = None
            u_states = []
            for l in range(L):
                pr = self._pairs[l]
                J_l = galerkin_u(jt_l, jt_sl_l, pr, E_ch_l)
                jt_l = lambda i, j, J=J_l: J[i, j]
                jt_sl_l = (
                    lambda i, j, s, c, J=J_l: jax.lax.dynamic_slice_in_dim(
                        J[i, j], s, c, 0
                    )
                )
                E_ch_l = pr["n_parent_elems"]
                if l < L - 1:
                    op_l, smooth_l, st_l = mk_level_u(J_l, pr)
                    level_ops.append((op_l, smooth_l))
                    u_states.append(st_l)

            # coarsest (base mesh): dense from the EBE blocks
            edofs_b = (
                conn_b[:, :, None] * d + jnp.arange(d)[None, None, :]
            ).reshape(-1, nde_u)
            flat = (
                edofs_b[:, :, None] * (n_b * d) + edofs_b[:, None, :]
            ).reshape(-1)
            A_b = jax.ops.segment_sum(
                jnp.moveaxis(J_l, -1, 0).reshape(-1),
                flat,
                num_segments=(n_b * d) * (n_b * d),
            ).reshape(n_b * d, n_b * d)
            dgb = jnp.diagonal(A_b)
            A_b = A_b + jnp.diag(
                jnp.where(jnp.abs(dgb) < 1e-12, 1.0, 0.0)
            )
            coarse_st = (
                None if "nocoarse" in _ablate else _coarse_dense_state(A_b)
            )
            if capture is not None:
                capture["u"] = u_states
                capture["Xb"] = coarse_st
        coarse_solve = (
            (lambda r: r) if coarse_st is None else _coarse_apply(coarse_st)
        )

        # fine-level Chebyshev (matches the level smoothers)
        Bu_inv = fu["Bu_inv"]

        def fine_dinv(r):
            return jnp.einsum(
                "nij,nj->ni", Bu_inv, r.reshape(disc.n_nodes, d)
            ).reshape(-1)

        if state is not None:
            lmax_f = state["lmax_f"]
        else:
            lmax_f = _mk_lmax(op_u, fine_dinv, disc.n_dofs_u, dtype)
            if capture is not None:
                capture["lmax_f"] = lmax_f
        fine_smooth = _mk_cheb(op_u, fine_dinv, lmax_f)

        def restrict_pair(pr, r):
            R = 0.5 * r.reshape(-1, d)
            out = jnp.zeros((pr["n_parent_nodes"], d), r.dtype)
            out = out.at[pr["pa"]].add(R).at[pr["pb"]].add(R)
            return out.reshape(-1)

        def prolong_pair(pr, ec):
            E = ec.reshape(-1, d)
            return (0.5 * (E[pr["pa"]] + E[pr["pb"]])).reshape(-1)

        def cycle(l, r):
            """l = 1..L over coarse levels (level l lives on
            self._pairs[l-1]'s parent mesh)."""
            if l == L:
                return coarse_solve(r)
            op_l, smooth_l = level_ops[l - 1]
            z = smooth_l(r)
            r2 = r - op_l(z)
            ec = cycle(l + 1, restrict_pair(self._pairs[l], r2))
            z = z + prolong_pair(self._pairs[l], ec)
            r3 = r - op_l(z)
            return z + smooth_l(r3)

        def vcycle(r):
            z = fine_smooth(r)
            r2 = (r - op_u(z)) * mask_u
            ec = cycle(1, restrict_pair(self._pairs[0], r2))
            z = z + prolong_pair(self._pairs[0], ec) * mask_u
            r3 = r - op_u(z)
            return z + fine_smooth(r3)

        if not spec.mixed:
            return mixed_wrap(disc, vcycle, fu, transpose=transpose)

        # ---- scalar pressure chain through the same transfers ---------
        pslots = np.array(
            [l * disc.ndpn + d for l in range(npe)], dtype=np.int64
        )
        n_u = disc.n_dofs_u
        if fu["trailing"]:
            J_pp = jnp.take(
                jnp.take(J_e, jnp.asarray(pslots), axis=0),
                jnp.asarray(pslots),
                axis=1,
            )[:, :, : disc.n_elem]
        else:
            J_pp = jnp.moveaxis(
                J_e[:, pslots, :][:, :, pslots], 0, -1
            )
        bc_mask = jnp.zeros(disc.n_dofs, bool).at[bc_dofs].set(True)
        bc_p = bc_mask[n_u:]
        diag_p = diag[n_u:]
        mask_p = jnp.where(bc_p, 0.0, 1.0).astype(dtype)
        m_peT = mask_p[disc.conn].T

        def jp0(l_, m_):
            # lazy masked p-block slice (same rationale as jt_mask)
            return J_pp[l_, m_] * m_peT[l_] * m_peT[m_]

        def galerkin_p(jp, pr):
            """Scalar analog of galerkin_u (same unrolled FMA form,
            lazy slice accessor jp(l, m) -> (E_c,))."""
            P = pr["P_nT"]
            red = _reduce_child(pr)
            H = [[None] * npe for _ in range(npe)]
            for l in range(npe):
                for dd in range(npe):
                    acc = jp(l, 0) * P[0, dd]
                    for m in range(1, npe):
                        acc = acc + jp(l, m) * P[m, dd]
                    H[l][dd] = acc
            rows = []
            for c in range(npe):
                cols = []
                for dd in range(npe):
                    acc = P[0, c] * H[0][dd]
                    for l in range(1, npe):
                        acc = acc + P[l, c] * H[l][dd]
                    cols.append(red(acc))
                rows.append(jnp.stack(cols, 0))
            return jnp.stack(rows, 0)

        def mk_level_p(JT, pr, st=None):
            """Scalar analog of mk_level_u (same state discipline)."""
            conn = pr["parent_conn"]
            n_nodes = pr["n_parent_nodes"]
            from calibr8_tpu.solve.ellpack import LevelEllOperator

            if st is None:
                st = {}
                if _level_ell_enabled():
                    # same node-pair maps as the u chain, scalar blocks
                    st["A_T"] = LevelEllOperator(
                        JT, pr["ell_nbr"], pr["ell_ids"], pr["ell_K"],
                        n_nodes, 1, offsets=pr.get("ell_offs"),
                    ).A_T
                    st["JT"] = None
                else:
                    st["A_T"] = None
                    st["JT"] = JT
                dgv = jnp.zeros(n_nodes, JT.dtype)
                for l in range(npe):
                    dgv = dgv.at[conn[:, l]].add(JT[l, l])
                st["dgv"] = jnp.where(jnp.abs(dgv) > 1e-30, dgv, 1.0)

            if st["A_T"] is not None:
                op_l = LevelEllOperator.from_assembled(
                    st["A_T"], pr["ell_nbr"], pr["ell_K"], n_nodes, 1,
                    offsets=pr.get("ell_offs"),
                )
                dtype_l = st["A_T"].dtype
            else:
                JT_l = st["JT"]
                dtype_l = JT_l.dtype

                def op_l(v):
                    V = v[conn].T  # (npe, E)
                    rows = []
                    for i in range(npe):
                        acc = JT_l[i, 0] * V[0]
                        for j in range(1, npe):
                            acc = acc + JT_l[i, j] * V[j]
                        rows.append(acc)
                    return jax.ops.segment_sum(
                        jnp.stack(rows, 0).T.reshape(-1),
                        conn.reshape(-1),
                        num_segments=n_nodes,
                    )

            dgv = st["dgv"]

            def dinv(r):
                return r / dgv

            if "lmax" not in st:
                st["lmax"] = _mk_lmax(op_l, dinv, n_nodes, dtype_l)
            smooth = _mk_cheb(op_l, dinv, st["lmax"])
            return op_l, smooth, st

        p_level_ops = []
        if state is not None:
            for l in range(L - 1):
                op_l, smooth_l, _ = mk_level_p(
                    None, self._pairs[l], st=state["p"][l]
                )
                p_level_ops.append((op_l, smooth_l))
            p_coarse_st = state["Xbp"]
        else:
            jp_l = jp0
            Jp_l = None
            p_states = []
            for l in range(L):
                pr = self._pairs[l]
                Jp_l = galerkin_p(jp_l, pr)
                jp_l = lambda i, j, J=Jp_l: J[i, j]
                if l < L - 1:
                    op_l, smooth_l, st_l = mk_level_p(Jp_l, pr)
                    p_level_ops.append((op_l, smooth_l))
                    p_states.append(st_l)
            flat_p = (
                conn_b[:, :, None] * n_b + conn_b[:, None, :]
            ).reshape(-1)
            A_bp = jax.ops.segment_sum(
                jnp.moveaxis(Jp_l, -1, 0).reshape(-1),
                flat_p,
                num_segments=n_b * n_b,
            ).reshape(n_b, n_b)
            dgp = jnp.diagonal(A_bp)
            A_bp = A_bp + jnp.diag(
                jnp.where(jnp.abs(dgp) < 1e-12, 1.0, 0.0)
            )
            p_coarse_st = (
                None if "nocoarse" in _ablate else _coarse_dense_state(A_bp)
            )
            if capture is not None:
                capture["p"] = p_states
                capture["Xbp"] = p_coarse_st
        p_coarse_solve = (
            (lambda r: r)
            if p_coarse_st is None
            else _coarse_apply(p_coarse_st)
        )

        conn = disc.conn

        if _level_ell_enabled():
            # fine-level scalar p apply through the assembled ELL
            # (reuses the Disc's node-pair maps, hoisted via
            # Disc.bind): the unrolled EBE form below is npe^2 fused
            # element-length ops over the FINEST mesh, instantiated at
            # each of the p cycle's smoother/residual sites
            from calibr8_tpu.solve.ellpack import (
                LevelEllOperator, build_ell_maps,
            )

            maps_f = build_ell_maps(disc)
            if state is not None:
                p_ell = LevelEllOperator.from_assembled(
                    state["p_ell_A_T"], maps_f["nbr"], maps_f["K"],
                    disc.n_nodes, 1, offsets=maps_f.get("offsets"),
                )
            else:
                p_ell = LevelEllOperator(
                    J_pp, maps_f["nbr"], maps_f["ell_ids_T"], maps_f["K"],
                    disc.n_nodes, 1, offsets=maps_f.get("offsets"),
                )
                if capture is not None:
                    capture["p_ell_A_T"] = p_ell.A_T

            def op_p(v):
                return jnp.where(bc_p, diag_p * v, p_ell(v))

        else:

            def op_p(v):
                V = v[conn].T
                rows = []
                for i in range(npe):
                    acc = J_pp[i, 0] * V[0]
                    for j in range(1, npe):
                        acc = acc + J_pp[i, j] * V[j]
                    rows.append(acc)
                out = disc.scatter_rows(
                    jnp.stack(rows, 0).T.reshape(-1, 1)
                ).reshape(-1)
                return jnp.where(bc_p, diag_p * v, out)

        app = jnp.where(jnp.abs(diag_p) > 1e-300, diag_p, 1.0)

        def p_fine_dinv(r):
            return r / app

        if state is not None:
            lmax_p = state["lmax_p"]
        else:
            lmax_p = _mk_lmax(op_p, p_fine_dinv, disc.n_dofs - n_u, dtype)
            if capture is not None:
                capture["lmax_p"] = lmax_p
        p_fine_smooth = _mk_cheb(op_p, p_fine_dinv, lmax_p)

        def p_restrict_pair(pr, r):
            out = jnp.zeros(pr["n_parent_nodes"], r.dtype)
            return out.at[pr["pa"]].add(0.5 * r).at[pr["pb"]].add(0.5 * r)

        def p_prolong_pair(pr, ec):
            return 0.5 * (ec[pr["pa"]] + ec[pr["pb"]])

        def p_cycle(l, r):
            if l == L:
                return p_coarse_solve(r)
            op_l, smooth_l = p_level_ops[l - 1]
            z = smooth_l(r)
            r2 = r - op_l(z)
            ec = p_cycle(l + 1, p_restrict_pair(self._pairs[l], r2))
            z = z + p_prolong_pair(self._pairs[l], ec)
            r3 = r - op_l(z)
            return z + smooth_l(r3)

        def p_vcycle(r):
            z = p_fine_smooth(r)
            r2 = (r - op_p(z)) * mask_p
            ec = p_cycle(1, p_restrict_pair(self._pairs[0], r2))
            z = z + p_prolong_pair(self._pairs[0], ec) * mask_p
            r3 = r - op_p(z)
            return z + p_fine_smooth(r3)

        if "nop" in _ablate:
            p_vcycle = p_fine_dinv

        # block GS over (u, p) with exact coupling (solve/amg.py M)
        n_p = disc.n_dofs - n_u
        if op is not None:
            op_full = op
        else:
            from calibr8_tpu.fem.assembly import ebe_matvec_disc
            from calibr8_tpu.fem.bcs import apply_dbcs_matvec

            def op_full(v):
                out = ebe_matvec_disc(J_e, disc, v)
                return apply_dbcs_matvec(out, diag, v, bc_dofs)

        if transpose:

            def M(r):
                # mirrored sweep for transposed (adjoint) operators:
                # p first, u corrected through the full coupling
                z_p = p_vcycle(r[n_u:])
                z = jnp.concatenate([jnp.zeros(n_u, z_p.dtype), z_p])
                r_u = (r - op_full(z))[:n_u]
                z_u = vcycle(r_u)
                return jnp.concatenate([z_u, z_p])

        else:

            def M(r):
                z_u = vcycle(r[:n_u])
                z = jnp.concatenate([z_u, jnp.zeros(n_p, z_u.dtype)])
                r_p = (r - op_full(z))[n_u:]
                z_p = p_vcycle(r_p)
                return jnp.concatenate([z_u, z_p])

        return M

    # -- grid transfer (u block) ------------------------------------------
    def prolong_u(self, xc, mask_u):
        """Coarse u vector (n_cu,) -> fine u vector (n_dofs_u,)."""
        Xc = xc.reshape(self.n_c, self.d)
        Xf = jnp.einsum("fk,fkc->fc", self.parents_w, Xc[self.parents_idx])
        return Xf.reshape(-1) * mask_u

    def restrict_u(self, rf, mask_u):
        Rf = (rf * mask_u).reshape(self.disc.n_nodes, self.d)
        Rc = jnp.zeros((self.n_c, self.d), Rf.dtype)
        for k in range(self.K):
            Rc = Rc.at[self.parents_idx[:, k]].add(
                self.parents_w[:, k, None] * Rf
            )
        return Rc.reshape(-1)

    # -- per-Jacobian construction ----------------------------------------
    def make_state(self, J_e, diag, bc_dofs, op=None, transpose=False):
        """Heavy per-Jacobian arrays of the recursive cycle as a
        pytree: level Galerkin products (assembled node-block ELL
        values), node-block diagonal inverses, Chebyshev spectral
        bounds, and the Newton-Schulz coarse inverses.  Build this in
        its OWN jit program, then pass it to make(state=...) inside
        the Krylov program — the preconditioner-lag / executable-size
        split (the reference's MueLu reuse knobs,
        linear_solve.cpp:36-123).  Returns None for the non-recursive
        2-level factory (its make() is cheap: one Galerkin pass)."""
        if not self.recursive:
            return None
        cap = {}
        self._make_recursive(
            J_e, diag, bc_dofs, op, transpose=transpose, capture=cap
        )
        return cap

    def make(self, J_e, diag, bc_dofs, op=None, transpose=False,
             state=None):
        """Build the preconditioner callable for one assembled state.

        J_e: element Jacobians, elem-first (n_e, nde, nde) or trailing
        (nde, nde, E_pad).  `op` (the full assembled matvec) is used,
        when given, as the fine-level u-block apply.  `state` (from
        make_state) short-circuits the heavy per-Jacobian computation
        — the returned M then rebuilds its closures from those arrays
        alone (recursive chain only)."""
        if self.recursive:
            return self._make_recursive(
                J_e, diag, bc_dofs, op, transpose=transpose, state=state
            )
        disc = self.disc
        d = self.d
        n_u = disc.n_dofs_u
        fu = fine_u_setup(
            disc, J_e, diag, bc_dofs, op, self.uslots, self.omega
        )
        trailing = fu["trailing"]
        J_uuT = fu["J_uuT"]
        J_uu = fu["J_uu"]
        op_u = fu["op_u"]
        smooth = fu["smooth"]
        dtype = fu["dtype"]
        mask_u = fu["mask_u"]
        m_eT = fu["m_eT"]

        # coarse Galerkin operator of the (Dirichlet-masked) u block,
        # assembled in TRAILING layout: every (a, b) intermediate is
        # (nde_u, nde_u, n_e) / 1-D — lane-aligned, no tile-padding
        # blowup (the elem-first form OOM'd HBM at 196k elements)
        wgtT = jnp.moveaxis(self.wgt, 0, -1)  # (nde_u, K, n_e)
        W_T = wgtT * m_eT[:, None, :]  # (nde_u, K, n_e)
        cdT = jnp.moveaxis(self.cd, 0, -1).astype(jnp.int32)  # (nde_u, K, n_e)
        n_cu = self.n_cu
        nde_u = len(self.uslots)
        if trailing:
            JT = J_uuT
        else:
            JT = jnp.moveaxis(J_uu, 0, -1)

        if self._coarse_maps is not None:
            # coarse-element-block form: one row-wise segment_sum of
            # per-element local products P_e^T J_e P_e
            cm = self._coarse_maps
            WmT = cm["P_locT"] * m_eT[:, None, :]  # (i, c, E)
            T1 = jnp.einsum("ice,ije->cje", WmT, JT)
            A_eT = jnp.einsum("cje,jde->cde", T1, WmT)  # (c, d, E)
            A_blocks = jax.ops.segment_sum(
                A_eT.reshape(nde_u * nde_u, -1).T,
                cm["base_parent"],
                num_segments=cm["n_ce"],
            )  # (n_ce, nde_u^2)
            flat = (
                cm["cdofs"][:, :, None] * n_cu + cm["cdofs"][:, None, :]
            )
            A_c = jax.ops.segment_sum(
                A_blocks.reshape(-1),
                flat.reshape(-1),
                num_segments=n_cu * n_cu,
            ).reshape(n_cu, n_cu)
        else:
            A_c = jnp.zeros(n_cu * n_cu, dtype)
            for a in range(self.K):
                for b in range(self.K):
                    contrib = (
                        W_T[:, None, a, :] * JT * W_T[None, :, b, :]
                    )  # (nde_u, nde_u, n_e)
                    flat = (
                        cdT[:, None, a, :] * n_cu + cdT[None, :, b, :]
                    )
                    A_c = A_c + jax.ops.segment_sum(
                        contrib.reshape(-1),
                        flat.reshape(-1),
                        num_segments=n_cu * n_cu,
                    )
            A_c = A_c.reshape(n_cu, n_cu)
        dg = jnp.diagonal(A_c)
        # regularize empty rows (coarse dofs fully under Dirichlet masks)
        A_c = A_c + jnp.diag(jnp.where(jnp.abs(dg) < 1e-12, 1.0, 0.0))
        coarse_solve = _coarse_dense_solver(A_c)

        def vcycle(r):
            z = smooth(r)
            r2 = r - op_u(z)
            ec = coarse_solve(self.restrict_u(r2, mask_u))
            z = z + self.prolong_u(ec, mask_u)
            r3 = r - op_u(z)
            return z + smooth(r3)

        return mixed_wrap(disc, vcycle, fu, transpose=transpose)

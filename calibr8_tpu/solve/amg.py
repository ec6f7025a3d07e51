"""Aggregation-based algebraic multigrid for unstructured meshes.

The reference preconditions each Teko block with MueLu AMG **with a
node-coordinates nullspace**, which works on ANY mesh (reference:
source/calibr8/src/linear_solve.cpp:36-123).  The geometric multigrid
(solve/mg.py) needs a uniform-refinement chain, so every imported
`.smb` mesh — i.e. every real calibration workload — previously fell
back to one-level block Gauss-Seidel with h-dependent Krylov counts.
This module supplies the missing AMG-class hierarchy from the element
connectivity + node coordinates alone.

Design (TPU-first):

  * setup (host, once per mesh): greedy graph aggregation of the node
    graph (the plain-aggregation pass-1/pass-2 of Vanek et al.),
    repeated level by level until the coarsest u-space is small enough
    for a dense direct solve;
  * transfers: RIGID-BODY-MODE tentative prolongator.  Every aggregate
    carries m = d(d+1)/2 coarse dofs (d translations + the rotations,
    scaled by the aggregate radius for conditioning); a fine node's
    interpolation block B_i is the rigid-body basis evaluated at its
    position relative to the aggregate centroid, and coarser transfers
    T_i are the exact rigid-motion transport between centroids.  This
    is the elasticity nullspace MueLu injects — plain piecewise-constant
    aggregation loses h-independence because it cannot represent
    rotations (measured: counts grew 42 -> 59 -> ~100 over two
    refinements without it);
  * Galerkin coarse operators: level 1 assembles from the Dirichlet-
    masked u-block ELEMENT Jacobians with one einsum (B^T J B per node
    pair) + ONE segment_sum into a precomputed node-block ELL structure
    (all index maps static, built host-side); level l+1 re-aggregates
    level l's ELL blocks (T^T A T) with one more einsum + segment_sum.
    No sparse matrix products on device;
  * smoothing: Chebyshev polynomial on D^-1 A (node-block diagonal),
    pre+post per level — the Ifpack2 smoother family;
  * coarsest solve: dense (LU on CPU, Newton-Schulz inverse on TPU —
    see solve/mg.py._coarse_dense_solver);
  * the cycle is a FIXED linear operator, valid for plain GMRES.

The u/p mixed wrap and the fine-level smoother/matvec are shared with
the geometric factory (solve/mg.py fine_u_setup / mixed_wrap).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.solve.mg import (
    _coarse_dense_solver,
    fine_u_setup,
    mixed_wrap,
)
from calibr8_tpu.utils.smallsolve import gauss_solve


# ---------------------------------------------------------------------
# host-side graph setup
# ---------------------------------------------------------------------


def node_graph(conn, n_nodes):
    """Undirected node adjacency (no self loops) as CSR (cols, ptr)."""
    npe = conn.shape[1]
    pairs = []
    for a in range(npe):
        for b in range(npe):
            if a != b:
                pairs.append(
                    conn[:, a].astype(np.int64) * n_nodes + conn[:, b]
                )
    key = np.unique(np.concatenate(pairs))
    rows = key // n_nodes
    cols = (key % n_nodes).astype(np.int32)
    ptr = np.searchsorted(rows, np.arange(n_nodes + 1))
    return cols, ptr


def aggregate(cols, ptr, n):
    """Greedy plain aggregation (Vanek pass 1 + pass 2) with BFS seed
    ordering and a size cap.

    Pass 1 forms root aggregates {i} + nbrs(i) over nodes whose whole
    neighborhood is unaggregated, visiting nodes in BFS order so roots
    pack tightly; pass 2 attaches leftovers to the SMALLEST neighboring
    aggregate under a size cap (insertion-order pass 2 on refined-mesh
    numbering otherwise produces 15-node megaclusters whose piecewise-
    rigid interpolation loses h-independence — measured 46 -> 149
    iterations over two refinements).  Returns (agg (n,), n_agg)."""
    from collections import deque

    agg = np.full(n, -1, dtype=np.int64)
    deg = np.diff(ptr)
    max_size = max(int(1.5 * (deg.mean() + 1.0)), 4)

    # BFS order over all components
    order = np.empty(n, dtype=np.int64)
    seen = np.zeros(n, dtype=bool)
    pos = 0
    for s in range(n):
        if seen[s]:
            continue
        seen[s] = True
        q = deque([s])
        while q:
            i = q.popleft()
            order[pos] = i
            pos += 1
            for j in cols[ptr[i] : ptr[i + 1]]:
                if not seen[j]:
                    seen[j] = True
                    q.append(j)

    sizes = []
    n_agg = 0
    for i in order:
        if agg[i] != -1:
            continue
        nb = cols[ptr[i] : ptr[i + 1]]
        if np.all(agg[nb] == -1):
            agg[i] = n_agg
            agg[nb] = n_agg
            sizes.append(1 + len(nb))
            n_agg += 1
    sizes = list(sizes)
    for i in order:
        if agg[i] != -1:
            continue
        cand = np.unique(agg[cols[ptr[i] : ptr[i + 1]]])
        cand = cand[cand >= 0]
        if cand.size:
            csz = np.array([sizes[c] for c in cand])
            under = cand[csz < max_size]
            pick = (
                under[np.argmin(csz[csz < max_size])]
                if under.size
                else cand[np.argmin(csz)]
            )
            agg[i] = pick
            sizes[pick] += 1
        else:  # isolated node
            agg[i] = n_agg
            sizes.append(1)
            n_agg += 1
    return agg, n_agg


def _ell_structure(keys, n_rows):
    """Sorted unique (row*n_rows + col) keys -> padded ELL structure.

    Returns (nbr (n_rows, K) int32 with pad = n_rows, slot_of_key:
    flat ELL slot (row*K + slot) for each unique key, K)."""
    rows = keys // n_rows
    row_start = np.searchsorted(rows, np.arange(n_rows))
    slot = np.arange(len(keys)) - row_start[rows]
    K = int(slot.max()) + 1 if len(keys) else 1
    nbr = np.full((n_rows, K), n_rows, dtype=np.int32)
    nbr[rows, slot] = (keys % n_rows).astype(np.int32)
    return nbr, (rows * K + slot).astype(np.int64), K


def _centroids_scales(agg, n_agg, pos):
    """Aggregate centroids and RMS radii (the rotation-mode scaling)."""
    cnt = np.bincount(agg, minlength=n_agg).astype(np.float64)
    cent = np.zeros((n_agg, pos.shape[1]))
    for q in range(pos.shape[1]):
        cent[:, q] = np.bincount(agg, weights=pos[:, q], minlength=n_agg)
    cent /= cnt[:, None]
    r2 = np.bincount(
        agg,
        weights=np.sum((pos - cent[agg]) ** 2, axis=1),
        minlength=n_agg,
    ) / cnt
    scale = np.sqrt(np.maximum(r2, 0.0))
    scale = np.where(scale > 1e-12, scale, 1.0)
    return cent, scale


def _rigid_modes(rel, scale, d):
    """Rigid-body basis B (n, d, m) at offsets `rel` (n, d) from the
    aggregate centroid, rotations scaled by 1/scale (n,)."""
    n = rel.shape[0]
    m = d * (d + 1) // 2
    B = np.zeros((n, d, m))
    for q in range(d):
        B[:, q, q] = 1.0
    if d == 2:
        B[:, 0, 2] = -rel[:, 1] / scale
        B[:, 1, 2] = rel[:, 0] / scale
    else:
        # rotations about x, y, z: theta x r
        x, y, z = rel[:, 0], rel[:, 1], rel[:, 2]
        B[:, 1, 3] = -z / scale
        B[:, 2, 3] = y / scale
        B[:, 0, 4] = z / scale
        B[:, 2, 4] = -x / scale
        B[:, 0, 5] = -y / scale
        B[:, 1, 5] = x / scale
    return B


def _rigid_transforms(rel, s_child, S_parent, d):
    """Rigid-motion transport T (n, m, m): parent aggregate dofs
    (translations, rotations scaled by S_parent) -> child dofs at
    centroid offset `rel`, rotations scaled by s_child.

    theta = rho_parent / S; child translation += theta x rel;
    child rotation dofs = theta * s_child."""
    n = rel.shape[0]
    m = d * (d + 1) // 2
    T = np.zeros((n, m, m))
    for q in range(m):
        T[:, q, q] = 1.0
    if d == 2:
        T[:, 0, 2] = -rel[:, 1] / S_parent
        T[:, 1, 2] = rel[:, 0] / S_parent
        T[:, 2, 2] = s_child / S_parent
    else:
        x, y, z = rel[:, 0], rel[:, 1], rel[:, 2]
        T[:, 1, 3] = -z / S_parent
        T[:, 2, 3] = y / S_parent
        T[:, 0, 4] = z / S_parent
        T[:, 2, 4] = -x / S_parent
        T[:, 0, 5] = -y / S_parent
        T[:, 1, 5] = x / S_parent
        for q in range(3):
            T[:, 3 + q, 3 + q] = s_child / S_parent
    return T


# ---------------------------------------------------------------------
# smoothers
# ---------------------------------------------------------------------


def _dyn_bound(n, anchor):
    """Loop bound `n` made data-dependent (anchor must be a traced
    array): XLA:TPU UNROLLS while loops with provably-constant trip
    counts, so a constant-bound fori_loop instantiates its body's
    matvec trip-count times PER CALL SITE — measured ~0.5 GB of
    generated code from the Chebyshev smoothers alone in one V-cycle
    apply at 1.5M elements, against the chip's ~2 GB executable-load
    ceiling (scripts/ablate_code_size.py 'cycle' probe)."""
    z = jax.lax.stop_gradient(anchor).reshape(-1)[0]
    return n + (z * 0).astype(jnp.int32)


def _power_lmax(matvec, dinv_apply, n, dtype, iters: int = 10):
    """Largest eigenvalue estimate of D^-1 A by power iteration from a
    deterministic pseudo-random start (jit-safe, no RNG state)."""
    v = jnp.sin(jnp.arange(n, dtype=dtype) * 12.9898 + 0.5)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = dinv_apply(matvec(v))
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    # anchor the bound on the operator output so the loop cannot be
    # unrolled (the matvec body is the code-size cost, see _dyn_bound)
    v0 = body(0, v)
    v = jax.lax.fori_loop(1, _dyn_bound(iters, v0), body, v0)
    w = dinv_apply(matvec(v))
    return jnp.maximum(jnp.linalg.norm(w), 1e-12)


def _chebyshev(matvec, dinv_apply, lmax, degree: int, ratio: float):
    """Chebyshev polynomial smoother on [lmax/ratio, 1.1*lmax] of
    D^-1 A (the Ifpack2 recurrence — the reference's AMG smoother
    family, linear_solve.cpp Ifpack2 relaxation)."""
    beta = 1.1 * lmax
    alpha = lmax / ratio
    theta = 0.5 * (beta + alpha)
    delta = 0.5 * (beta - alpha)
    sigma = theta / delta

    def smooth(b):
        x = dinv_apply(b) / theta
        r = b - matvec(x)
        rho0 = jnp.asarray(1.0 / sigma, x.dtype)

        # fori_loop, NOT a Python unroll: the unrolled recurrence
        # instantiates `matvec` degree-1 times PER SMOOTHER SITE — with
        # 2 sites/level over a 4-level recursive cycle that multiplied
        # the level-op code ~12x (the 1M-DOF scale step carries 3.5 GB
        # of generated code next to 16 GB HBM)
        def body(_, c):
            x, r, d, rho = c
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * dinv_apply(r)
            x = x + d
            r = r - matvec(d)
            return (x, r, d, rho_new)

        # data-dependent bound: a constant bound lets XLA:TPU unroll
        # the loop, instantiating `matvec` degree-1 times per smoother
        # SITE (~0.5 GB of code across one V-cycle at 1.5M elements,
        # against the ~2 GB executable-load ceiling; see _dyn_bound)
        x, _, _, _ = jax.lax.fori_loop(
            0, _dyn_bound(degree - 1, lmax), body, (x, r, x, rho0)
        )
        return x

    return smooth


class _Level:
    """Static (host-built) data for one coarse level.

    Interpolation blocks are stored twice: `P` as HOST numpy in the
    natural (n_prev, bs_prev, m) order (setup-time consumers — the
    dist wrapper gathers per-part slices from it host-side), and `PT`
    as the DEVICE array in TRAILING layout (bs_prev, m, n_prev).  The
    trailing copy is the only one touched under jit: a device-resident
    (n_prev, 3, 6) batch-first array tile-pads to (n_prev, 8, 128) —
    44-68x HBM waste on exactly the arrays every cycle reads (the
    CLAUDE.md TPU layout rule)."""

    __slots__ = (
        "n", "K", "agg_prev", "nbr", "emap", "diag_slot", "n_prev",
        "P", "PT",
    )

    def __init__(self, n, K, agg_prev, nbr, emap, diag_slot, n_prev, P,
                 dtype):
        self.n = n  # aggregates (block-rows) at this level
        self.K = K  # ELL width
        self.agg_prev = agg_prev  # (n_prev,) aggregate of each finer node
        self.nbr = nbr  # (n, K) int32 neighbor ids, pad = n
        self.emap = emap  # flat targets for the Galerkin segment_sum
        self.diag_slot = diag_slot  # (n,) flat slot of the diagonal block
        self.n_prev = n_prev
        self.P = np.asarray(P)  # host (n_prev, bs_prev, m)
        self.PT = jnp.asarray(np.moveaxis(self.P, 0, -1), dtype)


class AMGPrecondFactory:
    """Multilevel aggregation AMG with the same make() interface as the
    geometric MGPrecondFactory — usable on any mesh, no refinement
    chain required (deck: `linear algebra: {preconditioner: multigrid}`
    on an imported-mesh problem routes here, problem.py)."""

    def __init__(
        self,
        disc,
        coarse_cutoff: int = 6000,
        max_levels: int = 6,
        omega: float = 0.7,
        overcorr: float = 1.0,
        smoother: str = "chebyshev",
        cheb_degree: int = 6,
        cheb_ratio: float = 12.0,
        gamma: int = 2,
    ):
        self.disc = disc
        spec = disc.spec
        d = spec.dim
        self.d = d
        self.m = d * (d + 1) // 2
        m = self.m
        self.omega = omega
        self.overcorr = overcorr
        self.smoother = smoother
        self.cheb_degree = cheb_degree
        self.cheb_ratio = cheb_ratio
        self.gamma = gamma  # 1 = V-cycle, 2 = W-cycle
        npe = spec.npe
        ndpn = spec.ndofs_per_node
        self.uslots = np.array(
            [l * ndpn + q for l in range(npe) for q in range(d)],
            dtype=np.int64,
        )
        self.pslots = (
            np.array([l * ndpn + d for l in range(npe)], dtype=np.int64)
            if spec.mixed
            else None
        )

        conn = np.asarray(disc.conn)
        n_nodes = disc.n_nodes
        coords = np.asarray(disc.coords, dtype=np.float64)
        cols, ptr = node_graph(conn, n_nodes)

        # ---- level 1: aggregate the node graph; element -> ELL map ----
        agg1, n1 = aggregate(cols, ptr, n_nodes)
        cent, scale = _centroids_scales(agg1, n1, coords)
        B = _rigid_modes(coords - cent[agg1], scale[agg1], d)
        cN = agg1[conn]  # (n_e, npe) coarse id per element node
        key = (cN[:, :, None] * n1 + cN[:, None, :]).reshape(-1)
        uniq, inv = np.unique(key, return_inverse=True)
        nbr1, slot_of, K1 = _ell_structure(uniq, n1)
        emap1 = slot_of[inv].astype(np.int64)  # (n_e*npe*npe,)
        diag1 = slot_of[
            np.searchsorted(uniq, np.arange(n1) * n1 + np.arange(n1))
        ]
        levels = [
            _Level(
                n1,
                K1,
                jnp.asarray(agg1, jnp.int32),
                jnp.asarray(nbr1),
                jnp.asarray(emap1.astype(np.int32)),
                jnp.asarray(diag1.astype(np.int32)),
                n_nodes,
                B,
                disc.dtype,
            )
        ]

        # ---- levels 2..L: re-aggregate the previous ELL graph ---------
        nbr_prev, n_prev = nbr1, n1
        cent_prev, scale_prev = cent, scale
        while n_prev * m > coarse_cutoff and len(levels) < max_levels:
            # CSR of the previous level graph (drop pads and self)
            Kp = nbr_prev.shape[1]
            i_prev = np.repeat(np.arange(n_prev), Kp)
            j_prev = nbr_prev.reshape(-1).astype(np.int64)
            valid = (j_prev < n_prev) & (j_prev != i_prev)
            gi, gj = i_prev[valid], j_prev[valid]
            gptr = np.searchsorted(gi, np.arange(n_prev + 1))
            agg, n_c = aggregate(gj.astype(np.int32), gptr, n_prev)
            if n_c >= n_prev:  # no coarsening possible
                break
            cent_c, scale_c = _centroids_scales(agg, n_c, cent_prev)
            T = _rigid_transforms(
                cent_prev - cent_c[agg], scale_prev, scale_c[agg], d
            )
            # Galerkin map: previous ELL entry (i, k) -> coarse slot
            ok = j_prev < n_prev
            keys = np.where(
                ok, agg[np.where(ok, j_prev, 0)] + agg[i_prev] * n_c, -1
            )
            uniq = np.unique(keys[ok])
            nbr_c, slot_of, Kc = _ell_structure(uniq, n_c)
            emap = np.full(n_prev * Kp, n_c * Kc, dtype=np.int64)  # dummy
            emap[ok] = slot_of[np.searchsorted(uniq, keys[ok])]
            diag_c = slot_of[
                np.searchsorted(uniq, np.arange(n_c) * n_c + np.arange(n_c))
            ]
            levels.append(
                _Level(
                    n_c,
                    Kc,
                    jnp.asarray(agg, jnp.int32),
                    jnp.asarray(nbr_c),
                    jnp.asarray(emap.astype(np.int32)),
                    jnp.asarray(diag_c.astype(np.int32)),
                    n_prev,
                    T,
                    disc.dtype,
                )
            )
            nbr_prev, n_prev = nbr_c, n_c
            cent_prev, scale_prev = cent_c, scale_c

        self.levels = levels
        self.level_sizes = [n_nodes] + [lv.n for lv in levels]

    # ------------------------------------------------------------------
    @staticmethod
    def _ell_matvec(A_T, nbr, v, n, bs):
        """Block-ELL matvec in TRAILING layout: A_T (bs, bs, n*K),
        nbr (n, K) with pad = n.  Unrolled lane FMAs over the flat
        entry axis + a static reshape-reduce over the K slots — no
        (n, K, bs, bs) batch-first operand ever materializes (that
        layout tile-pads the (6, 6) minor dims 44x on TPU)."""
        K = nbr.shape[1]
        XT = v.reshape(n, bs).T  # (bs, n)
        XpT = jnp.concatenate(
            [XT, jnp.zeros((bs, 1), XT.dtype)], axis=1
        )
        Xg = XpT[:, nbr.reshape(-1)]  # (bs, n*K)
        outs = []
        for i in range(bs):
            acc = A_T[i, 0] * Xg[0]
            for j in range(1, bs):
                acc = acc + A_T[i, j] * Xg[j]
            outs.append(acc.reshape(n, K).sum(axis=-1))
        return jnp.stack(outs, axis=-1).reshape(-1)

    @staticmethod
    def _t_block_apply(M_T, v, n, bs):
        """Block-diagonal apply in trailing layout: M_T (bs, bs, n)."""
        RT = v.reshape(n, bs).T
        outs = []
        for i in range(bs):
            acc = M_T[i, 0] * RT[0]
            for j in range(1, bs):
                acc = acc + M_T[i, j] * RT[j]
            outs.append(acc)
        return jnp.stack(outs, axis=-1).reshape(-1)

    def _t_diag_inv(self, A_T, lv, dtype):
        """Trailing (m, m, n) inverse of the diagonal blocks.  The
        batched Gauss solve itself runs batch-first on a TRANSIENT
        (n, m, m) copy (setup-time only, once per Newton step); the
        persistent result is stored trailing."""
        m = self.m
        eye = jnp.eye(m, dtype=dtype)
        Db = jnp.moveaxis(A_T[:, :, lv.diag_slot], -1, 0)  # (n, m, m)
        # aggregates with dead modes (all-Dirichlet, or a zero
        # rotation column) get identity rows so the block solve
        # stays finite; their residual components are zero there
        dgb = jnp.abs(jnp.diagonal(Db, axis1=1, axis2=2))
        fix = (dgb < 1e-30).astype(dtype)
        Db = Db + fix[:, :, None] * eye[None]
        Dinv = gauss_solve(
            Db, jnp.broadcast_to(eye, Db.shape), pivot=True
        )
        return jnp.moveaxis(Dinv, 0, -1)  # (m, m, n)

    def _u_chain(self, A1_T, dtype):
        """Levels >= 1 of the u-block hierarchy from the replicated
        level-1 Galerkin ELL blocks in TRAILING layout A1_T
        (m, m, n1*K1): coarser Galerkin products, per-level Chebyshev
        smoothers, dense coarsest solve.  Returns cycle(0, r1) — the
        V/W-cycle entered at level 1.  Shared by the single-device
        make() and the dist preconditioner (parallel/dist_mg.py),
        where the level-1 blocks arrive via a psum."""
        m = self.m
        omega = self.omega
        kappa = self.overcorr
        gamma = self.gamma
        levels = self.levels
        A_T = A1_T
        ops = []  # per coarse level: (A_T, nbr, Dinv_T, n)
        for li, lv in enumerate(self.levels):
            if li > 0:
                # T^T A T per previous-level ELL entry: unrolled
                # trailing FMAs + ONE (N, m*m) segment_sum
                n_p, K_p = lv.n_prev, self.levels[li - 1].K
                PT = lv.PT  # (m, m, n_p)
                j = self.levels[li - 1].nbr.reshape(-1)
                jc = jnp.where(j < n_p, j, 0)
                # row transform Ti / column transform Tj per flat entry
                Ti = [
                    [jnp.repeat(PT[i, mm], K_p) for mm in range(m)]
                    for i in range(m)
                ]
                Tj = [
                    [PT[i, mm][jc] for mm in range(m)]
                    for i in range(m)
                ]
                # H[j][mm] = sum_i Ti[i][mm] * A_T[i, j]
                H = [
                    [None] * m for _ in range(m)
                ]
                for jj in range(m):
                    for mm in range(m):
                        acc = Ti[0][mm] * A_T[0, jj]
                        for i in range(1, m):
                            acc = acc + Ti[i][mm] * A_T[i, jj]
                        H[jj][mm] = acc
                cols = []
                for mm in range(m):
                    for nn in range(m):
                        acc = H[0][mm] * Tj[0][nn]
                        for jj in range(1, m):
                            acc = acc + H[jj][mm] * Tj[jj][nn]
                        cols.append(acc)
                G = jnp.stack(cols, axis=-1)  # (n_p*K_p, m*m)
                Ac = jax.ops.segment_sum(
                    G, lv.emap, num_segments=lv.n * lv.K + 1
                )[:-1]  # (n*K, m*m)
                A_T = Ac.T.reshape(m, m, lv.n * lv.K)
            Dinv_T = self._t_diag_inv(A_T, lv, dtype)
            ops.append((A_T, lv.nbr, Dinv_T, lv.n))

        # coarsest: dense (small — batch-first transient is fine here)
        A_TL, nbr_L, _, n_L = ops[-1]
        K_L = nbr_L.shape[1]
        A_L = jnp.moveaxis(A_TL, -1, 0).reshape(n_L, K_L, m, m)
        iL = jnp.repeat(jnp.arange(n_L), K_L)
        jL = nbr_L.reshape(-1).astype(jnp.int64)
        okL = jL < n_L
        n_Lu = n_L * m
        rr = iL[:, None, None] * m + jnp.arange(m)[None, :, None]
        cc = jL[:, None, None] * m + jnp.arange(m)[None, None, :]
        flat = jnp.where(okL[:, None, None], rr * n_Lu + cc, n_Lu * n_Lu)
        A_dense = jax.ops.segment_sum(
            A_L.reshape(-1),
            flat.reshape(-1),
            num_segments=n_Lu * n_Lu + 1,
        )[:-1].reshape(n_Lu, n_Lu)
        dg = jnp.diagonal(A_dense)
        A_dense = A_dense + jnp.diag(
            jnp.where(jnp.abs(dg) < 1e-12, 1.0, 0.0)
        )
        coarse_solve = _coarse_dense_solver(A_dense)

        def restrict(lv, r):
            # T^T r per fine row (trailing FMAs), then sum by aggregate
            RT = r.reshape(lv.n_prev, m).T  # (m, n_prev)
            cols = []
            for mm in range(m):
                acc = lv.PT[0, mm] * RT[0]
                for i in range(1, m):
                    acc = acc + lv.PT[i, mm] * RT[i]
                cols.append(acc)
            R = jnp.stack(cols, axis=-1)  # (n_prev, m)
            return jax.ops.segment_sum(
                R, lv.agg_prev, num_segments=lv.n
            ).reshape(-1)

        def prolong(lv, ec):
            ET = ec.reshape(lv.n, m)[lv.agg_prev].T  # (m, n_prev)
            outs = []
            for i in range(m):
                acc = lv.PT[i, 0] * ET[0]
                for mm in range(1, m):
                    acc = acc + lv.PT[i, mm] * ET[mm]
                outs.append(acc)
            return jnp.stack(outs, axis=-1).reshape(-1)

        def lvl_op(li, v):
            A_l, nbr_l, _, n = ops[li]
            return self._ell_matvec(A_l, nbr_l, v, n, m)

        # per-level smoothers: Chebyshev on D^-1 A (the aggregation-AMG
        # workhorse — damped Jacobi alone loses h-independence)
        smoothers = []
        for li, (A_l, nbr_l, Dinv_T, n) in enumerate(ops):
            def dinv_apply(r, Dinv_T=Dinv_T, n=n):
                return self._t_block_apply(Dinv_T, r, n, m)

            mv = lambda v, li=li: lvl_op(li, v)
            if self.smoother == "chebyshev":
                lmax = _power_lmax(mv, dinv_apply, n * m, dtype)
                smoothers.append(
                    _chebyshev(
                        mv, dinv_apply, lmax, self.cheb_degree,
                        self.cheb_ratio,
                    )
                )
            else:
                smoothers.append(
                    lambda r, da=dinv_apply: omega * da(r)
                )

        def cycle(li, r):
            """V/W-cycle below the fine level: li indexes self.levels."""
            if li == len(levels) - 1:
                return coarse_solve(r)
            z = smoothers[li](r)
            for _ in range(gamma):
                r2 = r - lvl_op(li, z)
                ec = cycle(li + 1, restrict(levels[li + 1], r2))
                z = z + kappa * prolong(levels[li + 1], ec)
            r3 = r - lvl_op(li, z)
            return z + smoothers[li](r3)

        return cycle

    # -- constant hoisting (axon remote-compile 413 at 1M+ DOF) --------
    _LV_HOIST = ("PT", "nbr", "emap", "agg_prev", "diag_slot")

    def hoist_args(self):
        """Big static per-level arrays as a pytree to pass through jit
        ARGUMENTS (same interface as MGPrecondFactory.hoist_args /
        Disc.hoist_args): the level-1 emap alone is n_e*npe^2 int32
        ~100 MB at 1.5M elements, and embedded-constant compiles
        overflow the axon remote-compile request (HTTP 413) there."""
        return {
            "levels": [
                {k: getattr(lv, k) for k in self._LV_HOIST}
                for lv in self.levels
            ]
        }

    @contextlib.contextmanager
    def bind(self, st):
        """Temporarily substitute hoisted arrays (typically tracers)
        while make()/the cycle are traced."""
        olds = [
            {k: getattr(lv, k) for k in self._LV_HOIST}
            for lv in self.levels
        ]
        try:
            for lv, hv in zip(self.levels, st["levels"]):
                for k, v in hv.items():
                    setattr(lv, k, v)
            yield
        finally:
            for lv, ov in zip(self.levels, olds):
                for k, v in ov.items():
                    setattr(lv, k, v)

    def level1_restrict_maps(self):
        """Static (host) data a dist caller needs for the fine<->level-1
        transfers: per-node aggregate ids and rigid-mode blocks."""
        lv1 = self.levels[0]
        return lv1.agg_prev, lv1.P, lv1.n

    def make(self, J_e, diag, bc_dofs, op=None, transpose=False,
             state=None, capture=None):
        """Preconditioner callable for one assembled element-Jacobian
        state (called once per Newton step; all index maps are static,
        so this is a few einsums + segment_sums under jit).

        state/capture mirror MGPrecondFactory.make's preconditioner-
        state split signature so linear.solve_info can pass them
        uniformly; the AMG hierarchy has no state split yet (its
        setup is einsums + segment_sums, not the geometric chain's
        Galerkin/power-iteration/Newton-Schulz code that hit the
        executable ceiling), so a non-None state is an error."""
        if state is not None or capture is not None:
            raise NotImplementedError(
                "AMGPrecondFactory has no preconditioner-state split; "
                "build without mg_state"
            )
        disc = self.disc
        d = self.d
        m = self.m
        npe = disc.spec.npe
        n_e = disc.n_elem
        fu = fine_u_setup(
            disc, J_e, diag, bc_dofs, op, self.uslots, self.omega
        )
        op_u = fu["op_u"]
        mask_u = fu["mask_u"]
        m_eT = fu["m_eT"]
        dtype = fu["dtype"]

        # Dirichlet-masked u-block element Jacobians through the LAZY
        # slice accessor (mg.py fine_u_setup jt_mask) — materializing
        # the masked (nde_u, nde_u, n_e) copy is a 1.12 GB HLO buffer
        # at 1.5M elements
        jt = fu["jt_mask"]

        # level 1 Galerkin: B^T J B per element node pair, assembled as
        # unrolled trailing-layout lane FMAs + one (n_e, m*m)
        # segment_sum per node pair.  (The previous einsum materialized
        # (n_e, npe, npe, m, m) elem-first — the (6, 6) minor dims
        # tile-pad ~44x on TPU, ~50 GB HBM at 1.5M elements.)
        lv1 = self.levels[0]
        PT1 = lv1.PT  # (d, m, n_nodes)
        conn = disc.conn
        emapE = lv1.emap.reshape(n_e, npe, npe)
        BcT = [PT1[:, :, conn[:, a]] for a in range(npe)]  # (d, m, n_e)
        A_acc = jnp.zeros((lv1.n * lv1.K, m * m), dtype)
        for a in range(npe):
            Ba = BcT[a]
            for b in range(npe):
                Bb = BcT[b]
                # H[f][mm] = sum_dd Ba[dd, mm] * jt(a*d+dd, b*d+f)
                H = [[None] * m for _ in range(d)]
                for f in range(d):
                    for mm in range(m):
                        acc = Ba[0, mm] * jt(a * d, b * d + f)
                        for dd in range(1, d):
                            acc = acc + (
                                Ba[dd, mm] * jt(a * d + dd, b * d + f)
                            )
                        H[f][mm] = acc
                cols = []
                for mm in range(m):
                    for nn in range(m):
                        acc = H[0][mm] * Bb[0, nn]
                        for f in range(1, d):
                            acc = acc + H[f][mm] * Bb[f, nn]
                        cols.append(acc)
                Gab = jnp.stack(cols, axis=-1)  # (n_e, m*m)
                A_acc = A_acc + jax.ops.segment_sum(
                    Gab, emapE[:, a, b], num_segments=lv1.n * lv1.K
                )
        A1_T = A_acc.T.reshape(m, m, lv1.n * lv1.K)

        cycle = self._u_chain(A1_T, dtype)

        omega = self.omega
        kappa = self.overcorr
        levels = self.levels

        def restrict1(r):  # fine -> level 1: B^T per node, sum by agg
            RT = r.reshape(disc.n_nodes, d).T  # (d, n_nodes)
            cols = []
            for mm in range(m):
                acc = PT1[0, mm] * RT[0]
                for dd in range(1, d):
                    acc = acc + PT1[dd, mm] * RT[dd]
                cols.append(acc)
            R = jnp.stack(cols, axis=-1)  # (n_nodes, m)
            return jax.ops.segment_sum(
                R, levels[0].agg_prev, num_segments=levels[0].n
            ).reshape(-1)

        def prolong1(ec):
            ET = ec.reshape(levels[0].n, m)[levels[0].agg_prev].T
            outs = []
            for dd in range(d):
                acc = PT1[dd, 0] * ET[0]
                for mm in range(1, m):
                    acc = acc + PT1[dd, mm] * ET[mm]
                outs.append(acc)
            return jnp.stack(outs, axis=-1).reshape(-1)

        # fine-level smoother to match
        Bu_inv = fu["Bu_inv"]

        def fine_dinv(r):
            return jnp.einsum(
                "nij,nj->ni", Bu_inv, r.reshape(disc.n_nodes, d)
            ).reshape(-1)

        if self.smoother == "chebyshev":
            lmax_f = _power_lmax(op_u, fine_dinv, disc.n_dofs_u, dtype)
            fine_smooth = _chebyshev(
                op_u, fine_dinv, lmax_f, self.cheb_degree, self.cheb_ratio
            )
        else:
            fine_smooth = fu["smooth"]

        def vcycle(r):
            # fine level: Chebyshev smoother + u-block matvec
            z = fine_smooth(r)
            r2 = (r - op_u(z)) * mask_u
            ec = cycle(0, restrict1(r2))
            z = z + kappa * prolong1(ec) * mask_u
            r3 = r - op_u(z)
            return z + fine_smooth(r3)

        if not disc.spec.mixed:
            return mixed_wrap(disc, vcycle, fu, transpose=transpose)

        # ---- pressure-block AMG chain --------------------------------
        # the GLS stabilization makes A_pp a (tau h^2)-scaled Laplacian;
        # a diagonal-only p treatment (the one-level wrap) is therefore
        # h-DEPENDENT and was the measured growth source (u-only counts
        # 12 -> 17 -> 20 flat, full-system 45 -> 106 -> 144 growing).
        # Reuse the SAME aggregates/ELL maps at block size 1 with the
        # constant nullspace.
        op_p, p_fine_smooth, p_cycle, mask_p = self._make_p_chain(
            J_e, diag, bc_dofs, fu
        )

        def p_restrict1(r):
            return jax.ops.segment_sum(
                r, levels[0].agg_prev, num_segments=levels[0].n
            )

        def p_prolong1(ec):
            return ec[levels[0].agg_prev]

        def p_vcycle(r):
            z = p_fine_smooth(r)
            r2 = (r - op_p(z)) * mask_p
            ec = p_cycle(0, p_restrict1(r2))
            z = z + kappa * p_prolong1(ec) * mask_p
            r3 = r - op_p(z)
            return z + p_fine_smooth(r3)

        # block Gauss-Seidel over (u, p) with EXACT inter-block coupling
        # through one full matvec (the Teko BGS2x2 whose diagonal blocks
        # are AMG — linear_solve.cpp:36-123)
        n_u = disc.n_dofs_u
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
                # mirrored sweep for transposed (adjoint) operators
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

    def _make_p_chain(self, J_e, diag, bc_dofs, fu):
        """Scalar AMG chain for the pressure block (same aggregates,
        block size 1, constant nullspace)."""
        disc = self.disc
        d = self.d
        npe = disc.spec.npe
        n_e = disc.n_elem
        dtype = fu["dtype"]
        conn = disc.conn
        n_u = disc.n_dofs_u
        pslots = jnp.asarray(self.pslots)

        if fu["trailing"]:
            J_ppT = jnp.take(
                jnp.take(J_e, pslots, axis=0), pslots, axis=1
            )[:, :, :n_e]
        else:
            J_ppT = jnp.moveaxis(
                J_e[:, pslots, :][:, :, pslots], 0, -1
            )

        bc_mask = jnp.zeros(disc.n_dofs, bool).at[bc_dofs].set(True)
        bc_p = bc_mask[n_u:]
        diag_p = diag[n_u:]
        mask_p = jnp.where(bc_p, 0.0, 1.0).astype(dtype)
        m_peT = mask_p[conn].T  # (npe, n_e)
        JppTm = J_ppT * m_peT[:, None, :] * m_peT[None, :, :]
        blocks_p = JppTm.transpose(2, 0, 1).reshape(n_e * npe * npe)

        lv1 = self.levels[0]
        A_p = jax.ops.segment_sum(
            blocks_p, lv1.emap, num_segments=lv1.n * lv1.K
        ).reshape(lv1.n, lv1.K)

        def op_p(v):
            V = v[conn].T  # (npe, n_e)
            rows = []
            for i in range(npe):
                acc = J_ppT[i, 0] * V[0]
                for j in range(1, npe):
                    acc = acc + J_ppT[i, j] * V[j]
                rows.append(acc)
            out = disc.scatter_rows(
                jnp.stack(rows, 0).T.reshape(-1, 1)
            ).reshape(-1)
            return jnp.where(bc_p, diag_p * v, out)

        p_cycle = self._p_chain_from_A1(A_p, dtype)

        app = jnp.where(jnp.abs(diag_p) > 1e-300, diag_p, 1.0)

        def p_fine_dinv(r):
            return r / app

        if self.smoother == "chebyshev":
            lmax_f = _power_lmax(
                op_p, p_fine_dinv, disc.n_dofs - n_u, dtype
            )
            p_fine_smooth = _chebyshev(
                op_p, p_fine_dinv, lmax_f, self.cheb_degree, self.cheb_ratio
            )
        else:
            p_fine_smooth = lambda r: self.omega * p_fine_dinv(r)

        return op_p, p_fine_smooth, p_cycle, mask_p

    def _p_chain_from_A1(self, A_p1, dtype):
        """Levels >= 1 of the scalar pressure hierarchy from replicated
        level-1 blocks A_p1 (n1, K1); shared with the dist path."""
        kappa = self.overcorr
        gamma = self.gamma
        levels = self.levels
        A_p = A_p1
        p_ops = []
        for li, lv in enumerate(self.levels):
            if li > 0:
                A_p = jax.ops.segment_sum(
                    A_p.reshape(-1),
                    lv.emap,
                    num_segments=lv.n * lv.K + 1,
                )[:-1].reshape(lv.n, lv.K)
            dp = A_p.reshape(-1)[lv.diag_slot]
            dp = jnp.where(jnp.abs(dp) > 1e-30, dp, 1.0)
            p_ops.append((A_p, lv.nbr, dp, lv.n))

        def p_lvl_op(li, v):
            A_l, nbr_l, _, n = p_ops[li]
            vp = jnp.concatenate([v, jnp.zeros(1, v.dtype)])
            return jnp.einsum("nk,nk->n", A_l, vp[nbr_l])

        p_smoothers = []
        for li, (A_l, nbr_l, dp, n) in enumerate(p_ops):
            def dinv(r, dp=dp):
                return r / dp

            mv = lambda v, li=li: p_lvl_op(li, v)
            if self.smoother == "chebyshev":
                lmax = _power_lmax(mv, dinv, n, dtype)
                p_smoothers.append(
                    _chebyshev(
                        mv, dinv, lmax, self.cheb_degree, self.cheb_ratio
                    )
                )
            else:
                p_smoothers.append(lambda r, di=dinv: self.omega * di(r))

        # coarsest: dense scalar
        A_L, nbr_L, _, n_L = p_ops[-1]
        K_L = nbr_L.shape[1]
        iL = jnp.repeat(jnp.arange(n_L), K_L)
        jL = nbr_L.reshape(-1).astype(jnp.int64)
        okL = jL < n_L
        flat = jnp.where(okL, iL * n_L + jL, n_L * n_L)
        A_dense = jax.ops.segment_sum(
            A_L.reshape(-1), flat, num_segments=n_L * n_L + 1
        )[:-1].reshape(n_L, n_L)
        dg = jnp.diagonal(A_dense)
        A_dense = A_dense + jnp.diag(
            jnp.where(jnp.abs(dg) < 1e-12, 1.0, 0.0)
        )
        p_coarse_solve = _coarse_dense_solver(A_dense)

        def p_restrict(lv, r):
            return jax.ops.segment_sum(
                r, lv.agg_prev, num_segments=lv.n
            )

        def p_prolong(lv, ec):
            return ec[lv.agg_prev]

        def p_cycle(li, r):
            if li == len(levels) - 1:
                return p_coarse_solve(r)
            z = p_smoothers[li](r)
            for _ in range(gamma):
                r2 = r - p_lvl_op(li, z)
                ec = p_cycle(li + 1, p_restrict(levels[li + 1], r2))
                z = z + kappa * p_prolong(levels[li + 1], ec)
            r3 = r - p_lvl_op(li, z)
            return z + p_smoothers[li](r3)

        return p_cycle

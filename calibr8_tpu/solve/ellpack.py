"""Assembled node-block ELLPACK operator for the Krylov loop.

The EBE matvec pays a 786k-row gather AND a 3.4M-row scatter-add every
Krylov iteration (measured 9.2 ms at 196k elements on v5e — the
scatter-add alone is 6.7 ms).  Since a Newton iteration runs ~10^2
Krylov iterations against ONE Jacobian, it pays to assemble once into a
regular sparse form and make the per-iteration apply scatter-free:

  A_ell   (n_nodes, K, ndpn, ndpn)   node-block rows, fixed width K
  nbr     (n_nodes, K)               column node ids (padded: dummy)

  y[n] = sum_s A_ell[n, s] @ x[nbr[n, s]]

— one gather of K*n_nodes node rows (no scatter; the row index IS the
output position), and the block contraction runs as lane-aligned FMAs
in a Pallas kernel over trailing node layout.  This is the TPU-native
analog of the reference's assembled Tpetra block-CRS + precomputed
scatter offsets (disc.hpp:478-482, linear_alg.hpp) — ELL instead of CRS
because the MXU/VPU want fixed-width rows.

Assembly A_ell <- J_e is ONE segment_sum over precomputed
element-entry -> (node, slot) indices (the scatter-offsets analog),
paid once per Newton iteration.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_ell_maps(disc):
    """Host-side, once per Disc: neighbor table + element-entry slots.
    Cached on the Disc."""
    cached = getattr(disc, "_ell_maps", None)
    if cached is not None:
        return cached
    maps = ell_maps_from_conn(np.asarray(disc.conn), disc.n_nodes)
    disc._ell_maps = maps
    return maps


def ell_maps_from_conn(conn, n_nodes):
    """Disc-free ELL maps from a raw connectivity — the multigrid
    levels assemble their Galerkin coarse operators into the same
    node-block ELL form (one Pallas custom call per level matvec; the
    unrolled EBE level applies compiled to ~0.5 GB of TPU code PER
    V-cycle inline site at 1.5M elements, tripping the ~2 GB
    executable-load ceiling on the tunneled chip)."""
    conn = np.asarray(conn)
    n_e, npe = conn.shape

    # unique (row node, col node) pairs over all element blocks
    i = np.repeat(conn, npe, axis=1).reshape(-1)  # (n_e*npe*npe,)
    j = np.tile(conn, (1, npe)).reshape(-1)
    key = i.astype(np.int64) * n_nodes + j
    uniq, inv = np.unique(key, return_inverse=True)
    u_i = (uniq // n_nodes).astype(np.int64)
    u_j = (uniq % n_nodes).astype(np.int64)
    # slot of each unique pair within its row (uniq is sorted by (i, j))
    row_start = np.searchsorted(u_i, np.arange(n_nodes))
    slot = np.arange(len(uniq)) - row_start[u_i]
    K = int(slot.max()) + 1

    # -- stencil canonicalization -------------------------------------
    # On structured meshes (the builtin cubes/squares and their nested
    # refinements — every scale-bench level) each neighbor sits at one
    # of a few dozen constant index OFFSETS.  Re-assigning slots by
    # GLOBAL offset rank makes every ELL slot a constant SHIFT of the
    # node vector, so the apply-side neighbor gather — whose (n, K, m)
    # result tile-pads ~42x on TPU (minor dims (K, m)) and whose row
    # gather lowers element-at-a-time — becomes K static slices of one
    # zero-padded vector (classic stencil form, see gather_T).  Slots
    # a node's boundary leaves empty keep the sentinel nbr and a ZERO
    # A-block (assembly never scatters there), so the shifted reads
    # they see are annihilated.  Unstructured meshes (imported .smb /
    # notch) blow the distinct-offset bound and keep the dense slot
    # packing + gather path.
    offsets = None
    if os.environ.get("CALIBR8_ELL_STENCIL", "1") != "0":
        off = u_j - u_i
        d_offs = np.unique(off)
        # Acceptance cap: 3D REFINED cubes are NOT self-similar under
        # red tet refinement (the octahedron children mix orientation
        # classes), so the scale chains carry 45-75 distinct offsets
        # against K ~ 21 slots — the old 1.5K+4 bound rejected exactly
        # the meshes the stencil was built for, and every "stencil"
        # scale run before round 5 silently used the gather.  Measured
        # n=64 (m=4, K=21): gather 28.1 ms of the 34.5 ms matvec vs a
        # 0.11 ms roofline; the slice form at K=75 trades ~3.6x A_T
        # bytes (zero blocks on the rare-offset slots) for the whole
        # gather.  Default cap 96 accepts the refined-cube chains and
        # still rejects unstructured meshes (thousands of offsets);
        # CALIBR8_ELL_STENCIL_MAX overrides (memory-constrained runs).
        cap = int(os.environ.get(
            "CALIBR8_ELL_STENCIL_MAX",
            max(int(1.5 * K) + 4, 96),
        ))
        # the 4K guard separates lattice-like meshes (offset count a
        # small multiple of the slot count, scale chain: 75 vs K=21)
        # from genuinely unstructured ones (offsets ~ O(n) regardless
        # of K; notch h=0.12: 93 offsets vs K=8)
        if len(d_offs) <= min(cap, 4 * K):
            slot = np.searchsorted(d_offs, off)
            K = len(d_offs)
            offsets = d_offs.astype(np.int64)

    nbr = np.full((n_nodes, K), n_nodes, dtype=np.int32)  # dummy pad
    nbr[u_i, slot] = u_j.astype(np.int32)
    # flat ELL position per element entry (e, a, b)
    ell_idx = (u_i * K + slot)[inv].astype(np.int32).reshape(n_e, npe, npe)
    # slot-major flat position (assemble_ell_T's scatter target order)
    ell_idx_T = (slot * n_nodes + u_i)[inv].astype(np.int32).reshape(
        n_e, npe, npe
    )
    # assemble_ell_T's flat (a, b, e)-ordered form, precomputed on host
    # so it can hoist through jit as an ARGUMENT: left as a per-trace
    # constant it is 100 MB at 1.5M elements, and the scale newton's
    # compiled program hit 3.8 GB of generated code / embedded data
    ell_ids_T = np.ascontiguousarray(
        ell_idx_T.transpose(1, 2, 0).reshape(-1)
    )
    # transposed-operator ids: entry (e, a, b) scatters to the (row
    # conn[e,b], col conn[e,a]) slot, so A^T assembles directly from
    # J_e (block-transposed in the value permute) with NO swapaxes
    # copy of the 1.6 GB trailing Jacobian (adjoint scale OOM)
    ell_ids_T_swap = np.ascontiguousarray(
        ell_idx_T.transpose(2, 1, 0).reshape(-1)
    )

    # cache HOST numpy arrays: jnp.asarray here would return tracers
    # when the first build happens inside a jit trace, and the cached
    # tracers leak into every later trace (UnexpectedTracerError — hit
    # by the scan-harness benches, which trace the same solve twice in
    # one process).  Consumers pass these to jnp ops, which stage
    # per-trace constants; Disc.bind substitutes hoisted tracers.
    return dict(
        nbr=nbr, ell_idx=ell_idx, ell_idx_T=ell_idx_T,
        ell_ids_T=ell_ids_T, ell_ids_T_swap=ell_ids_T_swap, K=K,
        offsets=offsets,
    )


def gather_T(X, nbr, n_nodes, m, offsets=None):
    """Node matrix (n_nodes, m) -> neighbor values (K, m, n_nodes) in
    the ELL kernels' trailing G_T layout.

    `offsets` (stencil maps, ell_maps_from_conn): K STATIC slices of
    the zero-padded transposed node matrix — no gather and no
    (n, K, m) intermediate.  That intermediate is the measured fine-
    matvec killer on TPU: its minor dims (K, m) tile-pad to (32, 128)
    — ~42x HBM traffic at m=3 — and the row gather itself lowers
    element-at-a-time; slices + one stack are pure full-bandwidth
    copies.  Boundary-missing slots read a neighboring node's value
    (or pad zero) and are annihilated by their zero A-blocks."""
    # CALIBR8_ELL_STENCIL=0 at apply time A/Bs the two forms on the
    # SAME canonicalized maps (slot layout serves both paths)
    if offsets is not None and os.environ.get(
        "CALIBR8_ELL_STENCIL", "1"
    ) != "0":
        X_T = X.T  # (m, n)
        maxo = int(max(-int(offsets[0]), int(offsets[-1]), 0))
        Xp = jnp.pad(X_T, ((0, 0), (maxo, maxo)))
        parts = [
            jax.lax.slice_in_dim(
                Xp, maxo + int(o), maxo + int(o) + n_nodes, axis=1
            )
            for o in offsets
        ]
        return jnp.stack(parts, axis=0)
    Xp = jnp.concatenate([X, jnp.zeros((1, m), X.dtype)], axis=0)
    return jnp.moveaxis(Xp[nbr], 0, -1)


def assemble_ell(J_e, disc):
    """Element Jacobians (elem-first (n_e, nde, nde) or trailing
    (nde, nde, E_pad)) -> (A_ell (n_nodes, K, ndpn, ndpn), nbr).

    CPU path; on TPU use assemble_ell_T (any array whose MINOR dims
    are the small (ndpn, ndpn) blocks tile-pads 32-64x in HBM — the
    elem-first (E, npe, npe, ndpn, ndpn) intermediate here is 51 GB at
    1.5M elements)."""
    maps = build_ell_maps(disc)
    n_e = disc.n_elem
    npe = disc.spec.npe
    ndpn = disc.ndpn
    from calibr8_tpu.fem.assembly import jac_is_trailing

    if jac_is_trailing(J_e, disc):
        Jef = jnp.moveaxis(J_e, -1, 0)[:n_e]
    else:
        Jef = J_e
    # (n_e, npe, ndpn, npe, ndpn) -> (n_e, npe, npe, ndpn, ndpn)
    blocks = Jef.reshape(n_e, npe, ndpn, npe, ndpn).transpose(0, 1, 3, 2, 4)
    vals = blocks.reshape(n_e * npe * npe, ndpn * ndpn)
    K = maps["K"]
    flat = jax.ops.segment_sum(
        vals,
        maps["ell_idx"].reshape(-1),
        num_segments=disc.n_nodes * K,
    )
    return flat.reshape(disc.n_nodes, K, ndpn, ndpn), maps["nbr"]


def assemble_ell_T(J_e, disc, transpose=False):
    """TPU ELL assembly DIRECTLY in the kernel's trailing layout
    (K, ndpn, ndpn, n_nodes): every materialized array keeps its big
    axis minormost (lane-aligned), so nothing tile-pads.  One
    scatter-add along the minor axis replaces the segment_sum.

    With `transpose`, assembles A^T straight from J_e: entry (e, a, b)
    goes to the (row conn[e,b], col conn[e,a]) slot with the block
    transposed inside the value permute — no swapaxes copy of the
    trailing Jacobian (1.6 GB at 1.5M elements, right at the scale
    adjoint's HBM edge)."""
    maps = build_ell_maps(disc)
    n_e = disc.n_elem
    npe = disc.spec.npe
    ndpn = disc.ndpn
    K = maps["K"]
    n = disc.n_nodes
    from calibr8_tpu.fem.assembly import jac_is_trailing

    if jac_is_trailing(J_e, disc):
        JT = J_e[:, :, :n_e]
    else:
        JT = jnp.moveaxis(J_e, 0, -1)
    # flat (a, b, e) order, host-precomputed
    ids = maps["ell_ids_T_swap" if transpose else "ell_ids_T"]

    def scatter_block(A2, Jc, idc):
        # (nde, nde, C) -> (ndpn^2, npe^2 * C), column order (a, b, e);
        # axes of the reshape are (a, i, b, j, e) — the transposed
        # operator stores the block's (j, i) entry instead
        C = Jc.shape[-1]
        perm = (3, 1, 0, 2, 4) if transpose else (1, 3, 0, 2, 4)
        Vc = (
            Jc.reshape(npe, ndpn, npe, ndpn, C)
            .transpose(*perm)
            .reshape(ndpn * ndpn, npe * npe * C)
        )
        return A2.at[:, idc.reshape(-1)].add(Vc)

    A2 = jnp.zeros((ndpn * ndpn, K * n), JT.dtype)
    from calibr8_tpu.fem.assembly import _elem_chunk_size

    chunk = _elem_chunk_size()
    if n_e <= chunk:
        A2 = scatter_block(A2, JT, ids)
    else:
        # chunk the scatter over elements: the one-shot form's permuted
        # copy V is (ndpn^2, npe^2*E) = 1.6 GB at 1.5M elements, right
        # when the scale newton sits at the HBM edge.  dynamic_slice
        # per chunk bounds the live temp to one chunk with no stacked
        # input copy (lax.map's prep would re-copy all of JT).
        ids2 = jnp.reshape(ids, (npe * npe, n_e))
        # ceil-div chunking with a backward-overlapping FINAL chunk:
        # a remainder-shaped scatter_block call would instantiate the
        # scatter a second time in generated code (executable-size
        # ceiling); instead the last chunk starts at n_e - chunk and a
        # lane mask zeroes the already-added overlap (adds are not
        # idempotent, unlike the dense-output overlap rewrite in
        # fem/assembly.chunked_trailing).
        nchunks = -(-n_e // chunk)

        def body(c, A2):
            s = jnp.minimum(c * chunk, n_e - chunk)
            Jc = jax.lax.dynamic_slice_in_dim(JT, s, chunk, axis=2)
            idc = jax.lax.dynamic_slice_in_dim(ids2, s, chunk, axis=1)
            mask = ((s + jnp.arange(chunk)) >= c * chunk).astype(Jc.dtype)
            return scatter_block(A2, Jc * mask, idc)

        A2 = jax.lax.fori_loop(0, nchunks, body, A2)
    # (ndpn, ndpn, K, n) -> (K, ndpn, ndpn, n): minor axis stays big
    A_T = A2.reshape(ndpn, ndpn, K, n).transpose(2, 0, 1, 3)
    return A_T, maps["nbr"]


def assemble_ell_T_blocks(JT, ids, K, n_nodes, npe, m):
    """Generic trailing-layout ELL assembly for one multigrid level:
    element blocks (npe*m, npe*m, E) + flat (a, b, e)-ordered slot ids
    (from ell_maps_from_conn, host or hoisted) -> A_T (K, m, m, n).
    Same scatter structure as assemble_ell_T, parameterized by the
    node-block size m (u chain: m = dim; pressure chain: m = 1)."""
    E = JT.shape[-1]

    def scatter_block(A2, Jc, idc):
        C = Jc.shape[-1]
        Vc = (
            Jc.reshape(npe, m, npe, m, C)
            .transpose(1, 3, 0, 2, 4)
            .reshape(m * m, npe * npe * C)
        )
        return A2.at[:, idc.reshape(-1)].add(Vc)

    A2 = jnp.zeros((m * m, K * n_nodes), JT.dtype)
    from calibr8_tpu.fem.assembly import _elem_chunk_size

    chunk = _elem_chunk_size()
    ids2 = jnp.reshape(ids, (npe * npe, E))
    if E <= chunk:
        A2 = scatter_block(A2, JT, ids2)
    else:
        # backward-overlapping final chunk + lane mask (one scatter
        # instantiation; see assemble_ell_T)
        nchunks = -(-E // chunk)

        def body(c, A2):
            s = jnp.minimum(c * chunk, E - chunk)
            Jc = jax.lax.dynamic_slice_in_dim(JT, s, chunk, axis=2)
            idc = jax.lax.dynamic_slice_in_dim(ids2, s, chunk, axis=1)
            mask = ((s + jnp.arange(chunk)) >= c * chunk).astype(Jc.dtype)
            return scatter_block(A2, Jc * mask, idc)

        A2 = jax.lax.fori_loop(0, nchunks, body, A2)
    return A2.reshape(m, m, K, n_nodes).transpose(2, 0, 1, 3)


class LevelEllOperator:
    """Assembled node-block ELL apply for one multigrid level.

    No Dirichlet handling: level operators are Galerkin products of
    already-masked fine blocks.  The point on TPU is CODE size as much
    as speed — each unrolled EBE level matvec compiled to hundreds of
    fused element-length vector ops, instantiated at every smoother /
    residual site of every V-cycle inline copy (~0.5 GB of generated
    code per cycle at 1.5M elements, tripping the ~2 GB executable
    load ceiling); the Pallas apply is ONE custom call."""

    def __init__(self, JT, nbr, ids, K, n_nodes, m, offsets=None):
        npe = JT.shape[0] // m
        A_T = assemble_ell_T_blocks(JT, ids, K, n_nodes, npe, m)
        self.nbr = nbr
        self.offsets = offsets
        self.K = K
        self.n_nodes = n_nodes
        self.m = m
        use_pallas = (
            _pallas_backend()
            and A_T.dtype != jnp.float64
            and os.environ.get("CALIBR8_ELL_PALLAS", "1") != "0"
        )
        if use_pallas:
            self.N_pad = _pad128(n_nodes)
            self._blk = _pick_block(self.N_pad)
            self.A_T = jnp.pad(
                A_T, ((0, 0), (0, 0), (0, 0), (0, self.N_pad - n_nodes))
            )
        else:
            self.N_pad = None
            self._blk = None
            self.A_T = A_T

    @classmethod
    def from_assembled(cls, A_T, nbr, K, n_nodes, m, offsets=None):
        """Rebuild the operator from a previously assembled (and, on
        the Pallas path, already padded) `self.A_T` — the multigrid
        preconditioner-state path (mg.make_state / make(state=...)):
        the apply program takes the level values as a jit argument
        instead of re-running the element-block scatter per solve."""
        self = cls.__new__(cls)
        self.nbr = nbr
        self.offsets = offsets
        self.K = K
        self.n_nodes = n_nodes
        self.m = m
        # same Pallas-vs-einsum decision as __init__ (state is built
        # and consumed on the same backend under the same env)
        use_pallas = (
            _pallas_backend()
            and A_T.dtype != jnp.float64
            and os.environ.get("CALIBR8_ELL_PALLAS", "1") != "0"
        )
        if use_pallas:
            self.N_pad = A_T.shape[-1]
            self._blk = _pick_block(self.N_pad)
        else:
            self.N_pad = None
            self._blk = None
        self.A_T = A_T
        return self

    def __call__(self, v):
        X = v.reshape(self.n_nodes, self.m)
        G_T = gather_T(X, self.nbr, self.n_nodes, self.m, self.offsets)
        if self._blk is not None:
            fwd_call, bwd_call = _kernel_pair(
                self.K, self.m, self.N_pad, G_T.dtype, self._blk
            )
            G_T = jnp.pad(
                G_T, ((0, 0), (0, 0), (0, self.N_pad - self.n_nodes))
            )
            from jax import custom_derivatives as _cd

            Y_T = _cd.linear_call(
                lambda A_T, G_T: fwd_call(A_T, G_T),
                lambda A_T, ct: bwd_call(A_T, ct),
                self.A_T,
                G_T,
            )
            Y = Y_T[:, : self.n_nodes]
        else:
            Y = jnp.einsum("sijn,sjn->in", self.A_T, G_T)
        return Y.T.reshape(-1)


# -- the scatter-free matvec ---------------------------------------------


def _pallas_backend():
    """The kernel-path gate.  CALIBR8_ELL_FORCE_PALLAS=1 (with
    CALIBR8_PALLAS_INTERPRET=1) lets the CPU suite execute the exact
    TPU kernel branches — a NameError in the LevelEllOperator kernel
    branch once shipped through a fully-green CPU run because nothing
    off-TPU ever entered it."""
    return jax.default_backend() == "tpu" or os.environ.get(
        "CALIBR8_ELL_FORCE_PALLAS"
    ) == "1"


def _pick_block(n: int):
    for b in (1024, 512, 256, 128):
        if n % b == 0:
            return b
    return None


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _make_kernel(K, ndpn, N_pad, dtype, block_n, transpose=False):
    """Forward: y[i, n] = sum_{s, j} A[s, i, j, n] G[s, j, n].
    Transpose (the linear_call rule, cotangent wrt the gathered G):
    Gt[s, j, n] = sum_i A[s, i, j, n] ct[i, n]."""

    def fwd(A_ref, G_ref, y_ref):
        A = A_ref[...]  # (K, ndpn, ndpn, B)
        G = G_ref[...]  # (K, ndpn, B)
        rows = []
        for i in range(ndpn):
            acc = A[0, i, 0] * G[0, 0]
            for s in range(K):
                for j in range(ndpn):
                    if s == 0 and j == 0:
                        continue
                    acc = acc + A[s, i, j] * G[s, j]
            rows.append(acc)
        y_ref[...] = jnp.stack(rows, axis=0)

    def bwd(A_ref, ct_ref, g_ref):
        A = A_ref[...]
        ct = ct_ref[...]  # (ndpn, B)
        slots = []
        for s in range(K):
            rows = []
            for j in range(ndpn):
                acc = A[s, 0, j] * ct[0]
                for i in range(1, ndpn):
                    acc = acc + A[s, i, j] * ct[i]
                rows.append(acc)
            slots.append(jnp.stack(rows, axis=0))
        g_ref[...] = jnp.stack(slots, axis=0)

    in_small = (
        pl.BlockSpec((ndpn, block_n), lambda i: (0, i), memory_space=pltpu.VMEM)
        if transpose
        else pl.BlockSpec(
            (K, ndpn, block_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
    )
    out_spec = (
        pl.BlockSpec(
            (K, ndpn, block_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        if transpose
        else pl.BlockSpec(
            (ndpn, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
        )
    )
    out_shape = (
        jax.ShapeDtypeStruct((K, ndpn, N_pad), dtype)
        if transpose
        else jax.ShapeDtypeStruct((ndpn, N_pad), dtype)
    )
    return pl.pallas_call(
        bwd if transpose else fwd,
        grid=(N_pad // block_n,),
        in_specs=[
            pl.BlockSpec(
                (K, ndpn, ndpn, block_n),
                lambda i: (0, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            in_small,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        # CPU parity tests exercise the identical kernel off-TPU
        # (mirrors the dist assembly kernel's knob, parallel/dist.py)
        interpret=os.environ.get("CALIBR8_PALLAS_INTERPRET") == "1",
    )


_KCACHE = {}


def _kernel_pair(K, m, N_pad, dtype, blk):
    """(forward, transpose) Pallas matvec kernels, cached by shape."""
    key = (K, m, N_pad, dtype, blk)
    calls = _KCACHE.get(key)
    if calls is None:
        calls = (
            _make_kernel(K, m, N_pad, dtype, blk),
            _make_kernel(K, m, N_pad, dtype, blk, transpose=True),
        )
        _KCACHE[key] = calls
    return calls


class EllOperator:
    """y = A x with Dirichlet rows diag * x (built once per Jacobian)."""

    def __init__(self, disc, J_e, diag, bc_dofs, transpose=False):
        on_tpu = _pallas_backend()
        if transpose and not on_tpu:
            # CPU path: transpose each element block BEFORE assembly
            # (the TPU path folds the transpose into the scatter ids —
            # the trailing swapaxes copy is 1.6 GB at 1.5M elements)
            from calibr8_tpu.fem.assembly import jac_is_trailing

            J_e = (
                J_e.swapaxes(0, 1)
                if jac_is_trailing(J_e, disc)
                else J_e.swapaxes(-1, -2)
            )
        self.disc = disc
        self.diag = diag
        self.bc_dofs = bc_dofs
        self.ndpn = disc.ndpn
        n = disc.n_nodes
        self.n_nodes = n
        if on_tpu:
            # assemble DIRECTLY in trailing layout: the (n, K, ndpn,
            # ndpn) form tile-pads 64x in HBM (44 GB at 1M DOF).  Pad
            # the node axis to a 128 multiple so the kernel's block
            # grid always applies (65^3-node cubes are odd; the old
            # divisibility bail-out silently fell back to the einsum
            # path on every cube mesh).
            self.N_pad = _pad128(n)
            self._blk = _pick_block(self.N_pad)
            self.offsets = build_ell_maps(disc).get("offsets")
            A_T, nbr = assemble_ell_T(J_e, disc, transpose=transpose)
            self.A_T = jnp.pad(
                A_T, ((0, 0), (0, 0), (0, 0), (0, self.N_pad - n))
            )
            self.K = self.A_T.shape[0]
            # f64 Pallas is structurally impossible on this TPU stack
            # (the X64-rewrite pass has no tpu_custom_call rule — the
            # same gate as fem/pallas_assembly.supports_pallas); the
            # f64 apply runs the SAME trailing layout through an XLA
            # einsum instead of the kernel.
            if self.A_T.dtype == jnp.float64:
                self._blk = None
            # bisect/workaround knob: CALIBR8_ELL_PALLAS=0 forces the
            # XLA einsum apply on the same trailing layout
            if os.environ.get("CALIBR8_ELL_PALLAS", "1") == "0":
                self._blk = None
        else:
            self._blk = None
            self.N_pad = None
            self.offsets = None
            A, nbr = assemble_ell(J_e, disc)
            self.A = A
            self.K = A.shape[1]
        self.nbr = nbr

    def __call__(self, v):
        from calibr8_tpu.fem.bcs import apply_dbcs_matvec

        disc = self.disc
        X = disc.nodemat(v)  # (n_nodes, ndpn)
        if self.N_pad is not None:
            # trailing layout (TPU): stencil slices on structured
            # meshes, neighbor gather otherwise (gather_T)
            G_T = gather_T(
                X, self.nbr, self.n_nodes, self.ndpn, self.offsets
            )
        if self._blk is not None:
            fwd_call, bwd_call = _kernel_pair(
                self.K, self.ndpn, self.N_pad, X.dtype, self._blk
            )
            # linear_call provides the transpose rule
            # lax.custom_linear_solve (jax gmres) requires at trace time
            from jax import custom_derivatives as _cd

            G_T = jnp.pad(
                G_T, ((0, 0), (0, 0), (0, self.N_pad - self.n_nodes))
            )
            Y_T = _cd.linear_call(
                lambda A_T, G_T: fwd_call(A_T, G_T),
                lambda A_T, ct: bwd_call(A_T, ct),
                self.A_T,
                G_T,
            )
            y = disc.nodemat_to_flat(Y_T[:, : self.n_nodes].T)
        elif self.N_pad is not None:
            # TPU f64: same trailing layout, XLA einsum apply
            Y_T = jnp.einsum(
                "sijn,sjn->in", self.A_T[..., : self.n_nodes], G_T
            )
            y = disc.nodemat_to_flat(Y_T.T)
        else:
            Xp = jnp.concatenate(
                [X, jnp.zeros((1, self.ndpn), X.dtype)], axis=0
            )
            G = Xp[self.nbr]  # (n_nodes, K, ndpn)
            y = disc.nodemat_to_flat(
                jnp.einsum("nsij,nsj->ni", self.A, G)
            )
        return apply_dbcs_matvec(y, self.diag, v, self.bc_dofs)

"""Discretization container: static device arrays + DOF maps.

The TPU re-design of class Disc (reference: source/calibr8/src/disc.hpp:72-483).
Where the reference builds Tpetra owned/ghost maps, CRS graphs and
precomputed scatter offsets for MPI-parallel assembly
(disc.cpp:293-321, disc.hpp:478-482), here the mesh is lowered once to:

  * conn / edofs   (n_elem, npe) / (n_elem, ndofs_e) gather indices
  * grad_N, detJ, h  per-element geometry (fem/geometry.py)
  * es_ids         (n_elem,) element-set index per element (for per-set
                   material parameter rows)
  * node/side sets  index arrays

DOF layout (flat): u block first (node-major, eq-minor), then p block —
the same 2-block structure the reference's block preconditioner exploits
(linear_solve.cpp:36-123); our block preconditioners use the same split.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.fem.geometry import compute_elem_geom
from calibr8_tpu.mechanics.global_residual import MechanicsSpec
from calibr8_tpu.mesh.mesh import Mesh


class Disc:
    def __init__(self, mesh: Mesh, spec: MechanicsSpec, dtype=jnp.float64):
        mesh.validate()
        sorted_mesh, ranges = mesh.sorted_by_elem_set()
        self.mesh = sorted_mesh
        self.spec = spec
        self.dtype = dtype
        self.elem_set_ranges = ranges
        self.elem_set_names = list(ranges.keys())

        d = spec.dim
        assert mesh.dim == d
        n_nodes = sorted_mesh.n_nodes
        n_elem = sorted_mesh.n_elems
        npe = spec.npe

        self.n_nodes = n_nodes
        self.n_elem = n_elem
        self.n_dofs_u = n_nodes * d
        self.n_dofs = self.n_dofs_u + (n_nodes if spec.mixed else 0)

        geom = compute_elem_geom(sorted_mesh)
        self.grad_N = jnp.asarray(geom.grad_N, dtype)
        self.detJ = jnp.asarray(geom.detJ, dtype)
        self.h = jnp.asarray(geom.h, dtype)
        self.coords = jnp.asarray(sorted_mesh.coords, dtype)
        self.conn = jnp.asarray(sorted_mesh.conn, jnp.int32)

        # element dof map, NODE-INTERLEAVED: per node [u_0..u_{d-1}, p]
        # (matches MechanicsSpec.unpack/pack; row-based gathers over a
        # (n_nodes, ndpn) node matrix are ~5x faster on TPU than scalar
        # dof gathers)
        conn = sorted_mesh.conn
        node_dofs = conn[:, :, None] * d + np.arange(d)[None, None, :]
        if spec.mixed:
            p_dofs = (self.n_dofs_u + conn)[:, :, None]
            edofs = np.concatenate([node_dofs, p_dofs], axis=2)
        else:
            edofs = node_dofs
        self.ndpn = spec.ndofs_per_node
        self.edofs = jnp.asarray(edofs.reshape(n_elem, -1), jnp.int32)

        # element-set index per element
        es_ids = np.zeros(n_elem, dtype=np.int32)
        for i, (name, (start, stop)) in enumerate(ranges.items()):
            es_ids[start:stop] = i
        self.es_ids = jnp.asarray(es_ids)

    # -- dof helpers (host) -------------------------------------------
    def u_dof(self, nodes: np.ndarray, eq: int) -> np.ndarray:
        return np.asarray(nodes) * self.spec.dim + eq

    def p_dof(self, nodes: np.ndarray) -> np.ndarray:
        assert self.spec.mixed
        return self.n_dofs_u + np.asarray(nodes)

    def dof(self, resid_idx: int, nodes: np.ndarray, eq: int) -> np.ndarray:
        if resid_idx == 0:
            return self.u_dof(nodes, eq)
        assert resid_idx == 1 and eq == 0
        return self.p_dof(nodes)

    # -- field <-> flat dof vector ------------------------------------
    def split(self, x: jnp.ndarray):
        """Flat dofs -> (u (n_nodes, d), p (n_nodes,) or None)."""
        u = x[: self.n_dofs_u].reshape(self.n_nodes, self.spec.dim)
        p = x[self.n_dofs_u :] if self.spec.mixed else None
        return u, p

    def join(self, u: jnp.ndarray, p=None) -> jnp.ndarray:
        parts = [u.reshape(-1)]
        if self.spec.mixed:
            parts.append(p.reshape(-1))
        return jnp.concatenate(parts)

    def zero_x(self) -> jnp.ndarray:
        return jnp.zeros(self.n_dofs, self.dtype)

    def geom_tuple(self):
        return (self.grad_N, self.detJ, self.h)

    # -- node-matrix layout (hot gather/scatter path) ------------------
    def nodemat(self, x: jnp.ndarray) -> jnp.ndarray:
        """Flat dofs -> (n_nodes, ndpn) node matrix [u | p]."""
        d = self.spec.dim
        u = x[: self.n_dofs_u].reshape(self.n_nodes, d)
        if not self.spec.mixed:
            return u
        p = x[self.n_dofs_u :].reshape(self.n_nodes, 1)
        return jnp.concatenate([u, p], axis=1)

    def nodemat_to_flat(self, X: jnp.ndarray) -> jnp.ndarray:
        d = self.spec.dim
        parts = [X[:, :d].reshape(-1)]
        if self.spec.mixed:
            parts.append(X[:, d])
        return jnp.concatenate(parts)

    def gather_elem(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n_dofs,) -> (n_elem, nde) element dof values via one
        row-gather of the node matrix."""
        X = self.nodemat(x)
        return X[self.conn].reshape(self.n_elem, -1)

    # -- constant hoisting (large-mesh compile payloads) ----------------
    #
    # Arrays closed over by a jitted function are EMBEDDED in the
    # compiled module as dense literals.  At 1M+ DOF the index/geometry
    # arrays total 100s of MB, which (a) bloats every compile and (b)
    # overflows the axon remote-compile request limit (HTTP 413 at the
    # n=64 cube).  hoist_args()/bind() let a caller pass them as jit
    # ARGUMENTS instead: trace the step inside `with disc.bind(args):`
    # where `args` are the tracers of hoist_args()'s pytree.
    _HOIST = ("grad_N", "detJ", "h", "coords", "conn", "edofs", "es_ids")

    def hoist_args(self, ell: bool = False):
        """Big static arrays as a dict pytree (pass through jit)."""
        st = {k: getattr(self, k) for k in self._HOIST}
        st["node_inc"] = self.node_inc  # builds + returns jnp
        if ell:
            from calibr8_tpu.solve.ellpack import build_ell_maps

            m = build_ell_maps(self)  # host build BEFORE any trace
            st["ell_nbr"] = m["nbr"]
            st["ell_idx"] = m["ell_idx"]
            # the TPU assemble_ell_T scatter ids (forward + transposed
            # operator): 100 MB each at 1.5M elements if left as
            # embedded per-trace constants
            st["ell_ids_T"] = m["ell_ids_T"]
            st["ell_ids_T_swap"] = m["ell_ids_T_swap"]
        return st

    @contextlib.contextmanager
    def bind(self, st):
        """Temporarily substitute hoisted arrays (typically tracers)
        for the stored device arrays while a step function is traced."""
        olds = {k: getattr(self, k) for k in self._HOIST}
        old_bound = getattr(self, "_node_inc_bound", None)
        old_ell = getattr(self, "_ell_maps", None)
        try:
            for k in self._HOIST:
                setattr(self, k, st[k])
            self._node_inc_bound = st["node_inc"]
            if "ell_nbr" in st:
                assert old_ell is not None
                self._ell_maps = dict(
                    old_ell, nbr=st["ell_nbr"], ell_idx=st["ell_idx"]
                )
                for k in ("ell_ids_T", "ell_ids_T_swap"):
                    if k in st:
                        self._ell_maps[k] = st[k]
            yield
        finally:
            for k, v in olds.items():
                setattr(self, k, v)
            self._node_inc_bound = old_bound
            self._ell_maps = old_ell

    @property
    def node_inc(self):
        """CSR-style node -> incident (element, local-node) slot table,
        padded with an out-of-range slot index.  Used to realize the
        scatter-add as a gather+sum, which is ~1.7x faster than
        segment_sum's scatter on TPU."""
        bound = getattr(self, "_node_inc_bound", None)
        if bound is not None:
            return bound
        if getattr(self, "_node_inc", None) is None:
            from calibr8_tpu import native

            ids = np.asarray(self.conn).reshape(-1)
            inc = native.node_incidence(ids, self.n_nodes)
            if inc is None:  # numpy fallback (no compiler available)
                order = np.argsort(ids, kind="stable").astype(np.int32)
                sorted_ids = ids[order]
                starts = np.searchsorted(sorted_ids, np.arange(self.n_nodes))
                rank = np.arange(len(ids)) - starts[sorted_ids]
                K = int(rank.max()) + 1 if len(ids) else 1
                inc = np.full((self.n_nodes, K), len(ids), np.int32)
                inc[sorted_ids, rank] = order
            # cache as numpy: a jnp array built under an active jit trace
            # would leak the tracer
            self._node_inc = inc
        return jnp.asarray(self._node_inc)

    def scatter_rows(self, rows: jnp.ndarray) -> jnp.ndarray:
        """(n_elem*npe, c) per-element-node rows -> (n_nodes, c)
        assembled node values (the Export-ADD analog,
        linear_alg.hpp:38-53).  On TPU this is a padded gather+sum over
        the node incidence table; elsewhere a segment_sum."""
        if jax.default_backend() == "tpu":
            c = rows.shape[-1]
            rows = jnp.concatenate(
                [rows, jnp.zeros((1, c), rows.dtype)], axis=0
            )
            return jnp.sum(rows[self.node_inc], axis=1)
        return jax.ops.segment_sum(
            rows, self.conn.reshape(-1), num_segments=self.n_nodes
        )

    def scatter_elem(self, R_e: jnp.ndarray) -> jnp.ndarray:
        """(n_elem, nde) element values -> assembled (n_dofs,)."""
        npe = self.spec.npe
        rows = R_e.reshape(self.n_elem * npe, self.ndpn)
        return self.nodemat_to_flat(self.scatter_rows(rows))

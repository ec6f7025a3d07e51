"""Host-side mesh topology: static index arrays for TPU assembly.

Replaces the reference's PUMI/apf mesh + Disc machinery
(reference: source/calibr8/src/disc.{hpp,cpp}) with plain numpy arrays
built once at load time:

  * coords      (n_nodes, dim)     nodal coordinates
  * conn        (n_elem, dim+1)    element -> node connectivity (P1 simplex)
  * elem_sets   name -> element index array (material blocks)
  * node_sets   name -> node index array (Dirichlet BCs, virtual fields)
  * side_sets   name -> (n_faces, 2) array of (elem, local_facet)

Elements are sorted so each elem set is a contiguous range (elem_set_ranges)
— per-set assembly kernels then operate on slices with zero gather overhead,
the TPU analog of the reference's per-element-set loops
(reference: source/calibr8/src/evaluations.cpp:47-58).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# local facet -> facet node tuple (outward orientation), per dim.
# tri nodes (0,1,2): facet f is opposite node f.
TRI_FACETS = np.array([[1, 2], [2, 0], [0, 1]])
# tet nodes (0,1,2,3): facet f opposite node f, ordered for outward normals.
TET_FACETS = np.array([[1, 3, 2], [0, 2, 3], [0, 3, 1], [0, 1, 2]])


def local_facets(dim: int) -> np.ndarray:
    return TRI_FACETS if dim == 2 else TET_FACETS


@dataclass
class Mesh:
    dim: int
    coords: np.ndarray
    conn: np.ndarray
    elem_sets: dict[str, np.ndarray] = field(default_factory=dict)
    node_sets: dict[str, np.ndarray] = field(default_factory=dict)
    side_sets: dict[str, np.ndarray] = field(default_factory=dict)
    # optional nodal fields attached to the mesh (measured DIC data etc.,
    # the analog of apf fields named `measured_<step>` —
    # reference: source/calibr8/src/synthetic.hpp:15-18)
    fields: dict[str, np.ndarray] = field(default_factory=dict)

    @property
    def n_nodes(self) -> int:
        return self.coords.shape[0]

    @property
    def n_elems(self) -> int:
        return self.conn.shape[0]

    @property
    def nodes_per_elem(self) -> int:
        return self.conn.shape[1]

    def sorted_by_elem_set(self) -> tuple["Mesh", dict[str, tuple[int, int]]]:
        """Reorder elements so each elem set is contiguous.

        Returns the new mesh and name -> (start, stop) ranges.
        Elements not in any set are dropped (the reference requires every
        element to be classified into an elem set).
        """
        order = []
        ranges: dict[str, tuple[int, int]] = {}
        for name, idx in self.elem_sets.items():
            start = len(order)
            order.extend(np.asarray(idx, dtype=np.int64).tolist())
            ranges[name] = (start, len(order))
        order = np.asarray(order, dtype=np.int64)
        old_to_new = -np.ones(self.n_elems, dtype=np.int64)
        old_to_new[order] = np.arange(order.size)
        new_conn = self.conn[order]
        new_elem_sets = {
            name: np.arange(r[0], r[1], dtype=np.int64) for name, r in ranges.items()
        }
        new_side_sets = {}
        for name, ss in self.side_sets.items():
            ss = np.asarray(ss)
            keep = old_to_new[ss[:, 0]] >= 0
            new_ss = ss[keep].copy()
            new_ss[:, 0] = old_to_new[new_ss[:, 0]]
            new_side_sets[name] = new_ss
        m = Mesh(
            dim=self.dim,
            coords=self.coords,
            conn=new_conn,
            elem_sets=new_elem_sets,
            node_sets=dict(self.node_sets),
            side_sets=new_side_sets,
            fields=dict(self.fields),
        )
        # node order is preserved, so the smb geometry template (and
        # with it nodal fields on disk) stays valid for write_smb
        if getattr(self, "smb_template", None) is not None:
            m.smb_template = self.smb_template
            m.smb_serial_linear = getattr(self, "smb_serial_linear", False)
        return m, ranges

    def facet_nodes(self, side_set: str) -> np.ndarray:
        """Node indices of each facet in a side set: (n_faces, dim)."""
        ss = np.asarray(self.side_sets[side_set])
        lf = local_facets(self.dim)
        return self.conn[ss[:, 0][:, None], lf[ss[:, 1]]]

    def element_h(self) -> np.ndarray:
        """Stabilization length per element: sqrt(mean of squared edge
        lengths), matching the reference's get_size
        (source/calibr8/src/mechanics.cpp:104-115)."""
        conn = self.conn
        x = self.coords[conn]  # (n_elem, npe, dim)
        npe = conn.shape[1]
        pairs = [(i, j) for i in range(npe) for j in range(i + 1, npe)]
        l2 = np.stack(
            [((x[:, i] - x[:, j]) ** 2).sum(axis=1) for (i, j) in pairs], axis=1
        )
        return np.sqrt(l2.mean(axis=1))

    def validate(self) -> None:
        assert self.conn.min() >= 0 and self.conn.max() < self.n_nodes
        assert self.conn.shape[1] == self.dim + 1
        for name, idx in self.node_sets.items():
            assert np.asarray(idx).ndim == 1, name


def snap_nodes(mesh, magnitude: float, seed: int = 0, boundary_fixed=True):
    """Randomly perturb interior mesh nodes by up to `magnitude`
    (the analog of snap_nodes, reference: source/calibr8/src/snap.cpp) —
    used to break structured-mesh symmetry in convergence studies.
    Nodes in any node set stay fixed when boundary_fixed."""
    import numpy as np

    rng = np.random.default_rng(seed)
    coords = np.asarray(mesh.coords).copy()
    move = np.ones(coords.shape[0], dtype=bool)
    if boundary_fixed:
        for nodes in mesh.node_sets.values():
            move[np.asarray(nodes)] = False
    coords[move] += magnitude * rng.uniform(-1, 1, coords[move].shape)
    mesh.coords = coords
    return mesh

"""Uniform nested refinement for adjoint error estimation/verification.

Re-design of NestedDisc (reference: source/calibr8/src/nested.{hpp,cpp}):
instead of copying the PUMI mesh and running MeshAdapt uniform
refinement with vertex tagging, the refinement is a pure index
construction: every edge gets a midpoint node, each triangle splits into
4 children, each tet into 8 (corner tets + octahedron split along the
shortest... here a fixed consistent diagonal), and the prolongation is
the (parent-node-pair) averaging map.

Returns the fine Mesh plus:
  node_parents : (n_fine_nodes, 2)  original nodes avg'd to make node
                 (a, a) for original vertices
  elem_parent  : (n_fine_elems,)    coarse parent element per child
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from calibr8_tpu.mesh.mesh import Mesh, local_facets


@dataclass
class Refinement:
    fine: Mesh
    node_parents: np.ndarray  # (n_fine_nodes, 2)
    elem_parent: np.ndarray  # (n_fine_elems,)

    def prolong_nodal(self, values: np.ndarray) -> np.ndarray:
        """Prolong coarse nodal values to the fine mesh (P1 interp:
        midpoints average their edge endpoints)."""
        a = values[self.node_parents[:, 0]]
        b = values[self.node_parents[:, 1]]
        return 0.5 * (a + b)

    def prolong_elemwise(self, values: np.ndarray) -> np.ndarray:
        """Children inherit the parent element's (IP) value —
        reference: 'prolonged_<name>' fields (disc.cpp:686-700)."""
        return values[self.elem_parent]

    def restrict_elem_sum(self, fine_values: np.ndarray) -> np.ndarray:
        """Sum child-element contributions onto parents (error
        localization onto the base mesh, nested.hpp set_error)."""
        n_coarse = self.elem_parent.max() + 1
        out = np.zeros(n_coarse, dtype=fine_values.dtype)
        np.add.at(out, self.elem_parent, fine_values)
        return out


def uniform_refine(mesh: Mesh) -> Refinement:
    dim = mesh.dim
    conn = np.asarray(mesh.conn)
    n_nodes = mesh.n_nodes
    npe = conn.shape[1]

    # collect unique edges
    pairs = [(i, j) for i in range(npe) for j in range(i + 1, npe)]
    edges = np.concatenate(
        [np.sort(conn[:, [i, j]], axis=1) for (i, j) in pairs], axis=0
    )
    from calibr8_tpu import native

    ue = native.unique_edges(edges)
    if ue is not None:
        uniq, inv = ue
    else:
        uniq, inv = np.unique(edges, axis=0, return_inverse=True)
    n_edges = uniq.shape[0]
    mid_of = inv.reshape(len(pairs), -1)  # (n_pairs, n_elem) -> midpoint ids

    coords = np.concatenate(
        [mesh.coords, 0.5 * (mesh.coords[uniq[:, 0]] + mesh.coords[uniq[:, 1]])],
        axis=0,
    )
    node_parents = np.concatenate(
        [np.stack([np.arange(n_nodes)] * 2, axis=1), uniq], axis=0
    )

    def mid(e, i, j):
        k = pairs.index((min(i, j), max(i, j)))
        return n_nodes + mid_of[k, e]

    n_elem = conn.shape[0]
    mids_tab = n_nodes + mid_of  # (n_pairs, n_elem) midpoint NODE ids
    nat = native.refine_children(conn, dim, mids_tab, coords)
    if nat is not None:
        fine_conn, elem_parent = nat
        return _finish_refine(
            mesh, coords, node_parents, uniq, fine_conn, elem_parent
        )

    fine_conn = []
    elem_parent = []
    for e in range(n_elem):
        v = conn[e]
        if dim == 2:
            m01, m12, m02 = mid(e, 0, 1), mid(e, 1, 2), mid(e, 0, 2)
            children = [
                (v[0], m01, m02),
                (v[1], m12, m01),
                (v[2], m02, m12),
                (m01, m12, m02),
            ]
        else:
            m01, m02, m03 = mid(e, 0, 1), mid(e, 0, 2), mid(e, 0, 3)
            m12, m13, m23 = mid(e, 1, 2), mid(e, 1, 3), mid(e, 2, 3)
            children = [
                (v[0], m01, m02, m03),
                (v[1], m01, m12, m13),
                (v[2], m02, m12, m23),
                (v[3], m03, m13, m23),
                # octahedron split along the m01-m23 diagonal
                (m01, m12, m02, m23),
                (m01, m12, m23, m13),
                (m01, m02, m03, m23),
                (m01, m03, m13, m23),
            ]
        for c in children:
            c = list(c)
            p = coords[c]
            det = np.linalg.det(p[1:] - p[0])
            if det < 0:
                c[1], c[2] = c[2], c[1]
            fine_conn.append(c)
            elem_parent.append(e)

    fine_conn = np.asarray(fine_conn, dtype=np.int64)
    elem_parent = np.asarray(elem_parent, dtype=np.int64)
    return _finish_refine(mesh, coords, node_parents, uniq, fine_conn, elem_parent)


def _finish_refine(mesh, coords, node_parents, uniq, fine_conn, elem_parent):
    """Propagate node/side/element sets to the refined mesh."""
    dim = mesh.dim
    conn = np.asarray(mesh.conn)
    n_nodes = mesh.n_nodes

    # node sets: originals + midpoints whose both endpoints are members
    node_sets = {}
    for name, nodes in mesh.node_sets.items():
        member = np.zeros(n_nodes, dtype=bool)
        member[np.asarray(nodes)] = True
        mid_in = member[uniq[:, 0]] & member[uniq[:, 1]]
        node_sets[name] = np.concatenate(
            [np.asarray(nodes), n_nodes + np.where(mid_in)[0]]
        )

    # side sets: boundary facets of children classified by parent facet
    lf = local_facets(dim)
    side_sets = {}
    for name, ss in mesh.side_sets.items():
        ss = np.asarray(ss)
        # nodes allowed on this side set: parent facet nodes + their
        # edge midpoints
        allowed = np.zeros(coords.shape[0], dtype=bool)
        parent_elems = set()
        for pe, pf in ss:
            fnodes = conn[pe, lf[pf]]
            allowed[fnodes] = True
            parent_elems.add(int(pe))
            for i in range(len(fnodes)):
                for j in range(i + 1, len(fnodes)):
                    a, b = sorted((int(fnodes[i]), int(fnodes[j])))
                    allowed[n_nodes + _edge_id(uniq, a, b)] = True
        out = []
        for fe in range(fine_conn.shape[0]):
            if int(elem_parent[fe]) not in parent_elems:
                continue
            for f in range(lf.shape[0]):
                fn = fine_conn[fe, lf[f]]
                if allowed[fn].all():
                    out.append((fe, f))
        side_sets[name] = np.asarray(out, dtype=np.int64).reshape(-1, 2)

    elem_sets = {
        name: np.where(np.isin(elem_parent, np.asarray(idx)))[0]
        for name, idx in mesh.elem_sets.items()
    }

    # -- lattice renumbering ------------------------------------------
    # The append-midpoints numbering above destroys the constant
    # neighbor-offset structure of refined builtin cubes/squares: node
    # i's neighbors land at O(n) distinct offsets, so the ELL stencil
    # canonicalization (solve/ellpack.ell_maps_from_conn) — which turns
    # the Krylov matvec's neighbor gather into static slices — can
    # never fire on the scale-bench refinement chains.  When the fine
    # nodes form a full regular lattice, renumber lexicographically
    # (x fastest): connectivity from refining a structured mesh is then
    # translation-invariant and the stencil path applies at every MG
    # level.  All consumers index node_parents/coords/conn by fine node
    # id, so the permutation is transparent.
    order = _lattice_order(coords)
    if order is not None:
        old2new = np.empty(coords.shape[0], dtype=np.int64)
        old2new[order] = np.arange(coords.shape[0])
        coords = coords[order]
        fine_conn = old2new[fine_conn]
        node_parents = node_parents[order]
        node_sets = {k: old2new[v] for k, v in node_sets.items()}

    fine = Mesh(
        dim=dim,
        coords=coords,
        conn=fine_conn,
        elem_sets=elem_sets,
        node_sets=node_sets,
        side_sets=side_sets,
        fields={},
    )
    return Refinement(fine=fine, node_parents=node_parents, elem_parent=elem_parent)


def _lattice_order(coords: np.ndarray):
    """Old-id order (new_id -> old_id) for lexicographic (…, z, y, x)
    numbering when the nodes form a FULL regular lattice — the refined
    builtin cube/square chains.  Returns None otherwise (unstructured
    meshes keep the append-midpoints numbering)."""
    n, dim = coords.shape
    idx = []
    sizes = []
    for d in range(dim):
        c = coords[:, d]
        lo, span = c.min(), c.max() - c.min()
        if span <= 0.0:
            return None
        # quantize against float fuzz (midpoints are exact averages of
        # generator linspace values; 2^-40 of the bbox is far below any
        # real node spacing)
        q = np.round((c - lo) / span * (1 << 40)).astype(np.int64)
        u = np.unique(q)
        idx.append(np.searchsorted(u, q))
        sizes.append(len(u))
    total = 1
    for s in sizes:
        total *= s
    if total != n:
        return None
    key = idx[dim - 1]
    for d in range(dim - 2, -1, -1):
        key = key * sizes[d] + idx[d]
    # bijection onto the full grid (counts match + keys unique)
    order = np.argsort(key)
    if len(np.unique(key)) != n:
        return None
    return order


def _edge_id(uniq: np.ndarray, a: int, b: int) -> int:
    """Index of sorted edge (a, b) in the unique edge array."""
    key = np.array([a, b])
    lo = np.searchsorted(uniq[:, 0], a, side="left")
    hi = np.searchsorted(uniq[:, 0], a, side="right")
    sub = uniq[lo:hi, 1]
    return lo + int(np.searchsorted(sub, b))

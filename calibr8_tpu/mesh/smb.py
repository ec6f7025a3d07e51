"""PUMI MDS (.smb) binary mesh reader.

The reference ships its test/example meshes in SCOREC PUMI's native
binary format (reference: test/mesh/*/ *.smb, loaded via apf::loadMdsMesh
in disc.cpp:32-38).  This reader parses the format directly so the
reference's EXACT meshes run in this framework (golden QoI parity on the
reference's own discretizations).

Format (reverse-engineered from mds_write, verified on the reference
meshes; all integers/doubles big-endian):

  int32[4]   magic=0, version, dimension, ??? (1)
  int32[8]   entity counts per MDS type
             [vertex, edge, triangle, quad, -, -, -, tet] (observed)
  conn       per non-vertex type with count > 0: count x down-degree
             int32 ids of the one-dimension-down entities
             (edges -> 2 verts, tris -> 3 edges, tets -> 4 tris)
  float64[nv*3]  vertex coordinates
  float64[nv*2]  vertex parametric coordinates
  int32      one pad/flag int
  (tag, dim) int32 pairs  geometric classification per entity, all
             types in count order
  ...        parallel remotes/matches + field tags (ignored here)

Sets are named via the same assoc files as the gmsh path
(mesh/gmsh.py parse_assoc; disc.hpp:80-86): node sets take the
classification closure of the named model entity.
"""

from __future__ import annotations

import struct

import numpy as np

from calibr8_tpu.mesh.gmsh import parse_assoc
from calibr8_tpu.mesh.mesh import Mesh, local_facets

# MDS type order with downward degrees (only simplex types supported)
_TYPE_DOWN_DEGREE = [0, 2, 3, 4, 0, 0, 0, 4]  # vert, edge, tri, quad, .., tet
_TYPE_DIM = [0, 1, 2, 2, 3, 3, 3, 3]


def read_smb(path, assoc_file=None) -> Mesh:
    data = open(path, "rb").read()
    off = 0

    def ints(n):
        nonlocal off
        v = np.frombuffer(data, dtype=">i4", count=n, offset=off)
        off += 4 * n
        return v.astype(np.int64)

    def doubles(n):
        nonlocal off
        v = np.frombuffer(data, dtype=">f8", count=n, offset=off)
        off += 8 * n
        return np.asarray(v)

    magic, version, dim, _ = ints(4)
    assert magic == 0, f"not an smb file: magic {magic}"
    counts = ints(8)
    nv = int(counts[0])

    conn = {}
    for t in range(1, 8):
        c = int(counts[t])
        if c == 0:
            continue
        deg = _TYPE_DOWN_DEGREE[t]
        assert deg > 0, f"unsupported entity type {t}"
        conn[t] = ints(c * deg).reshape(c, deg)

    coords = doubles(nv * 3).reshape(nv, 3)
    _params = doubles(nv * 2)

    # classification (tag, dim) pairs for every entity in type order,
    # preceded by one flag int
    _flag = ints(1)
    classification = {}
    order = [0, 1, 2, 3, 7]
    for t in order:
        c = int(counts[t])
        if c == 0:
            continue
        pairs = ints(2 * c).reshape(c, 2)
        classification[t] = pairs[:, ::-1]  # store as [:, 0] = dim, [:, 1] = tag

    # ---- resolve downward adjacencies to vertices --------------------
    edges = conn.get(1)
    tri_edges = conn.get(2)
    tet_tris = conn.get(7)

    def tri_to_verts(tri_edge_ids):
        e0 = edges[tri_edge_ids[:, 0]]
        e1 = edges[tri_edge_ids[:, 1]]
        v0 = e0[:, 0]
        v1 = e0[:, 1]
        v2 = np.where(
            (e1[:, 0] == v0) | (e1[:, 0] == v1), e1[:, 1], e1[:, 0]
        )
        return np.stack([v0, v1, v2], axis=1)

    if dim == 2:
        elem_conn = tri_to_verts(tri_edges)
        elem_type = 2
    else:
        tri_verts = tri_to_verts(tri_edges)
        f0 = tri_verts[tet_tris[:, 0]]  # (n_tet, 3)
        f1 = tri_verts[tet_tris[:, 1]]
        v3 = np.full(len(tet_tris), -1, dtype=np.int64)
        for k in range(3):
            cand = f1[:, k]
            new = (
                (cand != f0[:, 0]) & (cand != f0[:, 1]) & (cand != f0[:, 2])
            )
            v3 = np.where((v3 < 0) & new, cand, v3)
        assert np.all(v3 >= 0)
        elem_conn = np.concatenate([f0, v3[:, None]], axis=1)
        elem_type = 7

    # positive orientation
    pts = coords[:, :dim][elem_conn]
    det = np.linalg.det(pts[:, 1:] - pts[:, :1])
    flip = det < 0
    elem_conn[flip, 1], elem_conn[flip, 2] = (
        elem_conn[flip, 2].copy(),
        elem_conn[flip, 1].copy(),
    )

    mesh_coords = coords[:, :dim]

    elem_sets, node_sets, side_sets = {}, {}, {}
    if assoc_file:
        sets = parse_assoc(assoc_file)
        e_cls = classification[elem_type]
        for name, ents in sets["elem"]:
            mask = np.zeros(len(elem_conn), dtype=bool)
            for (d, t) in ents:
                mask |= (e_cls[:, 0] == d) & (e_cls[:, 1] == t)
            elem_sets[name] = np.where(mask)[0]

        v_cls = classification[0]
        for name, ents in sets["node"]:
            # closure: a vertex classified on the named entity OR on a
            # lower-dim entity adjacent to it (collectEntityModels,
            # disc.cpp:519-538).  Adjacency of model entities is not in
            # the smb file; use the mesh: vertices of any EDGE/FACE
            # classified on the entity.
            nodes = set()
            for (d, t) in ents:
                on = (v_cls[:, 0] == d) & (v_cls[:, 1] == t)
                nodes.update(np.where(on)[0].tolist())
                if d >= 1 and edges is not None:
                    ec = classification[1]
                    sel = (ec[:, 0] == d) & (ec[:, 1] == t)
                    nodes.update(edges[sel].reshape(-1).tolist())
                if d >= 2 and tri_edges is not None:
                    tc = classification[2]
                    sel = (tc[:, 0] == d) & (tc[:, 1] == t)
                    tv = tri_to_verts(tri_edges[sel]) if sel.any() else []
                    for row in tv:
                        nodes.update(row.tolist())
            node_sets[name] = np.asarray(sorted(nodes), dtype=np.int64)

        # side sets: boundary facets classified on the named entities
        lf = local_facets(dim)
        facet_owner = {}
        for e in range(elem_conn.shape[0]):
            for fidx in range(lf.shape[0]):
                key = tuple(sorted(elem_conn[e, lf[fidx]].tolist()))
                facet_owner[key] = None if key in facet_owner else (e, fidx)
        facet_type = 1 if dim == 2 else 2
        f_cls = classification[facet_type]
        if dim == 2:
            facet_verts = edges
        else:
            facet_verts = tri_verts
        for name, ents in sets["side"]:
            out = []
            for (d, t) in ents:
                sel = (f_cls[:, 0] == d) & (f_cls[:, 1] == t)
                for row in facet_verts[sel]:
                    key = tuple(sorted(row.tolist()))
                    owner = facet_owner.get(key)
                    if owner is not None:
                        out.append(owner)
            side_sets[name] = np.asarray(sorted(out), dtype=np.int64).reshape(-1, 2)
    else:
        elem_sets["body"] = np.arange(elem_conn.shape[0])

    return Mesh(
        dim=dim,
        coords=mesh_coords,
        conn=elem_conn,
        elem_sets=elem_sets,
        node_sets=node_sets,
        side_sets=side_sets,
    )

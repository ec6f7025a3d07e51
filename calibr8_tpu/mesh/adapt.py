"""Error-driven mesh adaptation.

Re-design of the reference adaptivity (source/calibr8/src/mesh_size.cpp
get_iso_target_size + main_error.cpp ma::adapt cycles): the size-field
computation is reproduced exactly (optimal-mesh equidistribution with
alpha/beta safeguards); the remesh step uses conforming longest-edge
bisection — Rivara recursion in 2D, and in 3D global longest-edge
splits (bisecting an edge simultaneously in EVERY incident tet is
conforming by construction: all shared faces containing the edge split
identically).  The reference delegates this step to MeshAdapt's
ma::adapt."""

from __future__ import annotations

import numpy as np

from calibr8_tpu.mesh.mesh import Mesh


def iso_target_size(mesh: Mesh, elem_error: np.ndarray, target: int, p_order: int = 1):
    """Per-element target size h_new (mesh_size.cpp:38-80):

      G = sum |e_K|^(2d/(2p+d));  size_factor = (G/N)^(1/d)
      h_new = size_factor * |e_K|^(-2/(2p+d)) * h,  clamped to
              [alpha h, beta h] with alpha = 0.25, beta = 2.
    """
    d = mesh.dim
    p = p_order
    err = np.abs(np.asarray(elem_error)) + 1e-300
    G = np.sum(err ** (2.0 * d / (2.0 * p + d)))
    size_factor = (G / target) ** (1.0 / d)
    h = mesh.element_h()
    h_new = size_factor * err ** (-2.0 / (2.0 * p + d)) * h
    return np.clip(h_new, 0.25 * h, 2.0 * h)


def _edge_key(a, b):
    return (a, b) if a < b else (b, a)


def bisect_2d(mesh: Mesh, marked: np.ndarray) -> Mesh:
    """Conforming longest-edge (Rivara) bisection of marked triangles.

    Propagates marks so every bisected edge is the longest edge of all
    its adjacent marked triangles; node/side/elem sets are rebuilt from
    the parent sets (midpoints join a node set when both edge endpoints
    are members)."""
    assert mesh.dim == 2
    conn = [list(t) for t in np.asarray(mesh.conn)]
    coords = [c for c in np.asarray(mesh.coords)]
    parent = list(range(len(conn)))

    def longest_edge(tri):
        pts = [coords[v] for v in tri]
        lens = [
            np.sum((pts[(i + 1) % 3] - pts[(i + 2) % 3]) ** 2) for i in range(3)
        ]
        lmax = max(lens)
        # deterministic tie-break by global edge key so both triangles
        # sharing an edge agree (ties otherwise cycle the recursion)
        cands = [
            _edge_key(tri[(i + 1) % 3], tri[(i + 2) % 3])
            for i in range(3)
            if lens[i] >= lmax * (1.0 - 1e-12)
        ]
        return min(cands)

    midpoints: dict[tuple, int] = {}

    def midpoint(a, b):
        key = _edge_key(a, b)
        if key not in midpoints:
            coords.append(0.5 * (coords[a] + coords[b]))
            midpoints[key] = len(coords) - 1
        return midpoints[key]

    # worklist of element indices to bisect (duplicates allowed; dead
    # entries are skipped on pop)
    work = list(np.where(np.asarray(marked))[0])
    alive = [True] * len(conn)

    guard = 0
    while work:
        guard += 1
        if guard > 100 * len(conn):
            raise RuntimeError("bisection failed to terminate")
        e = work.pop()
        if not alive[e]:
            continue
        tri = conn[e]
        a, b = longest_edge(tri)
        del tri
        # neighbor sharing edge (a, b)
        nbr = None
        for j, t in enumerate(conn):
            if j != e and alive[j] and a in t and b in t:
                nbr = j
                break
        if nbr is not None:
            if longest_edge(conn[nbr]) != _edge_key(a, b):
                # refine the neighbor first (Rivara recursion): e goes
                # back under the neighbor so the neighbor pops first
                work.append(e)
                work.append(nbr)
                continue
        m = midpoint(a, b)

        def split(idx):
            t = conn[idx]
            c = [v for v in t if v not in (a, b)][0]
            alive[idx] = False
            for half in ([c, a, m], [c, m, b]):
                conn.append(half)
                parent.append(parent[idx])
                alive.append(True)

        split(e)
        if nbr is not None:
            split(nbr)

    keep = [i for i, al in enumerate(alive) if al]
    new_conn = np.asarray([conn[i] for i in keep], dtype=np.int64)
    new_parent = np.asarray([parent[i] for i in keep])
    new_coords = np.asarray(coords)

    # orientation fix
    p0 = new_coords[new_conn]
    det = (p0[:, 1, 0] - p0[:, 0, 0]) * (p0[:, 2, 1] - p0[:, 0, 1]) - (
        p0[:, 1, 1] - p0[:, 0, 1]
    ) * (p0[:, 2, 0] - p0[:, 0, 0])
    flip = det < 0
    new_conn[flip, 1], new_conn[flip, 2] = (
        new_conn[flip, 2].copy(),
        new_conn[flip, 1].copy(),
    )

    n_old = mesh.n_nodes
    node_sets = {}
    for name, nodes in mesh.node_sets.items():
        member = np.zeros(n_old, dtype=bool)
        member[np.asarray(nodes)] = True
        new = list(np.asarray(nodes))
        for (na, nb), mid in midpoints.items():
            if member[na] and member[nb]:
                new.append(mid)
        node_sets[name] = np.asarray(sorted(new), dtype=np.int64)

    elem_sets = {}
    for name, idx in mesh.elem_sets.items():
        mask = np.zeros(mesh.n_elems, dtype=bool)
        mask[np.asarray(idx)] = True
        elem_sets[name] = np.where(mask[new_parent])[0]

    out = Mesh(
        dim=2,
        coords=new_coords,
        conn=new_conn,
        elem_sets=elem_sets,
        node_sets=node_sets,
        side_sets={},
        fields=dict(mesh.fields),
    )
    # rebuild side sets geometrically from parent facet membership
    from calibr8_tpu.mesh.generators import _build_side_set

    for name, nodes in node_sets.items():
        member = np.zeros(new_coords.shape[0], dtype=bool)
        member[nodes] = True
        ss = _build_side_set(
            2, new_conn, new_coords, lambda p, mm=member: np.ones(p.shape[0], bool)
        )
        # keep only facets whose nodes are all in the node set
        keep_f = []
        from calibr8_tpu.mesh.mesh import local_facets

        lf = local_facets(2)
        for (e, f) in ss:
            if member[new_conn[e, lf[f]]].all():
                keep_f.append((e, f))
        if keep_f and name in mesh.side_sets:
            out.side_sets[name] = np.asarray(keep_f, dtype=np.int64)
    return out


def bisect_3d(mesh: Mesh, marked: np.ndarray) -> Mesh:
    """Local 3D refinement: for every marked tet, split its longest edge
    in ALL incident tets (each such tet splits in two by replacing one
    edge endpoint with the midpoint — shared faces split identically, so
    the mesh stays conforming with no closure recursion)."""
    assert mesh.dim == 3
    conn = [list(t) for t in np.asarray(mesh.conn)]
    coords = [c for c in np.asarray(mesh.coords)]
    parent = list(range(len(conn)))
    alive = [True] * len(conn)

    # vertex -> set of alive element ids (incremental incidence)
    v2e: dict[int, set] = {}
    for e, t in enumerate(conn):
        for v in t:
            v2e.setdefault(v, set()).add(e)

    def longest_edge(tet):
        best = None
        best_l = -1.0
        for i in range(4):
            for j in range(i + 1, 4):
                l = float(np.sum((coords[tet[i]] - coords[tet[j]]) ** 2))
                key = _edge_key(tet[i], tet[j])
                if l > best_l * (1.0 + 1e-12) or (
                    l >= best_l * (1.0 - 1e-12) and (best is None or key < best)
                ):
                    if l > best_l:
                        best_l = l
                    best = key
        return best

    midpoints: dict[tuple, int] = {}

    def midpoint(a, b):
        key = _edge_key(a, b)
        if key not in midpoints:
            coords.append(0.5 * (coords[a] + coords[b]))
            midpoints[key] = len(coords) - 1
            v2e.setdefault(midpoints[key], set())
        return midpoints[key]

    for e in np.where(np.asarray(marked))[0]:
        e = int(e)
        if not alive[e]:
            continue  # already split through a neighbor's edge
        a, b = longest_edge(conn[e])
        m = midpoint(a, b)
        incident = sorted(v2e.get(a, set()) & v2e.get(b, set()))
        for t_id in incident:
            if not alive[t_id]:
                continue
            tet = conn[t_id]
            alive[t_id] = False
            for v in tet:
                v2e[v].discard(t_id)
            for old, new in ((a, m), (b, m)):
                child = [new if v == old else v for v in tet]
                conn.append(child)
                parent.append(parent[t_id])
                alive.append(True)
                cid = len(conn) - 1
                for v in child:
                    v2e.setdefault(v, set()).add(cid)

    keep = [i for i, al in enumerate(alive) if al]
    new_conn = np.asarray([conn[i] for i in keep], dtype=np.int64)
    new_parent = np.asarray([parent[i] for i in keep])
    new_coords = np.asarray(coords)
    return _rebuild_sets(mesh, new_coords, new_conn, new_parent, midpoints)


def _rebuild_sets(mesh, new_coords, new_conn, new_parent, midpoints) -> Mesh:
    """Propagate node/element/side sets to a bisected mesh (midpoints
    join node sets when both edge endpoints are members; side sets are
    rebuilt from node-set membership)."""
    from calibr8_tpu.mesh.mesh import local_facets

    dim = mesh.dim
    n_old = mesh.n_nodes
    node_sets = {}
    for name, nodes in mesh.node_sets.items():
        member = np.zeros(n_old, dtype=bool)
        member[np.asarray(nodes)] = True
        new = list(np.asarray(nodes))
        changed = True
        # fixed-point: midpoints of midpoint edges may chain
        allm = np.zeros(new_coords.shape[0], dtype=bool)
        allm[np.asarray(nodes)] = True
        while changed:
            changed = False
            for (na, nb), mid in midpoints.items():
                if allm[na] and allm[nb] and not allm[mid]:
                    allm[mid] = True
                    changed = True
        node_sets[name] = np.where(allm)[0].astype(np.int64)

    elem_sets = {}
    for name, idx in mesh.elem_sets.items():
        mask = np.zeros(mesh.n_elems, dtype=bool)
        mask[np.asarray(idx)] = True
        elem_sets[name] = np.where(mask[new_parent])[0]

    out = Mesh(
        dim=dim,
        coords=new_coords,
        conn=new_conn,
        elem_sets=elem_sets,
        node_sets=node_sets,
        side_sets={},
        fields=dict(mesh.fields),
    )
    # boundary facets whose nodes all belong to the (refined) node set
    lf = local_facets(dim)
    # count facet occurrences to find the boundary
    from collections import Counter

    fc = Counter()
    for e in range(new_conn.shape[0]):
        for f in range(lf.shape[0]):
            fc[tuple(sorted(new_conn[e, lf[f]]))] += 1
    for name in node_sets:
        if name not in mesh.side_sets:
            continue
        member = np.zeros(new_coords.shape[0], dtype=bool)
        member[node_sets[name]] = True
        keep_f = []
        for e in range(new_conn.shape[0]):
            for f in range(lf.shape[0]):
                fn = new_conn[e, lf[f]]
                if member[fn].all() and fc[tuple(sorted(fn))] == 1:
                    keep_f.append((e, f))
        out.side_sets[name] = np.asarray(keep_f, dtype=np.int64).reshape(-1, 2)
    return out


def adapt_mesh(mesh: Mesh, elem_error: np.ndarray, target: int) -> Mesh:
    """One adaptation pass: mark elements whose current size exceeds the
    target size field and bisect them (2D Rivara / 3D global
    longest-edge splits)."""
    h_new = iso_target_size(mesh, elem_error, target)
    h = mesh.element_h()
    marked = h > h_new * 1.05
    if mesh.dim == 2:
        return bisect_2d(mesh, marked)
    return bisect_3d(mesh, marked)

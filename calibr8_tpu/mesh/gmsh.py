"""Gmsh (.msh v2.2 ASCII) mesh reader with assoc-file set naming.

The reference's meshes are produced by gmsh from gmodel geometry and
converted to PUMI .smb (reference: test/mesh/*/Makefile: gmsh -3 ...
-format msh2; from_gmsh), with an "assoc" text file naming element/
side/node sets by (geometric dim, tag)
(reference: source/calibr8/src/disc.hpp:80-86, test/mesh/notch2D/notch2D.txt).

This reader consumes the SAME msh2 + assoc inputs directly: elements
carry their elementary geometric tag; node sets take the closure of the
named geometric entity (matching apf::collectEntityModels semantics —
disc.cpp:519-538: a mesh vertex classified on the boundary of the named
entity is included).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from calibr8_tpu.mesh.mesh import Mesh, local_facets

# gmsh element type -> (dim, n_nodes)
_GMSH_TYPES = {
    15: (0, 1),  # point
    1: (1, 2),  # line
    2: (2, 3),  # triangle
    4: (3, 4),  # tetra
}


def parse_assoc(path):
    """Parse the assoc file: entries `<kind> set <name> <n>` followed by
    n lines of `<dim> <tag>` (disc.hpp:48 read_sets)."""
    sets = {"elem": [], "side": [], "node": []}
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i < len(lines):
        head = lines[i].split()
        kind, _, name, count = head[0], head[1], head[2], int(head[3])
        ents = []
        for k in range(count):
            d, t = lines[i + 1 + k].split()
            ents.append((int(d), int(t)))
        sets[kind].append((name, ents))
        i += 1 + count
    return sets


def read_msh(path, assoc_file=None) -> Mesh:
    with open(path) as f:
        lines = f.read().splitlines()

    def section(name):
        start = lines.index(f"${name}") + 1
        end = lines.index(f"$End{name}")
        return lines[start:end]

    fmt = section("MeshFormat")[0].split()
    assert fmt[0].startswith("2."), f"only msh v2 ASCII supported, got {fmt[0]}"

    node_lines = section("Nodes")
    n_nodes = int(node_lines[0])
    coords = np.zeros((n_nodes, 3))
    id_map = {}
    for i, ln in enumerate(node_lines[1:]):
        parts = ln.split()
        id_map[int(parts[0])] = i
        coords[i] = [float(v) for v in parts[1:4]]

    elem_lines = section("Elements")
    # entities[dim][tag] -> list of node tuples
    entities: dict[int, dict[int, list]] = defaultdict(lambda: defaultdict(list))
    max_dim = 0
    for ln in elem_lines[1:]:
        parts = [int(v) for v in ln.split()]
        etype = parts[1]
        if etype not in _GMSH_TYPES:
            continue
        dim, nn = _GMSH_TYPES[etype]
        ntags = parts[2]
        # tags: [physical, elementary, ...]; classification = elementary
        elementary = parts[3 + 1] if ntags >= 2 else (parts[3] if ntags else 0)
        nodes = [id_map[v] for v in parts[3 + ntags:]]
        assert len(nodes) == nn
        entities[dim][elementary].append(nodes)
        max_dim = max(max_dim, dim)

    dim = max_dim
    coords = coords[:, :dim]

    # volume elements with their elementary tags
    conn, elem_tags = [], []
    for tag, elems in entities[dim].items():
        for nodes in elems:
            # positive orientation
            p = coords[nodes]
            det = np.linalg.det(p[1:] - p[0])
            if det < 0:
                nodes = [nodes[0], nodes[2], nodes[1]] + nodes[3:]
            conn.append(nodes)
            elem_tags.append(tag)
    conn = np.asarray(conn, dtype=np.int64)
    elem_tags = np.asarray(elem_tags)

    # node classification closure: nodes of entity (d, t) for d < dim
    def entity_nodes(d, t):
        out = set()
        for nodes in entities[d].get(t, []):
            out.update(nodes)
        return out

    elem_sets, node_sets, side_sets = {}, {}, {}
    if assoc_file:
        sets = parse_assoc(assoc_file)
        for name, ents in sets["elem"]:
            mask = np.zeros(len(conn), dtype=bool)
            for (d, t) in ents:
                assert d == dim
                mask |= elem_tags == t
            elem_sets[name] = np.where(mask)[0]
        for name, ents in sets["node"]:
            nodes = set()
            for (d, t) in ents:
                nodes |= entity_nodes(d, t)
                # closure: lower-dim entities' nodes that appear in this
                # entity's element nodes are already included via the
                # element node lists (gmsh writes closure nodes in its
                # boundary elements); additionally pull tagged points
            node_sets[name] = np.asarray(sorted(nodes), dtype=np.int64)
        # side sets: boundary facets classified on the named entities
        lf = local_facets(dim)
        facet_owner = {}
        for e in range(conn.shape[0]):
            for fidx in range(lf.shape[0]):
                key = tuple(sorted(conn[e, lf[fidx]].tolist()))
                if key in facet_owner:
                    facet_owner[key] = None  # interior
                else:
                    facet_owner[key] = (e, fidx)
        for name, ents in sets["side"]:
            fset = []
            for (d, t) in ents:
                assert d == dim - 1
                for nodes in entities[d].get(t, []):
                    key = tuple(sorted(nodes))
                    owner = facet_owner.get(key)
                    if owner is not None:
                        fset.append(owner)
            side_sets[name] = np.asarray(sorted(fset), dtype=np.int64).reshape(-1, 2)
    else:
        elem_sets["body"] = np.arange(conn.shape[0])

    return Mesh(
        dim=dim,
        coords=coords,
        conn=conn,
        elem_sets=elem_sets,
        node_sets=node_sets,
        side_sets=side_sets,
    )

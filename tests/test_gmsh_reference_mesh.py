"""Run reference decks on the reference's OWN gmsh mesh — exact-mesh
golden QoI parity (reference: test/mesh/cube/cube.msh + cube.txt,
test/primal/cube_*.yaml.in)."""

import os

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.mesh.gmsh import read_msh
from calibr8_tpu.problem import Problem

from tests.decks import BCS_3D, HYPER_MAT, make_deck

REF_MESH = "/root/reference/source/calibr8/test/mesh/cube/cube.msh"
REF_ASSOC = "/root/reference/source/calibr8/test/mesh/cube/cube.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MESH), reason="reference mesh not available"
)


def test_cube_hyper_j2_on_reference_mesh():
    """cube_hyper_J2 golden 1.57817536611772440e-2 (rel tol 1e-4,
    test/primal/cube_hyper_J2.yaml.in:48-49) on the reference's exact
    14-node cube mesh."""
    mesh = read_msh(REF_MESH, assoc_file=REF_ASSOC)
    deck = make_deck({"type": "cube", "n": 2}, "hyper_J2", HYPER_MAT, BCS_3D(0.01), 10)
    prob = Problem(load_deck(deck), mesh=mesh)
    traj = prob.solve_primal()
    golden = 1.57817536611772440e-2
    rel = abs(traj.J - golden) / golden
    assert rel < 1e-4, f"J = {traj.J:.14e} (rel {rel:.2e})"


def test_mesh_sets_match_geometry():
    mesh = read_msh(REF_MESH, assoc_file=REF_ASSOC)
    assert mesh.n_nodes == 14 and mesh.n_elems == 24
    for name, pred in [
        ("xmin", lambda c: c[:, 0] < 1e-9),
        ("ymin", lambda c: c[:, 1] < 1e-9),
        ("zmin", lambda c: c[:, 2] < 1e-9),
        ("ymax", lambda c: c[:, 1] > 1 - 1e-9),
    ]:
        assert np.all(pred(mesh.coords[mesh.node_sets[name]])), name

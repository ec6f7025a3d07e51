"""smb writer + in-mesh field tags: the reference persists synthetic /
measured DIC displacements as nodal fields INSIDE the native mesh
(reference: synthetic.hpp:15-18, main_primal.cpp:193-196, fields read
back by the calibration QoI calibration.cpp:179-180).  Field-free
writes must round-trip the PUMI-written part file byte-identically."""

import os

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.mesh.smb import read_smb, write_smb
from calibr8_tpu.problem import Problem

M = "/root/reference/source/calibr8/test/mesh"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(M), reason="reference meshes not available"
)


def test_fieldless_write_is_byte_identical(tmp_path):
    src = f"{M}/notch2D/notch2D0.smb"
    mesh = read_smb(src, f"{M}/notch2D/notch2D.txt")
    out = tmp_path / "rt.smb"
    write_smb(mesh, out)
    assert open(src, "rb").read() == open(out, "rb").read()


@pytest.mark.smoke
def test_field_roundtrip(tmp_path):
    mesh = read_smb(f"{M}/notch2D/notch2D0.smb", f"{M}/notch2D/notch2D.txt")
    rng = np.random.default_rng(0)
    mesh.fields["measured_0"] = np.zeros((mesh.n_nodes, 2))
    mesh.fields["measured_1"] = rng.standard_normal((mesh.n_nodes, 2))
    mesh.fields["distance"] = rng.random(mesh.n_nodes)
    out = tmp_path / "fields.smb"
    write_smb(mesh, out)

    back = read_smb(out, f"{M}/notch2D/notch2D.txt")
    assert set(back.fields) == {"measured_0", "measured_1", "distance"}
    for k in mesh.fields:
        np.testing.assert_array_equal(
            np.asarray(back.fields[k]).reshape(mesh.fields[k].shape),
            mesh.fields[k],
        )
    np.testing.assert_array_equal(back.conn, mesh.conn)
    np.testing.assert_array_equal(back.coords, mesh.coords)
    for name in mesh.node_sets:
        np.testing.assert_array_equal(
            back.node_sets[name], mesh.node_sets[name]
        )


def test_calibration_from_smb_fields(tmp_path):
    """Forward solve -> synthetic fields written INTO the .smb -> fresh
    problem reads the mesh file and evaluates the calibration QoI from
    the in-mesh measured data: ~0 at truth, > 0 away from it."""
    from calibr8_tpu.io.synthetic import attach_synthetic

    from tests.decks import BCS_2D, J2_MAT, make_deck

    deck = make_deck({}, "small_J2", J2_MAT, BCS_2D(0.001), 2)
    mesh = read_smb(f"{M}/notch2D/notch2D0.smb", f"{M}/notch2D/notch2D.txt")
    prob = Problem(load_deck(deck), mesh=mesh)
    traj = prob.solve_primal()
    attach_synthetic(prob.mesh, prob.disc, traj)
    out = tmp_path / "synthetic.smb"
    write_smb(prob.mesh, out)

    mesh2 = read_smb(out, f"{M}/notch2D/notch2D.txt")
    deck2 = make_deck({}, "small_J2", J2_MAT, BCS_2D(0.001), 2)
    deck2["quantity of interest"] = {
        "type": "calibration",
        "displacement weights": [1.0, 1.0],
        "balance factor": 0.0,
        "coordinate index": 1,
        "coordinate value": float(mesh2.coords[:, 1].max()),
        "reaction force component": 1,
    }
    assert "measured_2" in mesh2.fields
    prob2 = Problem(load_deck(deck2), mesh=mesh2)
    J_truth = prob2.solve_primal().J

    # nu changes the displacement FIELD even in the elastic regime
    # (E alone only rescales stress under pure Dirichlet loading)
    soft = dict(J2_MAT, nu=0.35)
    deck3 = make_deck({}, "small_J2", soft, BCS_2D(0.001), 2)
    deck3["quantity of interest"] = deck2["quantity of interest"]
    prob3 = Problem(load_deck(deck3), mesh=read_smb(out, f"{M}/notch2D/notch2D.txt"))
    J_off = prob3.solve_primal().J
    assert abs(J_truth) < 1e-16
    assert J_off > 100 * max(abs(J_truth), 1e-30)

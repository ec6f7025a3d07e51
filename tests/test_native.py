"""Native C++ setup/graph kernels (calibr8_tpu/native): must reproduce
the numpy constructions exactly.  These cover the CPU-side machinery
the reference implements natively via PUMI/apf (disc.cpp adjacency,
MeshAdapt refinement)."""

import numpy as np
import pytest

from calibr8_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_node_incidence_matches_numpy():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 211, 5000).astype(np.int32)
    inc = native.node_incidence(ids, 211)
    order = np.argsort(ids, kind="stable").astype(np.int32)
    si = ids[order]
    starts = np.searchsorted(si, np.arange(211))
    rank = np.arange(len(ids)) - starts[si]
    ref = np.full((211, int(rank.max()) + 1), len(ids), np.int32)
    ref[si, rank] = order
    assert inc.shape == ref.shape
    assert (inc == ref).all()


def test_unique_edges_matches_numpy():
    rng = np.random.default_rng(4)
    pairs = np.sort(rng.integers(0, 97, (4000, 2)), axis=1).astype(np.int64)
    u1, i1 = native.unique_edges(pairs)
    u2, i2 = np.unique(pairs, axis=0, return_inverse=True)
    assert (u1 == u2).all()
    assert (i1 == i2.ravel()).all()


def test_refine_children_matches_python():
    """Force the Python fallback path and compare against native on the
    same cube mesh."""
    import os

    from calibr8_tpu.mesh import generators as builtin
    from calibr8_tpu.mesh.refine import uniform_refine

    mesh = builtin.cube(n=3)
    ref_native = uniform_refine(mesh)
    os.environ["CALIBR8_NATIVE"] = "0"
    native._tried, native._lib = True, None
    try:
        ref_py = uniform_refine(mesh)
    finally:
        os.environ.pop("CALIBR8_NATIVE")
        native._tried, native._lib = False, None
    assert (ref_native.fine.conn == ref_py.fine.conn).all()
    assert (ref_native.elem_parent == ref_py.elem_parent).all()
    assert np.allclose(ref_native.fine.coords, ref_py.fine.coords)
    for k in ref_py.fine.node_sets:
        assert (
            np.sort(ref_native.fine.node_sets[k])
            == np.sort(ref_py.fine.node_sets[k])
        ).all()

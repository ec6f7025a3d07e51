"""Adaptive solve-estimate-adapt cycles — the analog of the reference
`error` driver (main_error.cpp Driver::drive: estimate on a nested fine
adjoint, localize, size field from get_iso_target_size, adapt, repeat)."""

import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.error.adapt import adaptive_error_cycles
from calibr8_tpu.mesh.adapt import bisect_2d, iso_target_size
from calibr8_tpu.mesh.generators import notch2d, square

from tests.decks import BCS_2D, J2_MAT, make_deck


def test_bisection_conforming_and_area_preserving():
    mesh = notch2d(h=0.25)
    marked = np.zeros(mesh.n_elems, bool)
    marked[:6] = True
    out = bisect_2d(mesh, marked)
    assert out.n_elems > mesh.n_elems
    # conformity: every interior facet shared by exactly 2 elements
    from collections import defaultdict

    from calibr8_tpu.mesh.mesh import local_facets

    lf = local_facets(2)
    cnt = defaultdict(int)
    for e in range(out.n_elems):
        for f in range(3):
            cnt[tuple(sorted(out.conn[e, lf[f]]))] += 1
    assert max(cnt.values()) <= 2
    # total area preserved
    from calibr8_tpu.fem.geometry import compute_elem_geom

    a0 = (compute_elem_geom(mesh).detJ / 2).sum()
    a1 = (compute_elem_geom(out).detJ / 2).sum()
    assert abs(a0 - a1) / a0 < 1e-12


def test_iso_target_size_clamped():
    mesh = square(4)
    err = np.linspace(1e-8, 1e-4, mesh.n_elems)
    h_new = iso_target_size(mesh, err, target=2 * mesh.n_elems)
    h = mesh.element_h()
    assert np.all(h_new >= 0.25 * h - 1e-15)
    assert np.all(h_new <= 2.0 * h + 1e-15)


@pytest.mark.slow
def test_adaptive_cycles_reduce_error():
    deck = make_deck({"type": "notch2D", "h": 0.25}, "small_J2", J2_MAT, BCS_2D(0.003), 2)
    deck["adaptivity"] = {"solve cycles": 3}
    res = adaptive_error_cycles(load_deck(deck))
    assert len(res.cycles) == 3
    # element count grows, every estimate is exact (effectivity == 1)
    assert res.cycles[-1]["n_elems"] > res.cycles[0]["n_elems"]
    for c in res.cycles:
        assert abs(c["effectivity"] - 1.0) < 1e-8
    # the error estimate at the final adapted mesh beats the initial one
    assert abs(res.cycles[-1]["eta"]) < abs(res.cycles[0]["eta"])


def test_bisect_3d_conforming():
    """3D local refinement (global longest-edge splits): conforming,
    positively oriented, sets propagated."""
    from collections import Counter

    import numpy as np

    from calibr8_tpu.mesh.adapt import bisect_3d
    from calibr8_tpu.mesh.generators import cube
    from calibr8_tpu.mesh.mesh import local_facets

    mesh = cube(n=3)
    cen = mesh.coords[mesh.conn].mean(1)
    marked = np.linalg.norm(cen - 0.5, axis=1) < 0.3
    out = bisect_3d(mesh, marked)
    assert out.n_elems > mesh.n_elems

    lf = local_facets(3)
    fc = Counter()
    for e in range(out.n_elems):
        for f in range(lf.shape[0]):
            fc[tuple(sorted(out.conn[e, lf[f]]))] += 1
    assert max(fc.values()) <= 2  # conforming
    p = out.coords[out.conn]
    det = np.linalg.det(p[:, 1:] - p[:, :1])
    assert det.min() > 0  # positive orientation
    for name in ("xmin", "ymax", "zmin"):
        assert len(out.side_sets[name]) >= len(mesh.side_sets[name])
        assert len(out.node_sets[name]) >= len(mesh.node_sets[name])

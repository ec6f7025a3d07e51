"""Nested-space adjoint error-estimate verification — the analog of the
reference `verify` regression (reference: main_verify.cpp:193-205,
test/verify/CMakeLists.txt): the computed estimate eta plus the exact
second-order linearization remainders must equal the exact nested-space
error J^h - J^H, i.e. effectivity = 1 +- 1e-8."""

import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.error.verify import verify

from tests.decks import BCS_2D, BCS_3D, J2_MAT, make_deck

TOL = 1e-8  # the reference regression tolerance (main_verify.cpp:195-204)


def test_verify_small_j2_elastic_regime():
    deck = make_deck({"type": "notch2D", "h": 0.2}, "small_J2", J2_MAT, BCS_2D(0.002), 2)
    res = verify(load_deck(deck))
    assert abs(res.effectivity - 1.0) < TOL, res
    # sanity: the first-order estimate alone should already be close
    assert abs(res.eta / res.E_exact - 1.0) < 1e-3


def test_verify_small_j2_plastic():
    deck = make_deck({"type": "notch2D", "h": 0.2}, "small_J2", J2_MAT, BCS_2D(0.004), 3)
    res = verify(load_deck(deck))
    assert res.eta_C != 0.0  # local (constitutive) error terms active
    assert abs(res.effectivity - 1.0) < TOL, res


@pytest.mark.slow
def test_verify_hyper_j2_3d():
    """The reference's notch_hyper_J2_verify configuration (coarser
    mesh/load here): finite-deformation mixed u/p with plasticity."""
    deck = make_deck(
        {"type": "notch3D", "h": 0.25, "lz": 0.1, "nz": 1},
        "hyper_J2",
        {"E": 200e3, "nu": 0.3, "Y": 200.0, "K": 1e3, "S": 0.0, "D": 0.0, "A": 0.0, "n": 0.0},
        BCS_3D(0.001),
        2,
    )
    res = verify(load_deck(deck))
    assert abs(res.effectivity - 1.0) < TOL, res

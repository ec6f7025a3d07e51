"""SPR recovered-adjoint error estimation — the analog of the reference
spr_error driver (main_spr_error.cpp, cspr.hpp): an enhanced adjoint
from superconvergent patch recovery replaces the fine-space adjoint
solve; the estimate tracks the exact error's sign and magnitude."""

import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.error.spr import spr_error_estimate
from calibr8_tpu.error.verify import verify

from tests.decks import BCS_2D, J2_MAT, make_deck


@pytest.mark.slow
def test_spr_estimate_tracks_exact_error():
    deck = make_deck({"type": "notch2D", "h": 0.15}, "small_J2", J2_MAT, BCS_2D(0.002), 2)
    spr = spr_error_estimate(load_deck(deck))
    exact = verify(load_deck(deck))
    eff = spr.eta / exact.E_exact
    assert 0.3 < eff < 3.0, f"SPR effectivity {eff}"
    assert spr.elem_error.shape[0] == exact.elem_error.shape[0]

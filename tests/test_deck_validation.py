"""Deck validation: typo'd keys fail FAST with the key named, matching
the reference's Teuchos validateParameters discipline
(source/calibr8/src/main_primal.cpp:20-31 — driver sublists;
source/calibr8/src/small_J2.cpp:76-93 — per-model material lists)."""

import copy

import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.problem import Problem

from tests.decks import BCS_2D, J2_MAT, NOTCH2D, make_deck


def _deck():
    return make_deck(NOTCH2D, "small_J2", dict(J2_MAT), BCS_2D(0.001), 1)


@pytest.mark.smoke
def test_unknown_root_sublist_fails_fast():
    deck = _deck()
    deck["dirichlet bcss"] = deck.pop("dirichlet bcs")  # typo
    with pytest.raises(ValueError, match="dirichlet bcss"):
        load_deck(deck)


@pytest.mark.smoke
def test_unknown_material_param_fails_with_name():
    deck = _deck()
    mats = deck["residuals"]["local residual"]["materials"]["body"]
    mats["Yy"] = mats.pop("Y")  # typo'd yield stress
    with pytest.raises(ValueError, match="Yy"):
        Problem(load_deck(deck))


@pytest.mark.smoke
def test_missing_material_param_fails_with_name():
    deck = _deck()
    del deck["residuals"]["local residual"]["materials"]["body"]["K"]
    with pytest.raises(ValueError, match="'K'"):
        Problem(load_deck(deck))


@pytest.mark.smoke
def test_unknown_local_residual_key_fails():
    deck = _deck()
    deck["residuals"]["local residual"]["nonlinear maximum iters"] = 3
    with pytest.raises(ValueError, match="nonlinear maximum iters"):
        load_deck(deck)


@pytest.mark.smoke
def test_valid_deck_still_loads():
    spec = load_deck(_deck())
    assert spec.model_name == "small_J2"


def test_all_reference_decks_pass_validation():
    """Every reference ctest deck must load under the validator — the
    valid-key sets mirror the reference's own."""
    import glob
    import os

    root = "/root/reference/source/calibr8/test"
    if not os.path.isdir(root):
        pytest.skip("reference tree unavailable")
    n = 0
    for f in glob.glob(f"{root}/*/*.yaml.in"):
        load_deck(f)
        n += 1
    assert n >= 25

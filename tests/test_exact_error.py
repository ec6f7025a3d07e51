"""TRUTH-discretization exact error drivers (the analog of the
reference's exact_error and model_form_exact_error executables —
main_exact_error.cpp, main_model_form_exact_error.cpp): the fine/TRUTH
problem is actually solved and the error is localized with the exact
adjoint weights.  The exactly-weighted estimate should localize the
true error well (first-order in the state difference), and the global
E_exact must match the verify driver's J^h - J^H."""

from calibr8_tpu.deck import load_deck
from calibr8_tpu.error.exact import exact_error, model_form_exact_error
from calibr8_tpu.error.verify import verify

from tests.decks import BCS_2D, J2_MAT, make_deck


def test_exact_error_matches_verify_truth():
    deck = make_deck(
        {"type": "notch2D", "h": 0.2}, "small_J2", J2_MAT, BCS_2D(0.004), 2
    )
    spec = load_deck(deck)
    res = exact_error(spec)
    vres = verify(load_deck(deck))
    # both drivers solve the same coarse/fine pair
    assert abs(res.J_H - vres.J_H) < 1e-12
    assert abs(res.J_h - vres.J_h) < 1e-10
    assert abs(res.E_exact - vres.E_exact) < 1e-10
    # exact-weight localization is first-order in u_h - u_H: same sign
    # and order of magnitude as the true error (the reference driver
    # reports these numbers without an effectivity regression)
    assert 0.3 < res.effectivity < 3.0, res.effectivity
    assert res.eta_bound >= abs(res.eta_exact)


def test_model_form_exact_error():
    mat = dict(J2_MAT)
    fine_mat = dict(J2_MAT)
    fine_mat["K"] = mat["K"] * 1.1
    deck = make_deck(
        {"type": "notch2D", "h": 0.2}, "small_J2", mat, BCS_2D(0.004), 2
    )
    deck["residuals"]["fine local residual"] = {
        **deck["residuals"]["local residual"],
        "materials": {"body": fine_mat},
    }
    res = model_form_exact_error(load_deck(deck))
    assert res.J_h != res.J_H
    # exact weights: the localized sum reproduces the true model-form
    # error to first order in the state difference
    assert 0.3 < res.effectivity < 3.0, res.effectivity

"""Model-form error verification — the analog of the reference's
model_form_error_verify regression (reference:
main_model_form_error_verify.cpp, test/verify/CMakeLists.txt:
effectivity == 1 +- 1e-8 for a BASE vs FINE constitutive model pair)."""

import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.error.model_form import model_form_error_estimate, model_form_verify


def _deck(base_mat, fine_mat, model="hyper_J2"):
    lr = {
        "nonlinear max iters": 200,
        "nonlinear absolute tol": 1e-11,
        "nonlinear relative tol": 1e-11,
    }
    return {
        "discretization": {
            "builtin mesh": {"type": "notch3D", "h": 0.25, "lz": 0.1, "nz": 1},
            "num steps": 2,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {
                "type": "mechanics",
                "nonlinear max iters": 30,
                "nonlinear absolute tol": 1e-8,
                "nonlinear relative tol": 1e-8,
            },
            "local residual": {"type": model, **lr, "materials": {"body": base_mat}},
            "fine local residual": {"type": model, **lr, "materials": {"body": fine_mat}},
        },
        "dirichlet bcs": {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 2, "zmin", "0.0"],
                "bc 4": [0, 1, "ymax", "0.001 * t"],
            }
        },
        "quantity of interest": {"type": "average displacement"},
    }


BASE = {"E": 200e3, "nu": 0.3, "Y": 200.0, "K": 1e3, "S": 0.0, "D": 0.0, "A": 0.0, "n": 0.0}
FINE = {"E": 150e3, "nu": 0.35, "Y": 150.0, "K": 8e2, "S": 0.0, "D": 0.0, "A": 0.0, "n": 0.0}


@pytest.mark.slow
def test_model_form_verify_effectivity():
    res = model_form_verify(load_deck(_deck(BASE, FINE)))
    assert abs(res.effectivity - 1.0) < 1e-8, res


@pytest.mark.slow
def test_model_form_estimate_close_to_exact():
    """The estimate-only driver (no fine primal) is first-order in the
    model difference — for a mild model change it must capture the sign
    and magnitude of the exact error (the reference's main_model_form_error
    makes no accuracy regression either; path-dependent local states make
    the first-order estimate genuinely rough)."""
    spec = load_deck(_deck(BASE, {**BASE, "E": 190e3}))
    est = model_form_error_estimate(spec)
    exact = model_form_verify(spec)
    ratio = est["eta"] / exact.E_exact
    assert 0.4 < ratio < 2.5, (est["eta"], exact.E_exact)

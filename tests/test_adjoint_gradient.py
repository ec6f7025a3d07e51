"""Adjoint-gradient verification — the analog of the reference's
`inverse ... check gradient: true` regression
(reference: main_inverse.cpp:126-159,
test/adjoint/notch2D_small_J2_adjoint_check.yaml.in): a FD sweep with
shrinking steps must show the |FD - adjoint| error dropping ~7-8
decades (the reference regresses log10 drop 7.74 +- 0.1 on its mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.opt.objective import ActiveParams, AdjointObjective, fd_gradient_check
from calibr8_tpu.problem import Problem
from calibr8_tpu.solve.adjoint import Adjoint
from calibr8_tpu.solve.linear import LinearCfg

from tests.decks import NOTCH2D, BCS_2D, J2_MAT, make_deck


def build_objective(deck, inverse):
    prob = Problem(load_deck(deck))
    adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, LinearCfg())
    active = ActiveParams.from_inverse_spec(
        inverse, prob.disc.elem_set_names, prob.model.param_names
    )
    return prob, AdjointObjective(prob, adj, active)


def test_adjoint_gradient_elastic():
    """Sanity: elastic cube, dJ/dE and dJ/dnu vs FD."""
    from tests.decks import CUBE, ELASTIC_MAT

    deck = make_deck(
        CUBE, "elastic", ELASTIC_MAT,
        {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 2, "zmin", "0.0"],
            }
        },
        1,
        **{"traction bcs": {"bc 1": [0, "ymax", "0.", "1.0 * t", "0."]}},
    )
    inverse = {"materials": {"body": {"E": [500.0, 2000.0], "nu": [0.1, 0.4]}}}
    prob, obj = build_objective(deck, inverse)
    x0 = obj.active.to_canonical(obj.active.extract(prob.params0))
    g = obj.gradient(x0)
    drop, errs = fd_gradient_check(obj.value, g, x0)
    assert drop > 5.5, f"log10 drop {drop}, errs {errs}"


@pytest.mark.smoke
def test_adjoint_gradient_small_j2_notch():
    """The flagship check: path-dependent J2 plasticity over 8 steps;
    adjoint dJ/d(E, K, Y) must match FD to ~7+ decades of error drop."""
    deck = make_deck(NOTCH2D, "small_J2", J2_MAT, BCS_2D(0.001), 8)
    inverse = {
        "materials": {
            "body": {"E": [800.0, 1200.0], "K": [50.0, 150.0], "Y": [5.0, 15.0]}
        }
    }
    prob, obj = build_objective(deck, inverse)
    x0 = obj.active.to_canonical(obj.active.extract(prob.params0))
    g = obj.gradient(x0)
    assert np.all(np.isfinite(g)) and np.any(g != 0.0)
    drop, errs = fd_gradient_check(obj.value, g, x0, num_steps=11)
    assert drop > 6.0, f"log10 drop {drop}, errs {errs}"

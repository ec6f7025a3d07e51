"""Golden-QoI primal regressions over every material model family —
the analog of the reference CTest primal suite
(reference: test/primal/CMakeLists.txt, main_primal.cpp:203-219).

Cube decks have homogeneous (mesh-independent) solutions, so their
goldens are the REFERENCE goldens; notch decks use builtin meshes that
differ from the reference's PUMI meshes, so their goldens are
self-recorded (values sit 0.5-6% from the reference's, consistent with
mesh-discretization differences, and converge toward them under
refinement).
"""

import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.problem import Problem

from tests.decks import PRIMAL_REGRESSIONS

FAST = [
    "cube_elastic",
    "cube_hyper_J2",
    "cube_hyperelasticity",
    "cube_hyperelasticity_traction",
    "notch2D_small_J2_plane_strain",
    "notch2D_small_J2_plane_stress",
    "notch2D_hypo_J2_plane_strain",
    "notch2D_hypo_J2_plane_stress",
]
SLOW = [k for k in PRIMAL_REGRESSIONS if k not in FAST]


@pytest.mark.parametrize("name", FAST)
def test_primal_regression_fast(name):
    _run(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_primal_regression_slow(name):
    _run(name)


def _run(name):
    deck, golden, tol, is_ref = PRIMAL_REGRESSIONS[name]
    prob = Problem(load_deck(deck))
    traj = prob.solve_primal()
    J = traj.J
    if golden is None:
        pytest.skip(f"{name}: golden not recorded yet (J = {J:.14e})")
    rel = abs(J - golden) / abs(golden)
    kind = "reference" if is_ref else "self"
    assert rel < tol, f"{name}: J = {J:.14e} vs {kind} golden {golden:.14e} (rel {rel:.2e})"

"""REFERENCE DECK COMPATIBILITY: the reference's own `*.yaml.in` test
decks parse and run END-TO-END with no edits — `@CMAKE_SOURCE_DIR@`
substitution (the CMake configure_file step), PUMI `name.smb` ->
`name0.smb` part-path convention, native `.smb`/assoc readers, and the
in-deck `regression:` golden-QoI check
(reference: test/primal/*.yaml.in, main_primal.cpp:203-219)."""

import os

import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.problem import Problem

REF = "/root/reference/source/calibr8"
DECKS = f"{REF}/test/primal"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DECKS), reason="reference decks not available"
)

ALL = [
    "cube_elastic",
    "cube_hyperelasticity",
    "cube_hyperelasticity_traction",
    "cube_hyper_J2",
    "notch2D_small_J2",
    "notch2D_small_J2_plane_strain",
    "notch2D_small_J2_plane_stress",
    "notch2D_hyper_J2_plane_strain",
    "notch2D_hyper_J2_plane_stress",
    "notch2D_hypo_J2_plane_strain",
    "notch2D_hypo_J2_plane_stress",
    "notch_small_J2",
    "notch_small_hosford",
    "notch_hyper_J2",
    "notch_hypo_J2",
    "notch_hypo_barlat",
]
FAST = {"cube_elastic", "notch2D_small_J2_plane_stress"}


def _run(name):
    spec = load_deck(
        f"{DECKS}/{name}.yaml.in", subs={"CMAKE_SOURCE_DIR": REF}
    )
    prob = Problem(spec)
    traj = prob.solve_primal()
    assert prob.spec.regression, f"{name}: deck carries no regression block"
    assert prob.check_regression(traj.J), (
        f"{name}: J = {traj.J:.14e} vs deck golden "
        f"{prob.spec.regression['QoI']}"
    )


@pytest.mark.parametrize("name", sorted(FAST))
@pytest.mark.smoke
def test_reference_deck_unmodified_fast(name):
    _run(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", [n for n in ALL if n not in FAST])
def test_reference_deck_unmodified_slow(name):
    _run(name)

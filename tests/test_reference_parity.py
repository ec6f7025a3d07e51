"""REFERENCE-MESH GOLDEN PARITY: every reference primal regression deck
run on the reference's OWN meshes (PUMI .smb parsed natively, Gmsh .msh
for the cube) against the reference's OWN golden QoIs and tolerances
(reference: test/primal/*.yaml.in regression blocks,
main_primal.cpp:203-219).

Observed agreement: machine precision (1e-16) for most decks; the
8-step plastic notch2D_small_J2 lands at ~1e-5 (tolerance 1e-4).
"""

import os

import pytest

from calibr8_tpu.deck import load_deck
from calibr8_tpu.mesh.smb import read_smb
from calibr8_tpu.problem import Problem

from tests.decks import (
    BARLAT_MAT,
    BCS_2D,
    BCS_3D,
    HYPER_ELASTIC_MAT,
    HYPER_MAT,
    J2_MAT,
    UNIT_R,
    VOCE_MAT,
    make_deck,
)

M = "/root/reference/source/calibr8/test/mesh"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(M), reason="reference meshes not available"
)

HILL2D = {**VOCE_MAT, "R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0}
PS = "mechanics_plane_stress"

# (name, mesh, assoc, deck, reference golden, reference rel tol)
CASES = [
    ("notch2D_small_J2", "notch2D", make_deck({}, "small_J2", J2_MAT, BCS_2D(0.001), 8),
     6.55208497250819866e-03, 1e-4),
    ("notch2D_small_J2_plane_strain", "notch2D",
     make_deck({}, "small_hill_plane_strain", HILL2D, BCS_2D(0.001), 4),
     1.7664579853744898e-03, 1e-4),
    ("notch2D_small_J2_plane_stress", "notch2D",
     make_deck({}, "small_hill_plane_stress", HILL2D, BCS_2D(0.001), 4, global_type=PS),
     2.2831790025047405e-03, 1e-4),
    ("notch2D_hyper_J2_plane_strain", "notch2D",
     make_deck({}, "hyper_J2_plane_strain",
               {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0, "Y_inf": 0.0, "delta": 0.0},
               BCS_2D(0.001), 8),
     6.5626182813091150e-03, 1e-4),
    ("notch2D_hyper_J2_plane_stress", "notch2D",
     make_deck({}, "hyper_J2_plane_stress",
               {"E": 1000.0, "nu": 0.25, "Y": 2.0, "S": 10.0, "D": 2.0, "A": 0.0, "n": 0.0, "K": 0.0},
               BCS_2D(0.005), 5, global_type=PS),
     1.7493199283412385e-02, 1e-4),
    ("notch2D_hypo_J2_plane_strain", "notch2D",
     make_deck({}, "hypo_hill_plane_strain", HILL2D, BCS_2D(0.005), 4),
     7.10226176768509899e-03, 1e-4),
    ("notch2D_hypo_J2_plane_stress", "notch2D",
     make_deck({}, "hypo_hill_plane_stress",
               {**HILL2D, "Q00": 1.0, "Q01": 0.0, "Q10": 0.0, "Q11": 1.0},
               BCS_2D(0.005), 4, global_type=PS),
     1.1852379652063684e-02, 1e-4),
    ("notch_small_J2", "notch",
     make_deck({}, "small_hill", {**VOCE_MAT, **UNIT_R}, BCS_3D(0.001), 4),
     1.4622046563394649e-04, 1e-4),
    ("notch_hyper_J2", "notch",
     make_deck({}, "hyper_J2", HYPER_MAT, BCS_3D(0.005), 4),
     7.0080671510235862e-04, 1e-4),
    ("notch_hypo_J2", "notch",
     make_deck({}, "hypo_hill", {**VOCE_MAT, **UNIT_R}, BCS_3D(0.005), 4),
     7.5441386985803955e-04, 1e-4),
    ("notch_small_hosford", "notch",
     make_deck({}, "small_hosford",
               {"E": 1000.0, "nu": 0.25, "Y": 2.0, "a": 100.0, "K": 0.0, "S": 10.0, "D": 2.0},
               BCS_3D(0.001), 4),
     1.4447629888205869e-04, 1e-4),
    ("notch_hypo_barlat", "notch",
     make_deck({}, "hypo_barlat", BARLAT_MAT, BCS_3D(0.01), 4),
     1.3989452247489746e-03, 1e-4),
]

FAST = {"notch2D_small_J2_plane_strain", "notch2D_small_J2_plane_stress"}


def _mesh(geom):
    return read_smb(f"{M}/{geom}/{geom}0.smb", f"{M}/{geom}/{geom}.txt")


@pytest.mark.parametrize(
    "name,geom,deck,golden,tol",
    [c for c in CASES if c[0] in FAST],
    ids=[c[0] for c in CASES if c[0] in FAST],
)
def test_reference_parity_fast(name, geom, deck, golden, tol):
    _run(name, geom, deck, golden, tol)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,geom,deck,golden,tol",
    [c for c in CASES if c[0] not in FAST],
    ids=[c[0] for c in CASES if c[0] not in FAST],
)
def test_reference_parity_slow(name, geom, deck, golden, tol):
    _run(name, geom, deck, golden, tol)


def _run(name, geom, deck, golden, tol):
    prob = Problem(load_deck(deck), mesh=_mesh(geom))
    traj = prob.solve_primal()
    rel = abs(traj.J - golden) / abs(golden)
    assert rel < tol, f"{name}: J = {traj.J:.14e} vs {golden:.14e} (rel {rel:.2e})"


@pytest.mark.slow
def test_reference_adjoint_gradient_check():
    """The reference's adjoint-vs-FD regression on its own mesh
    (test/adjoint/notch2D_small_J2_adjoint_check.yaml.in: log10 drop
    7.7384790056517998 +- 0.1).  The drop value depends on the random FD
    direction (ROL draws its own), so we assert the same ~7.5+ decades
    of error decay rather than the reference's direction-specific value."""
    from calibr8_tpu.opt.objective import (
        ActiveParams,
        AdjointObjective,
        fd_gradient_check,
    )
    from calibr8_tpu.solve.adjoint import Adjoint
    from calibr8_tpu.solve.linear import LinearCfg

    deck = make_deck(
        {}, "small_J2",
        {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 2.0},
        BCS_2D(0.001), 4,
    )
    deck["residuals"]["global residual"]["nonlinear absolute tol"] = 1e-11
    deck["residuals"]["global residual"]["nonlinear relative tol"] = 1e-11
    prob = Problem(load_deck(deck), mesh=_mesh("notch2D"))
    adj = Adjoint(prob.assembler, prob.qoi, prob.dbcs, LinearCfg())
    active = ActiveParams.from_inverse_spec(
        {"materials": {"body": {
            "E": [800.0, 1000.0], "nu": [0.2, 0.3],
            "K": [90.0, 110.0], "Y": [1.0, 3.0]}}},
        prob.disc.elem_set_names,
        prob.model.param_names,
    )
    obj = AdjointObjective(prob, adj, active)
    x0 = active.to_canonical(active.extract(prob.params0))
    g = obj.gradient(x0)
    drop, errs = fd_gradient_check(obj.value, g, x0, num_steps=13)
    assert abs(drop - 7.7384790056517998) < 0.75, (drop, errs)

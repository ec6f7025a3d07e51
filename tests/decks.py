"""Shared test decks mirroring the reference regression suite
(reference: source/calibr8/test/primal/*.yaml.in).  Geometry/materials/
BCs/step counts match the reference decks; meshes come from the builtin
generators (the reference ships pre-built PUMI meshes), so QoI goldens
for the notch geometries are self-recorded while the cube decks (whose
solutions are homogeneous/mesh-independent) reproduce the reference
goldens directly.
"""

from __future__ import annotations

LR_TOL = {
    "nonlinear max iters": 500,
    "nonlinear absolute tol": 1e-12,
    "nonlinear relative tol": 1e-12,
}
UNIT_R = {"R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0, "R02": 1.0, "R12": 1.0}

CUBE = {"type": "cube", "n": 2}
NOTCH2D = {"type": "notch2D", "h": 0.12}
NOTCH3D = {"type": "notch3D", "h": 0.15, "lz": 0.1, "nz": 1}

BCS_3D = lambda pull: {
    "expression": {
        "bc 1": [0, 0, "xmin", "0.0"],
        "bc 2": [0, 1, "ymin", "0.0"],
        "bc 3": [0, 2, "zmin", "0.0"],
        "bc 4": [0, 1, "ymax", f"{pull} * t"],
    }
}
BCS_2D = lambda pull: {
    "expression": {
        "bc 1": [0, 0, "xmin", "0.0"],
        "bc 2": [0, 1, "ymin", "0.0"],
        "bc 3": [0, 1, "ymax", f"{pull} * t"],
    }
}


def make_deck(
    mesh,
    model,
    materials,
    bcs,
    num_steps,
    global_type="mechanics",
    qoi="average displacement",
    max_iters=40,
    **extra,
):
    deck = {
        "discretization": {
            "builtin mesh": mesh,
            "num steps": num_steps,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {
                "type": global_type,
                "nonlinear max iters": max_iters,
                "nonlinear absolute tol": 1e-8,
                "nonlinear relative tol": 1e-8,
            },
            "local residual": {
                "type": model,
                **LR_TOL,
                "materials": {"body": materials},
            },
        },
        "dirichlet bcs": bcs,
        "quantity of interest": {"type": qoi},
    }
    deck.update(extra)
    return deck


ELASTIC_MAT = {"E": 1000.0, "nu": 0.25, "cte": 1e-3, "delta_T": 10.0}
J2_MAT = {
    "E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0,
    "cte": 0.0, "delta_T": 0.0,
}
HYPER_MAT = {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0, "S": 0.0, "D": 0.0, "A": 0.0, "n": 0.0}
HYPER_ELASTIC_MAT = {**HYPER_MAT, "Y": 100000.0}
VOCE_MAT = {"E": 1000.0, "nu": 0.25, "Y": 2.0, "S": 10.0, "D": 2.0}
BARLAT_MAT = {
    "E": 70e3, "nu": 0.3, "Y": 200.0, "a": 8.0, "K": 0.0, "S": 200.0, "D": 20.0,
    "sp_01": 1.241024, "sp_02": 1.078271, "sp_10": 1.216463, "sp_12": 1.223867,
    "sp_20": 1.093105, "sp_21": 0.889161, "sp_33": 0.501909, "sp_44": 0.557173,
    "sp_55": 1.349094,
    "dp_01": 0.775366, "dp_02": 0.922743, "dp_10": 0.765487, "dp_12": 0.793356,
    "dp_20": 0.918689, "dp_21": 1.027625, "dp_33": 1.115833, "dp_44": 1.112273,
    "dp_55": 0.589787,
}

# name -> (deck, golden QoI, rel tol, is_reference_golden)
PRIMAL_REGRESSIONS = {
    "cube_elastic": (
        make_deck(CUBE, "elastic", ELASTIC_MAT, {
            "expression": {
                "bc 1": [0, 0, "xmin", "0.0"],
                "bc 2": [0, 1, "ymin", "0.0"],
                "bc 3": [0, 2, "zmin", "0.0"],
            }
        }, 1),
        5.00000000000000184e-3, 1e-6, True,
    ),
    "cube_hyper_J2": (
        make_deck(CUBE, "hyper_J2", HYPER_MAT, BCS_3D(0.01), 10),
        1.57817536611772440e-2, 1e-4, True,
    ),
    "cube_hyperelasticity": (
        make_deck(CUBE, "hyper_J2", HYPER_ELASTIC_MAT, BCS_3D(0.001), 4),
        8.34720846455980019e-4, 1e-4, True,
    ),
    # NOTE: ymin face fully clamped (all components) + traction on ymax
    # (reference deck cube_hyperelasticity_traction.yaml.in:36-44); the
    # solution is non-homogeneous, so this golden is mesh-dependent —
    # self-recorded on the builtin n=2 cube (the reference's value on
    # its own 14-node mesh is 1.61757e-4; ours is within a few % and
    # converges toward it under refinement).
    "cube_hyperelasticity_traction": (
        make_deck(
            CUBE, "hyper_J2", HYPER_ELASTIC_MAT,
            {
                "expression": {
                    "bc 1": [0, 0, "ymin", "0.0"],
                    "bc 2": [0, 1, "ymin", "0.0"],
                    "bc 3": [0, 2, "ymin", "0.0"],
                }
            },
            4,
            **{"traction bcs": {"bc 1": [0, "ymax", "0.", "0.1 * t", "0."]}},
        ),
        1.64544766180509e-04, 1e-7, False,
    ),
    "notch2D_small_J2": (
        make_deck(NOTCH2D, "small_J2", J2_MAT, BCS_2D(0.001), 8),
        6.51333502442964264e-03, 1e-8, False,
    ),
    "notch2D_small_J2_plane_strain": (
        make_deck(NOTCH2D, "small_hill_plane_strain",
                  {**VOCE_MAT, "R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0},
                  BCS_2D(0.005), 4),
        6.54378838333382e-03, 1e-8, False,
    ),
    "notch2D_small_J2_plane_stress": (
        make_deck(NOTCH2D, "small_hill_plane_stress",
                  {**VOCE_MAT, "R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0},
                  BCS_2D(0.005), 4, global_type="mechanics_plane_stress"),
        1.14781780968678e-02, 1e-8, False,
    ),
    "notch2D_hyper_J2_plane_strain": (
        make_deck(NOTCH2D, "hyper_J2_plane_strain",
                  {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0, "Y_inf": 0.0, "delta": 0.0},
                  BCS_2D(0.001), 8),
        6.52601761728928e-03, 1e-8, False,
    ),
    "notch2D_hyper_J2_plane_stress": (
        make_deck(NOTCH2D, "hyper_J2_plane_stress",
                  {"E": 1000.0, "nu": 0.25, "Y": 2.0, "S": 10.0, "D": 2.0, "A": 0.0, "n": 0.0, "K": 0.0},
                  BCS_2D(0.005), 5, global_type="mechanics_plane_stress"),
        1.74207846258545e-02, 1e-8, False,
    ),
    "notch2D_hypo_J2_plane_strain": (
        make_deck(NOTCH2D, "hypo_hill_plane_strain",
                  {**VOCE_MAT, "R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0},
                  BCS_2D(0.005), 4),
        6.83687469110848e-03, 1e-8, False,
    ),
    "notch2D_hypo_J2_plane_stress": (
        make_deck(NOTCH2D, "hypo_hill_plane_stress",
                  {**VOCE_MAT, "R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0,
                   "Q00": 1.0, "Q01": 0.0, "Q10": 0.0, "Q11": 1.0},
                  BCS_2D(0.005), 4, global_type="mechanics_plane_stress"),
        1.18591896701766e-02, 1e-8, False,
    ),
    "notch_small_J2": (
        make_deck(NOTCH3D, "small_hill", {**VOCE_MAT, **UNIT_R}, BCS_3D(0.001), 4),
        1.42045746802104e-04, 1e-8, False,
    ),
    "notch_hypo_J2": (
        make_deck(NOTCH3D, "hypo_hill", {**VOCE_MAT, **UNIT_R}, BCS_3D(0.005), 4),
        7.28241826014197e-04, 1e-8, False,
    ),
    "notch_small_hosford": (
        make_deck(NOTCH3D, "small_hosford",
                  {"E": 1000.0, "nu": 0.25, "Y": 2.0, "a": 100.0, "K": 0.0, "S": 10.0, "D": 2.0},
                  BCS_3D(0.001), 4),
        1.39554129894319e-04, 1e-8, False,
    ),
    "notch_hypo_barlat": (
        make_deck(NOTCH3D, "hypo_barlat", BARLAT_MAT, BCS_3D(0.01), 4),
        1.31426770394029e-03, 1e-8, False,
    ),
}

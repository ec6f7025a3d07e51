"""Canonical per-model example configurations for the 16 material
models (reference registry: source/calibr8/src/local_residual.cpp:893-935).

One entry per model: (name, builtin mesh, model type, materials, BCs,
global residual type).  Shared by the twin parity tests
(tests/test_batched_twins.py) and the per-model assembly bench
(bench.py --mode twins), so the measured fast-path speedups correspond
exactly to the configurations whose Pallas-vs-XLA agreement is tested.
"""

UNIT_R = {
    "R00": 1.0, "R11": 1.0, "R22": 1.0, "R01": 1.0, "R02": 1.0, "R12": 1.0,
}
J2_MAT = {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0, "cte": 0.0, "delta_T": 0.0}
VOCE = {"E": 1000.0, "nu": 0.25, "Y": 10.0, "S": 5.0, "D": 2.0}
HILL2D = {**VOCE, "R00": 1.0, "R11": 1.1, "R22": 0.95, "R01": 1.05}


def BCS_3D(pull):
    return {
        "expression": {
            "bc 1": [0, 0, "xmin", "0.0"],
            "bc 2": [0, 1, "ymin", "0.0"],
            "bc 3": [0, 2, "zmin", "0.0"],
            "bc 4": [0, 1, "ymax", f"{pull} * t"],
        }
    }


def BCS_2D(pull):
    return {
        "expression": {
            "bc 1": [0, 0, "xmin", "0.0"],
            "bc 2": [0, 1, "ymin", "0.0"],
            "bc 3": [0, 1, "ymax", f"{pull} * t"],
        }
    }


CASES = [
    (
        "elastic",
        {"type": "cube", "n": 2},
        "elastic",
        {"E": 1000.0, "nu": 0.25, "cte": 1e-5, "delta_T": 10.0},
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "small_J2",
        {"type": "cube", "n": 2},
        "small_J2",
        J2_MAT,
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "hyper_J2",
        {"type": "cube", "n": 2},
        "hyper_J2",
        {"E": 1000.0, "nu": 0.25, "K": 100.0, "Y": 10.0,
         "S": 0.0, "D": 0.0, "A": 0.0, "n": 0.0},
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "small_hill",
        {"type": "cube", "n": 2},
        "small_hill",
        {**VOCE, **UNIT_R},
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "hypo_hill",
        {"type": "cube", "n": 2},
        "hypo_hill",
        {**VOCE, **UNIT_R},
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "small_hosford",
        {"type": "cube", "n": 2},
        "small_hosford",
        {"E": 1000.0, "nu": 0.25, "Y": 10.0, "a": 8.0, "K": 50.0,
         "S": 5.0, "D": 2.0},
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "hypo_hosford",
        {"type": "cube", "n": 2},
        "hypo_hosford",
        {"E": 1000.0, "nu": 0.25, "Y": 10.0, "a": 8.0, "K": 0.0,
         "S": 5.0, "D": 2.0},
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "hypo_barlat",
        {"type": "cube", "n": 2},
        "hypo_barlat",
        {"E": 1000.0, "nu": 0.25, "Y": 10.0, "a": 8.0, "K": 50.0,
         "S": 5.0, "D": 2.0,
         "sp_01": 1.0, "sp_02": 1.05, "sp_10": 0.95, "sp_12": 1.1,
         "sp_20": 0.9, "sp_21": 1.02, "sp_33": 1.04, "sp_44": 0.97,
         "sp_55": 1.06,
         "dp_01": 0.98, "dp_02": 1.03, "dp_10": 1.07, "dp_12": 0.92,
         "dp_20": 1.01, "dp_21": 0.96, "dp_33": 1.08, "dp_44": 1.02,
         "dp_55": 0.94},
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "isotropic_elastic",
        {"type": "cube", "n": 2},
        "isotropic_elastic",
        {"E": 1000.0, "nu": 0.25},
        BCS_3D(0.02),
        "mechanics",
    ),
    (
        "small_hill_plane_stress",
        {"type": "notch2D", "h": 0.3},
        "small_hill_plane_stress",
        HILL2D,
        BCS_2D(0.01),
        "mechanics_plane_stress",
    ),
    (
        "small_hill_plane_strain",
        {"type": "notch2D", "h": 0.3},
        "small_hill_plane_strain",
        HILL2D,
        BCS_2D(0.01),
        "mechanics",
    ),
    (
        "hypo_hill_plane_strain",
        {"type": "notch2D", "h": 0.3},
        "hypo_hill_plane_strain",
        HILL2D,
        BCS_2D(0.01),
        "mechanics",
    ),
    (
        "hyper_J2_plane_strain",
        {"type": "notch2D", "h": 0.3},
        "hyper_J2_plane_strain",
        {"E": 1000.0, "nu": 0.25, "K": 50.0, "Y": 10.0, "Y_inf": 15.0,
         "delta": 2.0},
        BCS_2D(0.01),
        "mechanics",
    ),
    (
        "hyper_J2_plane_stress",
        {"type": "notch2D", "h": 0.3},
        "hyper_J2_plane_stress",
        {"E": 1000.0, "nu": 0.25, "Y": 10.0, "S": 5.0, "D": 2.0,
         "A": 0.0, "n": 0.0, "K": 50.0},
        BCS_2D(0.01),
        "mechanics_plane_stress",
    ),
    (
        "hypo_hill_plane_stress",
        {"type": "notch2D", "h": 0.3},
        "hypo_hill_plane_stress",
        {**HILL2D, "Q00": 0.8660254037844387, "Q01": -0.5,
         "Q10": 0.5, "Q11": 0.8660254037844387},
        BCS_2D(0.01),
        "mechanics_plane_stress",
    ),
    (
        "hybrid_hyper_J2_plane_stress",
        {"type": "notch2D", "h": 0.3},
        "hybrid_hyper_J2_plane_stress",
        {"E": 1000.0, "nu": 0.25, "Y": 10.0},
        BCS_2D(0.01),
        "mechanics_plane_stress",
    ),
]


def case_deck(case, mesh=None, num_steps=2, max_iters=40, tol=1e-12):
    """A runnable deck dict for one CASES entry, optionally overriding
    the (tiny, test-sized) builtin mesh with a larger one."""
    name, default_mesh, model, mats, bcs, gtype = case
    deck = {
        "discretization": {
            "builtin mesh": dict(mesh or default_mesh),
            "num steps": num_steps,
            "step size": 1.0,
        },
        "residuals": {
            "global residual": {
                "type": gtype,
                "nonlinear max iters": max_iters,
                "nonlinear absolute tol": 1e-8,
                "nonlinear relative tol": 1e-8,
            },
            "local residual": {
                "type": model,
                "nonlinear max iters": 500,
                "nonlinear absolute tol": tol,
                "nonlinear relative tol": tol,
                "materials": {"body": mats},
            },
        },
        "dirichlet bcs": bcs,
        "quantity of interest": {"type": "average displacement"},
    }
    if name == "isotropic_elastic":
        # displacement formulation (no u/p mixing) — the non-mixed
        # 3D kernel path
        deck["residuals"]["global residual"]["mixed formulation"] = False
    if name == "hybrid_hyper_J2_plane_stress":
        deck["residuals"]["local residual"]["embedded model"] = {
            "activation function": "sigmoid",
            "topology": [1, 4, 1],
            "input scale": 1.0,
            "output scale": 10.0,
        }
    return deck

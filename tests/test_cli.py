"""CLI driver smoke tests (the L8 executable layer —
reference: source/calibr8/src/main_*.cpp)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRIMAL_DECK = {
    "problem": {"name": "cli_cube_elastic"},
    "discretization": {
        "builtin mesh": {"type": "cube", "n": 2},
        "num steps": 1,
        "step size": 1.0,
    },
    "residuals": {
        "global residual": {"type": "mechanics"},
        "local residual": {
            "type": "elastic",
            "materials": {
                "body": {"E": 1000.0, "nu": 0.25, "cte": 1e-3, "delta_T": 10.0}
            },
        },
    },
    "dirichlet bcs": {
        "expression": {
            "bc 1": [0, 0, "xmin", "0.0"],
            "bc 2": [0, 1, "ymin", "0.0"],
            "bc 3": [0, 2, "zmin", "0.0"],
        }
    },
    "quantity of interest": {"type": "average displacement"},
    "regression": {"QoI": 5.00000000000000184e-3, "relative error tol": 1.0e-6},
}


def run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "calibr8_tpu", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        env=env,
        timeout=560,
    )


@pytest.mark.smoke
def test_cli_primal_regression_and_vtk(tmp_path):
    deck = tmp_path / "deck.yaml"
    deck.write_text(yaml.safe_dump(PRIMAL_DECK))
    res = run_cli(["primal", str(deck), "--vtk", str(tmp_path / "out" / "viz")], tmp_path)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "PASS" in res.stdout
    assert (tmp_path / "out" / "viz.pvd").exists()
    assert (tmp_path / "out" / "viz_1.vtu").exists()


def test_cli_perturb_roundtrip(tmp_path):
    fields = {"measured_0": np.zeros((10, 2)), "measured_1": np.ones((10, 2))}
    np.savez_compressed(tmp_path / "f.npz", **fields)
    res = run_cli(
        ["perturb", str(tmp_path / "f.npz"), "--sigma", "1e-3", "--out", str(tmp_path / "g.npz")],
        tmp_path,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    out = np.load(tmp_path / "g.npz")
    assert not np.allclose(out["measured_1"], 1.0)
    assert np.allclose(out["measured_1"], 1.0, atol=1e-2)


def test_mls_smoothing_recovers_polynomial():
    from calibr8_tpu.io.mls import mls_smooth

    rng = np.random.default_rng(0)
    pts = rng.random((300, 2))
    truth = 1.0 + 2.0 * pts[:, 0] - 3.0 * pts[:, 1] + pts[:, 0] * pts[:, 1]
    noisy = truth + 1e-3 * rng.standard_normal(300)
    smoothed = mls_smooth(pts, noisy, pts, radius=0.15, order=2)
    # MLS with order 2 reproduces quadratics up to the noise level
    assert np.abs(smoothed - truth).max() < 5e-3

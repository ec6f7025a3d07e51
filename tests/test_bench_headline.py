"""Driver-visible headline contract for bench.py.

Two rounds running the driver recorded ``parsed: null`` because the
final stdout line outgrew its tail window (round 2: emitted only after
a full sweep; round 3: the line embedded the entire detail dict).  The
contract pinned here: the LAST line bench.py prints is one COMPACT
JSON object — metric/value/vs_baseline plus one-line per-mode
summaries — small enough to survive any sane tail window, regardless
of how large the detail dict grows.
"""

import json

import bench


def _fat_detail():
    """A detail dict shaped like a full-sweep worst case: every mode,
    a 16-model twins dict with long error strings, and a scale row."""
    models = {
        f"model_{i}": {
            "n_elem": 24576,
            "n_dofs": 19652,
            "xla_seconds": 0.0123456789,
            "pallas_seconds": 0.000123456,
            "speedup": 100.0 + i,
            "bench_wall_s": 20.0 + i,
        }
        for i in range(16)
    }
    models["bad_model"] = {
        "n_elem": 24576,
        "xla_error": "UNAVAILABLE: TPU device error — " + "x" * 400,
    }
    detail = {
        "assembly_f32": {
            "n_dofs": 1098500,
            "seconds": 0.256,
            "gdof_per_s": 0.004286,
            "useful_bytes": 123456789,
            "useful_bw_fraction_pallas": 0.21,
            "xla_flops": 1.2e12,
            "device": "TPU v5 lite0",
        },
        "newton_f32": {
            "n_dofs": 37000,
            "seconds": 0.67,
            "solve_relres": 3.84e-3,  # f32 floor -> must flag stalled
            "solve_iters": 400,
            "device": "TPU v5 lite0",
        },
        "newton_mg_f32": {
            "n_dofs": 37000,
            "seconds": 1.06,
            "solve_relres": 9.1e-5,
            "device": "TPU v5 lite0",
        },
        "scale_f32": {
            "n_dofs": 1098500,
            "newton_seconds": 22.3,
            "newton_solve_relres": 9.1e-5,
            "adjoint_seconds": 59.1,
            "adjoint_solve_relres": 2.1e-4,
            "adjoint_s_per_step_at_10M_dof_extrapolated": 535.7,
            "detail_blob": {"mem": [1.0] * 200},  # must NOT leak through
            "device": "TPU v5 lite0",
        },
        "twins_f32": {"models": models, "cached": True},
        "calibration_f64": {
            "n_dofs": 34000,
            "seconds_per_eval": 1.23,
            "n_evals": 9,
            "rel_err_Y": 1e-13,
            "rel_err_D": 1e-13,
        },
        "dist_overhead_f32": {
            "n_dofs": 37000,
            "single_s_per_iter": 0.01,
            "dist_s_per_iter": 0.012,
            "dist_overhead_ratio": 1.2,
        },
    }
    return detail


def test_headline_is_one_short_parseable_line():
    line = bench._headline(_fat_detail())
    assert "\n" not in line
    # the driver reads a bounded stdout tail; keep comfortable margin
    assert len(line) < 4096, f"headline {len(line)} bytes"
    d = json.loads(line)
    assert d["metric"] == "jacobian_assembly_gdof_per_s"
    assert d["value"] > 0
    assert d["vs_baseline"] > 0
    assert set(d["modes"]) == set(_fat_detail())


def test_headline_mode_rows_are_flat_summaries():
    d = json.loads(bench._headline(_fat_detail()))
    modes = d["modes"]
    # nested detail must not leak into the headline
    assert "detail_blob" not in modes["scale_f32"]
    assert modes["scale_f32"]["adjoint_seconds"] == 59.1
    # twins collapses 17 model dicts to counts + a median
    tw = modes["twins_f32"]
    assert tw["n_models_ok"] == 16 and tw["n_models"] == 17
    assert tw["cached"] is True
    # every row stays one flat dict of scalars
    for k, row in modes.items():
        assert isinstance(row, dict)
        for v in row.values():
            assert not isinstance(v, (dict, list)), (k, row)


def test_headline_flags_unconverged_rows_as_stalled():
    d = json.loads(bench._headline(_fat_detail()))
    modes = d["modes"]
    # relres 3.8e-3 at f32 is the one-level floor, not convergence
    assert modes["newton_f32"].get("stalled") is True
    assert "stalled" not in modes["newton_mg_f32"]
    # scale adjoint relres 2.1e-4 vs the 2e-4 f32 threshold
    assert modes["scale_f32"].get("adjoint_stalled") is True
    assert "newton_stalled" not in modes["scale_f32"]


def test_error_strings_are_truncated():
    detail = {"newton_f32": {"error": "E" * 10000}}
    line = bench._headline(detail)
    assert len(line) < 512
    assert json.loads(line)["modes"]["newton_f32"]["error"] == "E" * 80

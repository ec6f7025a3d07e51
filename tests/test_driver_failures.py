"""Unit tests for the optimizer-driver failure handling — the analog of
the reference's test/python/unit/test_failure_handling.py, with the
FE-backed objective replaced by a pure-Python fake.  Covers:

  * penalty_inward: finite penalty + a SMALL fake gradient whose
    negative (the optimizer's step direction) points back toward the
    last successful point, norm capped at fake_grad_cap;
  * repeat_last: reuse the previous successful (J, g), falling back to
    penalty_inward when no success has happened yet.

reference: source/calibr8/python/calibr8/util/driver_support.py:181-283.
"""

import numpy as np
import pytest

from calibr8_tpu.opt.drivers import _EvalWrapper
from calibr8_tpu.solve.newton import NewtonSolveError


class FakeObjective:
    """Scripted (J, g) sequence; entries of None raise NewtonSolveError."""

    def __init__(self, script):
        self.script = list(script)

    def value_and_gradient(self, x):
        out = self.script.pop(0)
        if out is None:
            raise NewtonSolveError("diverged")
        return out

    def value(self, x):
        return self.value_and_gradient(x)[0]


@pytest.mark.smoke
def test_success_records_value_grad_and_history():
    w = _EvalWrapper(FakeObjective([(2.0, np.array([1.0, -1.0]))]))
    J, g = w.value_and_grad(np.array([0.5, 0.5]))
    assert J == 2.0
    np.testing.assert_allclose(g, [1.0, -1.0])
    assert len(w.history) == 1
    assert w.call_log[-1]["success"] is True
    assert w._last_good_x == pytest.approx([0.5, 0.5])


@pytest.mark.smoke
def test_penalty_inward_points_back_toward_last_good():
    w = _EvalWrapper(
        FakeObjective([(1.0, np.array([3.0, 4.0])), None]),
        failure_mode="penalty_inward",
    )
    x_good = np.array([0.0, 0.0])
    w.value_and_grad(x_good)
    x_bad = np.array([1.0, 1.0])
    J, g = w.value_and_grad(x_bad)

    assert np.isfinite(J) and J == w.penalty
    # fake gradient is a positive multiple of (x_bad - x_good): the
    # negative-gradient step points back toward the last good point
    direction = x_bad - x_good
    cos = np.dot(g, direction) / (
        np.linalg.norm(g) * np.linalg.norm(direction)
    )
    assert cos == pytest.approx(1.0)
    assert 0.0 < np.linalg.norm(g) <= w.fake_grad_cap + 1e-12
    assert w.call_log[-1]["failure_response"] == "penalty_inward"
    # a failure must not overwrite the cached last-good state
    assert w._last_good[0] == 1.0
    assert w._last_good_x == pytest.approx(x_good)


@pytest.mark.smoke
def test_repeat_last_reuses_last_success():
    w = _EvalWrapper(
        FakeObjective([(5.0, np.array([2.0, 3.0])), None]),
        failure_mode="repeat_last",
    )
    w.value_and_grad(np.array([0.0, 0.0]))
    J, g = w.value_and_grad(np.array([9.0, 9.0]))
    assert J == 5.0
    np.testing.assert_allclose(g, [2.0, 3.0])
    assert w.call_log[-1]["failure_response"] == "repeat_last"


@pytest.mark.smoke
def test_repeat_last_without_prior_success_falls_back_to_penalty():
    w = _EvalWrapper(FakeObjective([None]), failure_mode="repeat_last")
    J, g = w.value_and_grad(np.array([1.0, 2.0]))
    assert J == w.penalty
    assert np.all(np.isfinite(g))
    assert w.call_log[-1]["failure_response"] == "penalty_inward"


@pytest.mark.smoke
def test_fake_grad_norm_tracks_median_of_successes():
    script = [(1.0, np.array([300.0, 400.0])), (0.5, np.array([30.0, 40.0])),
              (0.2, np.array([3.0, 4.0])), None]
    w = _EvalWrapper(FakeObjective(script))
    for _ in range(3):
        w.value_and_grad(np.array([0.0, 0.0]))
    _, g = w.value_and_grad(np.array([1.0, 0.0]))
    # median successful norm = 50 -> fake norm = min(1e-3 * 50, cap) = 0.05
    assert np.linalg.norm(g) == pytest.approx(0.05)

"""Per-phase wall-clock timers + JAX profiler hooks.

SURVEY §5 prescribes 'JAX profiler + per-phase timers' for the rebuild
(the reference's tracing story is one PCU_Time wrapper,
reference: source/calibr8/src/control.cpp:121-124).  Usage:

    from calibr8_tpu.utils import timers
    with timers.phase("assemble", block=out):
        out = assemble(...)
    ...
    timers.report()            # per-phase count/total/mean table
    with timers.trace("/tmp/jax-trace"):   # XLA-level profile
        run()

Timers are process-global and near-zero-cost when disabled
(CALIBR8_TIMERS=0 leaves only a perf_counter pair per phase).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_records: dict[str, list[float]] = defaultdict(list)
_enabled = os.environ.get("CALIBR8_TIMERS", "1") != "0"


def enabled() -> bool:
    return _enabled


def reset() -> None:
    _records.clear()


@contextlib.contextmanager
def phase(name: str, block=None):
    """Time a phase; `block` (an array/pytree) is block_until_ready'd
    before the clock stops so async dispatch does not hide device time."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block is not None:
            import jax

            jax.block_until_ready(block)
        _records[name].append(time.perf_counter() - t0)


def record(name: str, seconds: float) -> None:
    if _enabled:
        _records[name].append(seconds)


def summary() -> dict[str, dict]:
    return {
        k: dict(
            count=len(v),
            total=sum(v),
            mean=sum(v) / len(v) if v else 0.0,
            max=max(v) if v else 0.0,
        )
        for k, v in _records.items()
    }


def report(print_fn=print) -> None:
    s = summary()
    if not s:
        return
    print_fn("----- phase timers -----")
    width = max(len(k) for k in s)
    for k in sorted(s, key=lambda k: -s[k]["total"]):
        r = s[k]
        print_fn(
            f"{k:<{width}}  n={r['count']:<5d} total={r['total']:9.3f}s "
            f"mean={r['mean'] * 1e3:9.3f}ms max={r['max'] * 1e3:9.3f}ms"
        )
    print_fn("------------------------")


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA-level profile via jax.profiler (view with TensorBoard /
    xprof); nests freely with phase()."""
    import jax

    with jax.profiler.trace(log_dir):
        yield

"""QoI registry — the analog of create_qoi (reference:
source/calibr8/src/qoi.cpp:261-289); registry strings match the
reference deck vocabulary."""

from __future__ import annotations

from calibr8_tpu.qoi.avg_disp import AvgDisp, AvgLocalVar, AvgStress, DispComp

_REGISTRY = {
    "average displacement": AvgDisp,
    "displacement component": DispComp,
    "average stress": AvgStress,
    "average local variable": AvgLocalVar,
}


def register(name, cls):
    _REGISTRY[name] = cls


def _lazy_imports():
    for mod in ("calibration", "surface", "point_wise"):
        try:
            __import__(f"calibr8_tpu.qoi.{mod}")
        except ImportError:
            pass


def create_qoi(name: str, disc, config=None, model=None):
    if name not in _REGISTRY:
        _lazy_imports()
    if name not in _REGISTRY:
        raise ValueError(f"unknown QoI type {name!r}; known: {sorted(_REGISTRY)}")
    cls = _REGISTRY[name]
    try:
        return cls(disc, config, model=model)
    except TypeError:
        return cls(disc, config)

"""Local (constitutive) model registry.

The analog of create_local_residual (reference:
source/calibr8/src/local_residual.cpp:893-935) — registry strings match
the reference deck vocabulary exactly.
"""

from __future__ import annotations

from calibr8_tpu.models.elastic import Elastic, IsotropicElastic

_REGISTRY: dict[str, type] = {}


def register(cls):
    _REGISTRY[cls.name] = cls
    return cls


register(Elastic)
register(IsotropicElastic)


def _lazy_imports():
    # populate the registry; guarded so partial builds still import
    for mod in ("small_strain", "hyper_j2", "hypo", "hybrid"):
        try:
            __import__(f"calibr8_tpu.models.{mod}")
        except ImportError:
            pass


def create_local_model(name: str, dim: int, config=None):
    if name not in _REGISTRY:
        _lazy_imports()
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown local residual type {name!r}; known: {sorted(_REGISTRY)}"
        )
    cls = _REGISTRY[name]
    try:
        return cls(dim, config=config)
    except TypeError:
        return cls(dim)


def available() -> list[str]:
    _lazy_imports()
    return sorted(_REGISTRY)

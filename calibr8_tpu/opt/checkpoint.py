"""Checkpoint/resume for long calibration runs.

The reference has no solver-state checkpointing (SURVEY: persistence is
apf meshes + ROL_out.txt + optimizer-history pickles —
inverse.py:107-108, driver_support.py:346); this adds orbax-backed
checkpoints of (canonical parameters, optimizer history, RNG-free
trajectory metadata) so multi-hour calibrations resume cleanly —
a deliberate improvement over the reference.
"""

from __future__ import annotations

import os

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path, x_canonical, history=None, meta=None):
    """Persist the optimizer state (canonical parameter vector + eval
    history + metadata)."""
    payload = {
        "x_canonical": np.asarray(x_canonical),
        "history_x": np.asarray([h[0] for h in (history or [])]).reshape(
            len(history or []), -1
        ),
        "history_J": np.asarray([h[1] for h in (history or [])]),
        "meta": dict(meta or {}),
    }
    _checkpointer().save(os.path.abspath(path), payload, force=True)


def load_checkpoint(path):
    payload = _checkpointer().restore(os.path.abspath(path))
    history = list(
        zip(
            [np.asarray(r) for r in payload["history_x"]],
            [float(v) for v in payload["history_J"]],
        )
    )
    return np.asarray(payload["x_canonical"]), history, payload.get("meta", {})


def save_trajectory(path, traj):
    """Persist a primal trajectory (x, xi, path per step) — enables
    adjoint-only restarts and postprocessing."""
    payload = {
        "x": np.stack([np.asarray(v) for v in traj.x]),
        "xi": np.stack([np.asarray(v) for v in traj.xi]),
        "path": np.stack([np.asarray(v) for v in traj.path]),
        "qoi_values": np.asarray(traj.qoi_values),
    }
    np.savez_compressed(path, **payload)


def load_trajectory(path):
    from calibr8_tpu.solve.primal import Trajectory
    import jax.numpy as jnp

    with np.load(path) as d:
        return Trajectory(
            x=[jnp.asarray(v) for v in d["x"]],
            xi=[jnp.asarray(v) for v in d["xi"]],
            path=[jnp.asarray(v) for v in d["path"]],
            qoi_values=list(d["qoi_values"]),
        )

"""Synthetic DIC data generation and field persistence.

The reference's `write synthetic: true` copies the mesh and stores the
per-step displacement solutions as nodal vector fields named
`measured_<step>` (reference: source/calibr8/src/synthetic.{hpp,cpp},
main_primal.cpp:240-242); calibration decks then point their `mesh file`
at the synthetic mesh directory.  Here fields live in Mesh.fields and
persist as a compressed .npz next to the mesh description.
"""

from __future__ import annotations

import numpy as np


def attach_synthetic(mesh, disc, traj) -> None:
    """Store the primal displacement trajectory as measured_<step>
    nodal fields on the mesh (steps 0..N)."""
    for step, x in enumerate(traj.x):
        u = np.asarray(x[: disc.n_dofs_u]).reshape(disc.n_nodes, disc.spec.dim)
        mesh.fields[f"measured_{step}"] = u.copy()


def save_fields(mesh, path) -> None:
    np.savez_compressed(path, **mesh.fields)


def load_fields(mesh, path) -> None:
    with np.load(path) as data:
        for k in data.files:
            mesh.fields[k] = data[k]


def perturb_measured(mesh, sigma: float, seed: int = 0, prefix="measured_"):
    """Add seeded Gaussian noise to every measured field — the analog of
    the `perturber` utility (reference: source/calibr8/src/perturber.cpp:20-50)
    used by the synthetic-DIC pipeline
    (examples/synthetic_calibration/forward/add_noise_and_filter.sh)."""
    rng = np.random.default_rng(seed)
    for k in list(mesh.fields):
        if k.startswith(prefix) and not k.endswith("_0"):
            mesh.fields[k] = mesh.fields[k] + sigma * rng.standard_normal(
                mesh.fields[k].shape
            )

"""Field-file utilities: the analogs of the reference's small data
executables (reference: test/vectorize.cpp, src/add_node_set_fields.cpp,
src/transfer_surface_data.cpp) operating on .npz nodal-field archives.
"""

from __future__ import annotations

import numpy as np


def vectorize_fields(data: dict, num_steps: int, comps=("ux", "uy", "uz")) -> dict:
    """Pack scalar per-component fields <comp>_<step> into vector
    measured_<step> fields (vectorize.cpp:34-40)."""
    out = dict(data)
    for step in range(num_steps + 1):
        cols = [
            data[f"{c}_{step}"] for c in comps if f"{c}_{step}" in data
        ]
        if cols:
            out[f"measured_{step}"] = np.stack(cols, axis=1)
    return out


def add_node_set_fields(mesh, names=None) -> None:
    """Attach indicator nodal fields (1 on the node set, 0 elsewhere) —
    used as EUCLID virtual fields (add_node_set_fields.cpp,
    disc.cpp compute_field_node_sets)."""
    names = names or list(mesh.node_sets)
    for name in names:
        f = np.zeros(mesh.n_nodes)
        f[np.asarray(mesh.node_sets[name])] = 1.0
        mesh.fields[name] = f


def transfer_surface_data(
    src_coords, src_fields: dict, tgt_coords, radius, order=2, prefix="measured_"
) -> dict:
    """Map measured (DIC-grid) data onto FE mesh nodes by moving least
    squares (transfer_surface_data.cpp / moving_least_squares_two_meshes.cpp)."""
    from calibr8_tpu.io.mls import mls_smooth

    out = {}
    for k, v in src_fields.items():
        if k.startswith(prefix):
            out[k] = mls_smooth(src_coords, v, tgt_coords, radius, order)
        else:
            out[k] = v
    return out

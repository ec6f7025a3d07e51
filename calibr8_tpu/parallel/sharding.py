"""SPMD sharding over a TPU device mesh.

The reference parallelizes by domain decomposition: one mesh part per
MPI rank, ghost-overlap assembly, Tpetra Export-ADD halo reductions and
PCU scalar reductions (reference: src/linear_alg.hpp:38-53,
disc.cpp:293-321, primal.cpp:100).  The TPU-native equivalent here is
GSPMD: element arrays (connectivity, geometry, local state, element
Jacobians) are sharded over the device mesh's 'elems' axis while DOF
vectors stay replicated; XLA then partitions every vmapped element
kernel by elements and lowers the segment_sum scatter to a local
partial sum + ICI all-reduce — exactly the Export-ADD pattern, without
writing message passing.  Scalar reductions (norms, dots) become psum
collectives inside the same programs.

This is the analog of the reference's single parallel strategy (domain
decomposition).  The second axis of parallelism — multi-experiment
batched calibration (independent problems, objective.hpp:41-45) — maps
to vmap/pmap over a leading experiment axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(n_devices=None, axis="elems") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_elements(disc, multiple: int):
    """Return a COPY of the Disc with the element axis padded so it
    divides the device count (the input Disc is left untouched — a
    padded Disc silently corrupts later single-device use).

    Padding elements scatter into dof 0 with zero geometry (detJ = 0
    kills their residual/Jacobian contributions; grad_N = 0 keeps the
    local solves trivially elastic)."""
    import copy

    n = disc.n_elem
    n_pad = (-n) % multiple
    if n_pad == 0:
        return disc, 0
    disc = copy.copy(disc)
    disc._node_inc = None  # cache depends on the element arrays

    def pad(x, value=0.0):
        pad_shape = (n_pad,) + tuple(x.shape[1:])
        return jnp.concatenate(
            [x, jnp.full(pad_shape, value, x.dtype)], axis=0
        )

    disc.edofs = pad(disc.edofs, 0)
    disc.conn = pad(disc.conn, 0)
    disc.grad_N = pad(disc.grad_N, 0.0)
    disc.detJ = pad(disc.detJ, 0.0)
    disc.h = pad(disc.h, 1.0)
    disc.es_ids = pad(disc.es_ids, 0)
    disc.n_elem = n + n_pad
    return disc, n_pad


def shard_disc(disc, mesh: Mesh, axis: str = "elems"):
    """Place the discretization's element arrays on the device mesh."""
    disc, n_pad = pad_elements(disc, int(np.prod(mesh.devices.shape)))
    se = NamedSharding(mesh, P(axis))
    for name in ("edofs", "conn", "grad_N", "detJ", "h", "es_ids"):
        setattr(disc, name, jax.device_put(getattr(disc, name), se))
    return disc, n_pad


def shard_elem_array(x, mesh: Mesh, axis: str = "elems"):
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))

"""Dirichlet and traction boundary conditions.

Dirichlet (reference: source/calibr8/src/dbcs.cpp): expression-based
`[resid_idx, eq, node_set, value_expr]` and field-based (measured data)
DBCs.  The reference zeroes the Jacobian row, keeps the diagonal, and
sets R_row = diag * (sol - value) (dbcs.cpp:88-105) so the Newton update
drives the dof to the prescribed value with preserved row scaling; we
apply the identical modification to the residual vector and to the EBE /
dense operator rows.

Traction (reference: source/calibr8/src/tbcs.cpp:18-84):
`[resid_idx, side_set, tx, ty(, tz)]`, R_u[n, d] -= T_d N_n w ds over
side-set facets (reference configuration).  For P1 facets with the
order-1 rule this is T(centroid) * area / nodes_per_facet per node.

BC values are evaluated host-side per load step (they depend only on
coordinates and time) and enter the jitted solvers as plain arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.expression import Expression
from calibr8_tpu.fem.geometry import compute_facet_geom


@dataclass
class DirichletSpec:
    resid_idx: int
    eq: int
    node_set: str
    value: str  # expression in x, y, z, t


@dataclass
class FieldDirichletSpec:
    """Measured-data (field-based) DBC: the prescribed value comes from
    the nodal field `<prefix>_<step>` (reference: dbcs.cpp
    apply_field_primal_dbcs, 'field' sublist; prefix 'measured')."""

    resid_idx: int
    eq: int
    node_set: str
    prefix: str = "measured"


@dataclass
class TractionSpec:
    resid_idx: int
    side_set: str
    values: tuple[str, ...]  # dim expressions


class DirichletBCs:
    def __init__(self, disc, specs: list[DirichletSpec], field_specs=None):
        self.disc = disc
        self.specs = specs
        self.field_specs = field_specs or []
        mesh = disc.mesh
        self._entries = []
        for s in specs:
            nodes = np.asarray(mesh.node_sets[s.node_set])
            dofs = disc.dof(s.resid_idx, nodes, s.eq)
            coords = mesh.coords[nodes]
            self._entries.append((dofs, coords, Expression(s.value)))
        self._field_entries = []
        for s in self.field_specs:
            nodes = np.asarray(mesh.node_sets[s.node_set])
            dofs = disc.dof(s.resid_idx, nodes, s.eq)
            self._field_entries.append((dofs, nodes, s.eq, s.prefix))
        all_dofs = [e[0] for e in self._entries] + [
            e[0] for e in self._field_entries
        ]
        dofs = (
            np.concatenate(all_dofs) if all_dofs else np.zeros(0, dtype=np.int64)
        )
        # de-duplicate (a corner node can appear in two bc sets); keep
        # the LAST occurrence, matching the reference's sequential
        # application order (dbcs.cpp loops entries in deck order).
        # Unique indices also keep the scatter ops transposable for
        # custom_linear_solve-based Krylov methods.
        rev_first = np.unique(dofs[::-1], return_index=True)[1]
        keep_rev = np.zeros(dofs.size, dtype=bool)
        keep_rev[rev_first] = True
        self._keep = keep_rev[::-1].copy()
        self.dofs = dofs[self._keep]

    def values(self, t: float, step: int = 0) -> np.ndarray:
        """Prescribed values aligned with self.dofs (expression entries
        evaluated at time t; field entries read measured_<step>)."""
        out = []
        for dofs, coords, expr in self._entries:
            x = coords[:, 0]
            y = coords[:, 1]
            z = coords[:, 2] if coords.shape[1] > 2 else np.zeros_like(x)
            v = expr(x=x, y=y, z=z, t=t)
            out.append(np.broadcast_to(np.asarray(v, dtype=np.float64), x.shape))
        for dofs, nodes, eq, prefix in self._field_entries:
            field = self.disc.mesh.fields.get(f"{prefix}_{step}")
            assert field is not None, f"{prefix}_{step} field missing for field DBC"
            out.append(np.asarray(field)[nodes, eq])
        vals = np.concatenate(out) if out else np.zeros(0, dtype=np.float64)
        return vals[self._keep] if vals.size else vals

    def arrays(self, t: float, step: int = 0):
        return (
            jnp.asarray(self.dofs, jnp.int32),
            jnp.asarray(self.values(t, step), self.disc.dtype),
        )


def apply_dbcs_residual(R, diag, x, bc_dofs, bc_vals):
    """R_row <- diag * (x_row - g)  (dbcs.cpp:100-101)."""
    return R.at[bc_dofs].set(
        diag[bc_dofs] * (x[bc_dofs] - bc_vals), unique_indices=True
    )


def apply_dbcs_matvec(Jv, diag, v, bc_dofs):
    """(J v)_row <- diag * v_row for constrained rows."""
    return Jv.at[bc_dofs].set(diag[bc_dofs] * v[bc_dofs], unique_indices=True)


def apply_dbcs_dense(A, diag, bc_dofs):
    A = A.at[bc_dofs, :].set(0.0)
    A = A.at[bc_dofs, bc_dofs].set(diag[bc_dofs])
    return A


def zero_dbc_rows(R, bc_dofs):
    """Adjoint variant: rows zeroed (dbcs.cpp:102-104)."""
    return R.at[bc_dofs].set(0.0, unique_indices=True)


class TractionBCs:
    def __init__(self, disc, specs: list[TractionSpec]):
        self.disc = disc
        self.specs = specs
        mesh = disc.mesh
        self._entries = []
        for s in specs:
            fg = compute_facet_geom(mesh, s.side_set)
            nfn = fg.nodes.shape[1]
            # nodal dof ids for each facet node, each eq: (n_faces, nfn, d)
            d = disc.spec.dim
            dofs = np.stack(
                [disc.u_dof(fg.nodes, eq) for eq in range(d)], axis=-1
            )
            centroids = mesh.coords[fg.nodes].mean(axis=1)
            exprs = [Expression(v) for v in s.values]
            self._entries.append((dofs, fg.area, centroids, exprs, nfn))

    def force_vector(self, t: float) -> np.ndarray:
        """Global vector T with T[dof] = integral of traction * basis;
        the residual update is R -= T (tbcs.cpp:77-80)."""
        out = np.zeros(self.disc.n_dofs)
        for dofs, area, centroids, exprs, nfn in self._entries:
            x = centroids[:, 0]
            y = centroids[:, 1]
            z = centroids[:, 2] if centroids.shape[1] > 2 else np.zeros_like(x)
            for eq, expr in enumerate(exprs):
                tvals = np.broadcast_to(
                    np.asarray(expr(x=x, y=y, z=z, t=t), dtype=np.float64), x.shape
                )
                contrib = tvals * area / nfn  # (n_faces,)
                np.add.at(
                    out,
                    dofs[:, :, eq].reshape(-1),
                    np.repeat(contrib, nfn),
                )
        return out

    def array(self, t: float) -> jnp.ndarray:
        return jnp.asarray(self.force_vector(t), self.disc.dtype)

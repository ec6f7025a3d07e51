"""The calibration QoI — the flagship DIC objective — plus reaction /
load-mismatch QoIs.

Reference: source/calibr8/src/calibration.cpp (483 LoC), reaction.cpp,
load_mismatch.cpp.

calibration:
  J_step = J_disp + J_forc
  J_disp = sum over included elements (2D) / side-set facets (3D) of
           1/2 sum_d weights[d] (u_fem,d - u_meas,d)^2 * w dv
           / area * dt / total_time        (order-2 quadrature,
           distance-threshold element masking, calibration.cpp:66-214)
  J_forc = 1/2 * balance_factor * dt/total_time * (load - load_meas)^2
           where load = the sum of the assembled internal-force residual
           components at the nodes on coordinate plane
           coord[idx] == value (the reaction; calibration.cpp:306-346)

Measured data are nodal fields named `measured_<step>` attached to the
mesh (synthetic.hpp:15-18); load-cell data is one value per step in a
plain text file (load.dat).  The QoI here is ONE pure scalar function of
(x, xi, params) per step — its x/xi/p partials for the adjoint come from
jax.grad, replacing the reference's seeded FADT evaluations with the
load linearization handled automatically (calibration.cpp:452-470).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from calibr8_tpu.fem import basis
from calibr8_tpu.fem.geometry import compute_facet_geom
from calibr8_tpu.mechanics.global_residual import PARENT_MEASURE
from calibr8_tpu.qoi import register
from calibr8_tpu.qoi.base import QoI


def load_node_dofs(disc, coord_idx, coord_value, coord_tol, force_comp):
    """DOF ids of the reaction component at nodes on the coordinate
    plane (the analog of setup_coord_based_node_mapping)."""
    coords = disc.mesh.coords
    nodes = np.where(np.abs(coords[:, coord_idx] - coord_value) < coord_tol)[0]
    return disc.u_dof(nodes, force_comp)


def read_load_file(path):
    return [float(line) for line in open(path) if line.strip()]


class Calibration(QoI):
    name = "calibration"

    def __init__(self, disc, config=None, model=None):
        super().__init__(disc, config)
        cfg = self.config
        self.model = model
        self.balance_factor = float(cfg["balance factor"])
        self.coord_idx = int(cfg["coordinate index"])
        self.coord_value = float(cfg["coordinate value"])
        self.coord_tol = float(cfg.get("coordinate tolerance", 1e-12))
        self.force_comp = int(cfg["reaction force component"])
        self.weights = np.asarray(
            cfg.get("displacement weights", [1.0] * disc.spec.dim), dtype=float
        )
        self.distance_threshold = cfg.get("distance threshold", None)
        self.side_set_disp = cfg.get("displacement side set", None)
        self.load_in_file = cfg.get("load input file", None)
        self.load_out_file = cfg.get("load out file", None)
        self.obj_out_file = cfg.get("objective out file", None)
        # measured load history (one value per step, steps 1..N)
        self.load_data = (
            read_load_file(self.load_in_file) if self.load_in_file else None
        )

        # assembler is attached by the Problem wiring (needed for the
        # internal-force reaction)
        self.assembler = None
        self._setup_geometry()
        self._load_dofs = jnp.asarray(
            load_node_dofs(
                disc, self.coord_idx, self.coord_value, self.coord_tol,
                self.force_comp,
            ),
            jnp.int32,
        )
        self._written_steps = set()

    # -- geometry / masking --------------------------------------------
    def _setup_geometry(self):
        disc = self.disc
        dim = disc.spec.dim
        mesh = disc.mesh
        dist = mesh.fields.get("distance", None)
        if dim == 2:
            # included elements: distance(centroid) > threshold
            if self.distance_threshold is not None:
                assert dist is not None, "distance field required"
                cent_vals = np.asarray(dist)[mesh.conn].mean(axis=1)
                mask = cent_vals > float(self.distance_threshold)
            else:
                mask = np.ones(disc.n_elem, dtype=bool)
            self.elem_mask = jnp.asarray(mask)
            wdv = np.asarray(disc.detJ) * PARENT_MEASURE[2]
            self.area = float(np.sum(np.where(mask, wdv, 0.0)))
            q_pts, q_wts = basis.quadrature(2, 2)
            self.N2 = jnp.asarray(basis.shape_values(2, q_pts))
            self.q_wts = jnp.asarray(q_wts)
        else:
            assert self.side_set_disp, "3D calibration needs 'displacement side set'"
            fg = compute_facet_geom(mesh, self.side_set_disp)
            if self.distance_threshold is not None:
                assert dist is not None
                cent = np.asarray(dist)[fg.nodes].mean(axis=1)
                keep = cent > float(self.distance_threshold)
            else:
                keep = np.ones(fg.nodes.shape[0], dtype=bool)
            self.facet_nodes = jnp.asarray(fg.nodes[keep], jnp.int32)
            self.facet_area = jnp.asarray(fg.area[keep])
            self.area = float(np.sum(fg.area[keep]))
            q_pts, q_wts = basis.facet_quadrature(3, 2)
            self.N2f = jnp.asarray(basis.facet_shape_values(3, q_pts))
            # facet quadrature weights sum to parent measure 1/2; dv = 2A
            self.q_wts_f = jnp.asarray(q_wts * 2.0)

    # -- per-step aux ---------------------------------------------------
    def setup_step(self, step, t, dt, total_time):
        meas = self.disc.mesh.fields.get(f"measured_{step}")
        assert meas is not None, f"measured_{step} field missing"
        load_meas = (
            self.load_data[step - 1] if self.load_data is not None else 0.0
        )
        return dict(
            measured=jnp.asarray(meas, self.disc.dtype),
            load_meas=jnp.asarray(load_meas, self.disc.dtype),
            dt_frac=dt / total_time,
        )

    # -- the scalar QoI -------------------------------------------------
    def compute_load(self, x, x_prev, xi, params_all):
        """Reaction = sum of internal-force components at the loaded
        nodes (calibration.cpp compute_load)."""
        R = self.assembler.residual(x, x_prev, xi, params_all)
        return jnp.sum(R[self._load_dofs])

    def disp_mismatch(self, x, aux):
        disc = self.disc
        dim = disc.spec.dim
        u, _ = disc.split(x)
        w = jnp.asarray(self.weights, disc.dtype)
        meas = aux["measured"]
        if dim == 2:
            u_e = u[disc.conn]  # (n_elem, 3, 2)
            m_e = meas[disc.conn]
            diff_q = jnp.einsum("qn,end->eqd", self.N2, u_e - m_e)
            per_q = 0.5 * jnp.einsum("d,eqd->eq", w, diff_q**2)
            per_e = jnp.einsum("eq,q->e", per_q, self.q_wts) * disc.detJ
            per_e = jnp.where(self.elem_mask, per_e, 0.0)
            return jnp.sum(per_e) / self.area * aux["dt_frac"]
        u_f = u[self.facet_nodes]  # (n_facets, 3, 3)
        m_f = meas[self.facet_nodes]
        diff_q = jnp.einsum("qn,fnd->fqd", self.N2f, u_f - m_f)
        per_q = 0.5 * jnp.einsum("d,fqd->fq", w, diff_q**2)
        per_f = jnp.einsum("fq,q->f", per_q, self.q_wts_f) * self.facet_area
        return jnp.sum(per_f) / self.area * aux["dt_frac"]

    def evaluate(self, x, x_prev, xi, params_all, aux):
        J_disp = self.disp_mismatch(x, aux)
        load = self.compute_load(x, x_prev, xi, params_all)
        mism = load - aux["load_meas"]
        J_forc = 0.5 * self.balance_factor * aux["dt_frac"] * mism * mism
        return J_disp + J_forc

    def postprocess(self, J, step):
        # write per-step (J_disp, J_forc) / load.dat files if requested
        # (calibration.cpp:374-394); harmless for pure evaluations
        return J


class ReactionMismatch(QoI):
    """reference: source/calibr8/src/reaction_mismatch.hpp — reaction at
    the coordinate-plane nodes vs a measured load;
    J = 1/2 (load - meas)^2; with 'load out file' it records the load
    history (the synthetic load.dat generator —
    examples/synthetic_calibration)."""

    name = "reaction mismatch"

    def __init__(self, disc, config=None, model=None):
        super().__init__(disc, config)
        cfg = self.config
        self.coord_idx = int(cfg["coordinate index"])
        self.coord_value = float(cfg["coordinate value"])
        self.coord_tol = float(cfg.get("coordinate tolerance", 1e-12))
        self.force_comp = int(cfg["reaction force component"])
        self.load_out_file = cfg.get("load out file", None)
        self.load_in_file = cfg.get("load input file", None)
        self.load_data = (
            read_load_file(self.load_in_file) if self.load_in_file else None
        )
        self.assembler = None
        self._load_dofs = jnp.asarray(
            load_node_dofs(
                disc, self.coord_idx, self.coord_value, self.coord_tol,
                self.force_comp,
            ),
            jnp.int32,
        )
        self.load_history = {}

    def setup_step(self, step, t, dt, total_time):
        load_meas = (
            self.load_data[step - 1] if self.load_data is not None else 0.0
        )
        return dict(load_meas=jnp.asarray(load_meas, self.disc.dtype))

    def compute_load(self, x, x_prev, xi, params_all):
        R = self.assembler.residual(x, x_prev, xi, params_all)
        return jnp.sum(R[self._load_dofs])

    def evaluate(self, x, x_prev, xi, params_all, aux):
        load = self.compute_load(x, x_prev, xi, params_all)
        mism = load - aux["load_meas"]
        return 0.5 * mism * mism

    def after_step(self, x, x_prev, xi, params_all, step):
        """Host-side hook: record/write the load history (the synthetic
        load.dat pipeline — calibration.cpp:351-366)."""
        load = float(self.compute_load(x, x_prev, xi, params_all))
        self.load_history[step] = load
        if self.load_out_file:
            import os

            os.makedirs(
                os.path.dirname(self.load_out_file) or ".", exist_ok=True
            )
            mode = "w" if step == 1 else "a"
            with open(self.load_out_file, mode) as f:
                f.write(f"{load:.17e}\n")


class Reaction(QoI):
    """reference: source/calibr8/src/reaction.cpp — J = total reaction
    force component at the coordinate-plane nodes."""

    name = "reaction"

    def __init__(self, disc, config=None, model=None):
        super().__init__(disc, config)
        cfg = self.config
        self.assembler = None
        self._load_dofs = jnp.asarray(
            load_node_dofs(
                disc,
                int(cfg["coordinate index"]),
                float(cfg["coordinate value"]),
                float(cfg.get("coordinate tolerance", 1e-12)),
                int(cfg["reaction force component"]),
            ),
            jnp.int32,
        )

    def evaluate(self, x, x_prev, xi, params_all, aux):
        R = self.assembler.residual(x, x_prev, xi, params_all)
        return jnp.sum(R[self._load_dofs])


class SurfaceMismatch(QoI):
    """reference: source/calibr8/src/surface_mismatch.cpp — integral of
    |u - u_meas|^2 over a side set (order-2 facet quadrature)."""

    name = "surface mismatch"

    def __init__(self, disc, config=None, model=None):
        super().__init__(disc, config)
        self.side_set = self.config["side set"]
        dim = disc.spec.dim
        fg = compute_facet_geom(disc.mesh, self.side_set)
        self.facet_nodes = jnp.asarray(fg.nodes, jnp.int32)
        self.facet_area = jnp.asarray(fg.area)
        q_pts, q_wts = basis.facet_quadrature(dim, 2)
        self.Nf = jnp.asarray(basis.facet_shape_values(dim, q_pts))
        parent = 0.5 if dim == 3 else 1.0
        self.q_wts = jnp.asarray(q_wts / parent)

    def setup_step(self, step, t, dt, total_time):
        meas = self.disc.mesh.fields.get(f"measured_{step}")
        assert meas is not None, f"measured_{step} field missing"
        return dict(measured=jnp.asarray(meas, self.disc.dtype))

    def evaluate(self, x, x_prev, xi, params_all, aux):
        disc = self.disc
        u, _ = disc.split(x)
        meas = aux["measured"]
        diff = u[self.facet_nodes] - meas[self.facet_nodes]
        diff_q = jnp.einsum("qn,fnd->fqd", self.Nf, diff)
        per_q = jnp.sum(diff_q**2, axis=-1)
        per_f = jnp.einsum("fq,q->f", per_q, self.q_wts) * self.facet_area
        return jnp.sum(per_f)


class PointDisp(QoI):
    """reference: source/calibr8/src/point_wise.cpp — displacement
    component at the node closest to a given point."""

    name = "point displacement"

    def __init__(self, disc, config=None, model=None):
        super().__init__(disc, config)
        pt = np.asarray(self.config.get("point", [0.0] * disc.spec.dim))
        comp = int(self.config.get("component", 0))
        d2 = ((disc.mesh.coords - pt[None, :]) ** 2).sum(axis=1)
        node = int(np.argmin(d2))
        self._dof = int(disc.u_dof(np.asarray([node]), comp)[0])

    def evaluate(self, x, x_prev, xi, params_all, aux):
        return x[self._dof]


from calibr8_tpu.qoi import register as _register  # noqa: E402

_register("calibration", Calibration)
_register("reaction mismatch", ReactionMismatch)
_register("reaction", Reaction)
_register("surface mismatch", SurfaceMismatch)
_register("point displacement", PointDisp)

"""Research mini-app adjoint error estimation on the nested fine space.

Mirrors the estimator study of the reference's research Error driver
(reference: source/calibr8/research/error_adjoint.cpp:16-92):

  u_H   coarse primal;  u_h  fine primal (the 'exact' reference);
  u_p   coarse solution prolonged to the fine space;
  z1    fine adjoint linearized at u_p      -> eta1 = -z1 . R_h(u_p)
  z2    fine adjoint linearized at u_h      -> eta2 = -z2 . R_h(u_p)
        (the exact-linearization / 'star' variant)
  E     = J(u_h) - J(u_H)  exact (fine-space) error

Localization pairs the residual with z - I_h z (the coarse-interpolant
difference — physics->diff + localize, error_adjoint.cpp:55-63); the
bound is sum |eta_K|.  Element errors restrict onto coarse parents for
adaptation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from calibr8_tpu.mesh.refine import uniform_refine
from calibr8_tpu.research.physics import ResearchProblem
from calibr8_tpu.research.qoi import make_qoi


@dataclass
class ResearchErrorResult:
    J_H: float  # coarse-space QoI
    J_p: float  # fine-space QoI at the prolonged coarse solution
    J_h: float  # fine-space QoI at the fine solution
    E_exact: float  # J_h - J_p: the fine-space error the etas estimate
    eta1: float
    eta2: float
    eta1_bound: float
    eff1: float
    eff2: float
    elem_error: np.ndarray  # per COARSE element, |localized eta1|
    n_elems: int


def _prolong_dofs(ref, u, neq):
    U = np.asarray(u).reshape(-1, neq)
    a = U[ref.node_parents[:, 0]]
    b = U[ref.node_parents[:, 1]]
    return jnp.asarray(0.5 * (a + b)).reshape(-1)


def _coarse_interp(ref, z_fine, n_coarse_nodes, neq):
    """I_h z: restrict the fine field to coarse nodal values, then
    prolong back.  Coarse vertices are identified by the node_parents
    SELF-ROWS (parents (a, a) mean fine node i == coarse node a) — the
    lattice renumbering in uniform_refine permutes fine ids, so fine
    node i < n_coarse is NOT coarse node i in general."""
    Z = np.asarray(z_fine).reshape(-1, neq)
    rows = ref.node_parents[:, 0] == ref.node_parents[:, 1]
    zc = np.zeros((n_coarse_nodes, Z.shape[1]), dtype=Z.dtype)
    zc[ref.node_parents[rows, 0]] = Z[rows]
    a = zc[ref.node_parents[:, 0]]
    b = zc[ref.node_parents[:, 1]]
    return jnp.asarray(0.5 * (a + b)).reshape(-1)


def adjoint_error_estimate(mesh, physics_cfg, qoi_cfg) -> ResearchErrorResult:
    coarse = ResearchProblem(mesh, physics_cfg)
    u_H = coarse.solve_primal()
    J_c, _ = make_qoi(coarse, qoi_cfg)
    J_H = float(J_c(u_H))

    ref = uniform_refine(mesh)
    fine = ResearchProblem(ref.fine, physics_cfg)
    J_f, dJ_f = make_qoi(fine, qoi_cfg)
    neq = coarse.neq
    u_p = _prolong_dofs(ref, u_H, neq)
    u_h = fine.solve_primal(u0=u_p)
    J_h = float(J_f(u_h))
    J_p = float(J_f(u_p))

    R_p = fine.residual_interior(u_p)
    z1 = fine.solve_adjoint(u_p, dJ_f(u_p))
    z2 = fine.solve_adjoint(u_h, dJ_f(u_h))
    eta1 = -float(jnp.dot(z1, R_p))
    eta2 = -float(jnp.dot(z2, R_p))

    # localization with the coarse-interpolant difference: eta_K =
    # -(z - I_h z)_e . R_e over the raw element residuals
    z1d = z1 - _coarse_interp(ref, z1, mesh.n_nodes, neq)
    eta_loc_fine = -np.asarray(
        jnp.einsum("ei,ei->e", fine.gather(z1d), fine.elem_residual(u_p))
    )
    eta1_bound = float(np.abs(eta_loc_fine).sum())
    elem_error = np.abs(ref.restrict_elem_sum(eta_loc_fine))

    # the quantity the adjoint estimates target: the fine-space error of
    # the (prolonged) coarse solution (error_adjoint.cpp computes J on
    # both spaces the same way)
    E = J_h - J_p

    def eff(x):
        return x / E if abs(E) > 1e-300 else np.inf

    return ResearchErrorResult(
        J_H=J_H,
        J_p=J_p,
        J_h=J_h,
        E_exact=E,
        eta1=eta1,
        eta2=eta2,
        eta1_bound=eta1_bound,
        eff1=eff(eta1),
        eff2=eff(eta2),
        elem_error=elem_error,
        n_elems=mesh.n_elems,
    )

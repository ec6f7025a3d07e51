"""Research mini-app QoIs (reference: source/calibr8/research/
qoi_value.hpp, qoi_gradient.hpp, qoi_sqrt_gradient.hpp, qoi_point.hpp,
qoi_vm.hpp, registry qoi.cpp:118-129):

  value          int_box u_eq^beta dv
  gradient       int_box |grad u_eq|^2 dv
  sqrt gradient  int_box |grad u_eq| dv
  point          u_eq at the node nearest (x, y)
  von mises      int_box sqrt(3/2) |dev sigma(F)| dv (nlelasticity)

All are pure scalar functions of the dof vector; dJ/du is jax.grad —
the analog of the QoI<FADT> seeded evaluations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_qoi(prob, cfg):
    """Returns (J(u) -> scalar, dJ(u) -> (n_dofs,))."""
    cfg = dict(cfg)
    qtype = cfg.get("type", "value")
    eq = int(cfg.get("eq", 0))
    neq, npe, d = prob.neq, prob.npe, prob.dim

    if qtype == "point":
        pt = np.array([float(cfg["x"]), float(cfg.get("y", 0.0))])
        node = int(
            np.argmin(
                np.linalg.norm(np.asarray(prob.mesh.coords)[:, :2] - pt, axis=1)
            )
        )

        def J(u):
            return u[node * neq + eq]

    else:
        box = (
            float(cfg.get("xmin", -np.inf)),
            float(cfg.get("xmax", np.inf)),
            float(cfg.get("ymin", -np.inf)),
            float(cfg.get("ymax", np.inf)),
        )
        # quadrature-point box mask (is_inside, qoi_value.hpp:33-38)
        xq = np.asarray(prob.xq)
        inside = jnp.asarray(
            (
                (box[0] <= xq[..., 0])
                & (xq[..., 0] <= box[1])
                & (box[2] <= xq[..., 1])
                & (xq[..., 1] <= box[3])
            ).astype(np.float64)
        )  # (n_elem, npts)
        beta = float(cfg.get("beta", 1.0))

        def J(u):
            u_e = prob.gather(u)  # (n_elem, npe*neq)
            U = u_e.reshape(prob.n_elem, npe, neq)
            w = prob.wq[None, :] * prob.detJ[:, None] * inside

            if qtype == "value":
                u_q = jnp.einsum("qn,enc->eqc", prob.Nq, U)[..., eq]
                return jnp.sum(w * u_q**beta)
            if qtype in ("gradient", "sqrt gradient"):
                gu = jnp.einsum("enc,end->ecd", U, prob.grad_N)[:, eq, :]
                g2 = jnp.sum(gu * gu, axis=1)  # (n_elem,)
                if qtype == "sqrt gradient":
                    g2 = jnp.sqrt(g2 + 1e-30)
                return jnp.sum(w * g2[:, None])
            if qtype == "von mises":
                assert prob.kind == "nlelasticity"
                mat = prob.cfg.get("materials", {"E": 10.0, "nu": 0.3})
                E, nu = float(mat["E"]), float(mat["nu"])
                mu = E / (2.0 * (1.0 + nu))
                kap = E / (3.0 * (1.0 - 2.0 * nu))
                gu = jnp.einsum("enc,end->ecd", U, prob.grad_N)
                I = jnp.eye(d, dtype=u.dtype)
                F = gu + I
                Jd = jnp.linalg.det(F)
                b = jnp.einsum("eij,ekj->eik", F, F)
                Jm53 = jnp.exp(-5.0 / 3.0 * jnp.log(Jd))
                dev_b = b - (jnp.trace(b, axis1=1, axis2=2) / 3.0)[
                    :, None, None
                ] * I
                p = 0.5 * kap * (Jd - 1.0 / Jd)
                sigma = mu * Jm53[:, None, None] * dev_b + p[:, None, None] * I
                dev = sigma - (jnp.trace(sigma, axis1=1, axis2=2) / 3.0)[
                    :, None, None
                ] * I
                vm = jnp.sqrt(1.5 * jnp.sum(dev * dev, axis=(1, 2)) + 1e-30)
                return jnp.sum(w * vm[:, None])
            raise ValueError(f"unknown research qoi {qtype!r}")

    return J, jax.grad(J)

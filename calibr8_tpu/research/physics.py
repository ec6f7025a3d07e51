"""Research mini-app physics: nonlinear Poisson + Neo-Hookean elasticity.

Re-design of the reference's research residuals
(reference: source/calibr8/research/nlpoisson.{hpp,cpp},
nlelasticity.hpp, physics.cpp, residual.{hpp,cpp}):

  nlpoisson    R_n = int (1 + alpha u^2) grad(u) . grad(N_n) - f N_n dv
               with the manufactured solution
               u* = exp(2.5(x+y)) sin(2 pi x) sin(2 pi y) on the unit
               square; the forcing f = -div((1 + alpha u*^2) grad u*)
               is derived by AUTODIFF of u* (the reference hand-expands
               it over 20 lines, nlpoisson.cpp:5-27 — jax.grad replaces
               the symbolic algebra);
  nlelasticity R_n,i = int P(F) : grad(N_n) dv with compressible
               Neo-Hookean sigma = mu J^{-5/3} dev(b) + k/2 (J - 1/J) I
               and P = sigma cof(F) (nlelasticity.hpp compute_sigma).

Both are displacement-style P1 FEM on simplices with the element loop
as one vmapped pure function and jacfwd element Jacobians — the same
architecture as the main framework, kept standalone because the
research code deliberately carries its own Physics/Error/Adapt stack
(research.cpp:12-40).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from calibr8_tpu.fem import basis
from calibr8_tpu.fem.geometry import compute_elem_geom
from calibr8_tpu.solve.krylov import gmres_counted
from calibr8_tpu.utils.smallsolve import gauss_solve_T


def u_manufactured(xy):
    """nlpoisson manufactured solution (vanishes on the unit-square
    boundary)."""
    x, y = xy[0], xy[1]
    return (
        jnp.exp(2.5 * (x + y))
        * jnp.sin(2.0 * np.pi * x)
        * jnp.sin(2.0 * np.pi * y)
    )


def poisson_force(xy, alpha):
    """f = -div((1 + alpha u*^2) grad u*) by nested autodiff."""

    def flux(p):
        u = u_manufactured(p)
        return (1.0 + alpha * u * u) * jax.grad(u_manufactured)(p)

    return -jnp.trace(jax.jacfwd(flux)(xy))


class ResearchProblem:
    """One physics instance on one mesh (the Physics analog)."""

    def __init__(self, mesh, cfg, dtype=jnp.float64):
        self.mesh = mesh
        self.cfg = dict(cfg)
        self.kind = self.cfg.get("type", "nlpoisson")
        self.dim = mesh.dim
        self.dtype = dtype
        d = self.dim
        self.neq = 1 if self.kind == "nlpoisson" else d
        self.npe = d + 1

        geom = compute_elem_geom(mesh)
        self.grad_N = jnp.asarray(geom.grad_N, dtype)
        self.detJ = jnp.asarray(geom.detJ, dtype)
        self.conn = jnp.asarray(mesh.conn, jnp.int32)
        self.n_elem = mesh.n_elems
        self.n_nodes = mesh.n_nodes
        self.n_dofs = self.n_nodes * self.neq

        # order-2 quadrature (source/body terms, QoIs)
        q_pts, q_wts = basis.quadrature(d, 2)
        N = basis.shape_values(d, q_pts)  # (npts, npe)
        self.Nq = jnp.asarray(N, dtype)
        self.wq = jnp.asarray(q_wts, dtype)
        coords = np.asarray(mesh.coords)
        self.xq = jnp.asarray(
            np.einsum("qn,enk->eqk", N, coords[np.asarray(mesh.conn)]), dtype
        )  # (n_elem, npts, d)

        self._elem_res = self._make_elem_residual()
        self.bc_dofs, self.bc_vals = self._bcs()

    # -- boundary conditions --------------------------------------------
    def _bcs(self):
        """nlpoisson: homogeneous Dirichlet on the whole boundary (the
        manufactured solution vanishes there); nlelasticity: expression
        DBCs from the deck (bcs sublist: name: [eq, node_set, value])."""
        mesh = self.mesh
        if self.kind == "nlpoisson":
            nodes = np.unique(
                np.concatenate(
                    [np.asarray(v) for v in mesh.node_sets.values()]
                )
            )
            dofs = nodes * self.neq
            return jnp.asarray(dofs, jnp.int32), jnp.zeros(
                len(dofs), self.dtype
            )
        from calibr8_tpu.expression import Expression

        dofs, vals = [], []
        for _, (eq, ns, expr) in sorted(self.cfg.get("bcs", {}).items()):
            nodes = np.asarray(mesh.node_sets[ns])
            c = np.asarray(mesh.coords)[nodes]
            x, y = c[:, 0], c[:, 1]
            z = c[:, 2] if c.shape[1] > 2 else np.zeros_like(x)
            v = np.broadcast_to(
                np.asarray(Expression(str(expr))(x=x, y=y, z=z, t=1.0)),
                x.shape,
            )
            dofs.append(nodes * self.neq + int(eq))
            vals.append(v.astype(np.float64))
        dofs = np.concatenate(dofs) if dofs else np.zeros(0, np.int64)
        vals = np.concatenate(vals) if vals else np.zeros(0)
        # de-duplicate, last occurrence wins (deck order)
        _, first = np.unique(dofs[::-1], return_index=True)
        keep = np.zeros(len(dofs), bool)
        keep[len(dofs) - 1 - first] = True
        return (
            jnp.asarray(dofs[keep], jnp.int32),
            jnp.asarray(vals[keep], self.dtype),
        )

    # -- element residual -------------------------------------------------
    def _make_elem_residual(self):
        d, npe, neq = self.dim, self.npe, self.neq

        if self.kind == "nlpoisson":
            alpha = float(self.cfg.get("alpha", 1.0))

            def f(u_e, gN, dJ, xq):
                # u_e (npe,), gN (npe, d), xq (npts, d)
                gu = jnp.sum(u_e[:, None] * gN, axis=0)  # (d,)
                u_q = self.Nq @ u_e  # (npts,)
                kappa_q = 1.0 + alpha * u_q * u_q
                # stiffness with the order-2 rule (kappa varies in-element,
                # grad u is P1-constant); force integrated with the same rule
                rows = jnp.zeros(npe, u_e.dtype)
                for q in range(self.Nq.shape[0]):
                    wk = self.wq[q] * dJ * kappa_q[q]
                    rows = rows + wk * (gN @ gu)
                    fq = poisson_force(xq[q], alpha)
                    rows = rows - self.wq[q] * dJ * fq * self.Nq[q]
                return rows

            return f

        # nlelasticity (Neo-Hookean, nlelasticity.hpp compute_sigma)
        mat = self.cfg.get("materials", {"E": 10.0, "nu": 0.3})
        E, nu = float(mat["E"]), float(mat["nu"])
        mu = E / (2.0 * (1.0 + nu))
        kappa = E / (3.0 * (1.0 - 2.0 * nu))

        def f(u_e, gN, dJ, xq):
            U = u_e.reshape(npe, d)
            gu = jnp.sum(U[:, :, None] * gN[:, None, :], axis=0)
            F = gu + jnp.eye(d, dtype=u_e.dtype)
            J = jnp.linalg.det(F)
            b = F @ F.T
            Jm53 = jnp.exp(-5.0 / 3.0 * jnp.log(J))
            dev_b = b - jnp.trace(b) / 3.0 * jnp.eye(d, dtype=u_e.dtype)
            p = 0.5 * kappa * (J - 1.0 / J)
            sigma = mu * Jm53 * dev_b + p * jnp.eye(d, dtype=u_e.dtype)
            P = sigma @ (J * jnp.linalg.inv(F).T)  # sigma cof(F)
            meas = {2: 0.5, 3: 1.0 / 6.0}[d]
            R = jnp.einsum("ij,nj->ni", P, gN) * (dJ * meas)
            return R.reshape(-1)

        return f

    # -- assembly ---------------------------------------------------------
    def gather(self, u):
        return u.reshape(self.n_nodes, self.neq)[self.conn].reshape(
            self.n_elem, -1
        )

    def scatter(self, R_e):
        rows = R_e.reshape(self.n_elem * self.npe, self.neq)
        out = jax.ops.segment_sum(
            rows, self.conn.reshape(-1), num_segments=self.n_nodes
        )
        return out.reshape(-1)

    @partial(jax.jit, static_argnums=0)
    def residual(self, u):
        """Assembled residual with Dirichlet rows u - g."""
        R = self.scatter(
            jax.vmap(self._elem_res)(
                self.gather(u), self.grad_N, self.detJ, self.xq
            )
        )
        return R.at[self.bc_dofs].set(
            u[self.bc_dofs] - self.bc_vals, unique_indices=True
        )

    @partial(jax.jit, static_argnums=0)
    def elem_residual(self, u):
        """Raw per-element residual vectors (n_elem, npe*neq) — the
        localization pairs these with adjoint-difference weights."""
        return jax.vmap(self._elem_res)(
            self.gather(u), self.grad_N, self.detJ, self.xq
        )

    @partial(jax.jit, static_argnums=0)
    def residual_interior(self, u):
        """Residual with Dirichlet rows ZEROED (error-estimation weight
        pairing: constrained rows carry no error)."""
        R = self.scatter(
            jax.vmap(self._elem_res)(
                self.gather(u), self.grad_N, self.detJ, self.xq
            )
        )
        return R.at[self.bc_dofs].set(0.0, unique_indices=True)

    @partial(jax.jit, static_argnums=0)
    def elem_jacobian(self, u):
        """(n_elem, nde, nde) element tangents by jacfwd (trailing vmap)."""
        u_e = self.gather(u)

        def one(ue, gN, dJ, xq):
            return jax.jacfwd(lambda v: self._elem_res(v, gN, dJ, xq))(ue)

        return jax.vmap(one)(u_e, self.grad_N, self.detJ, self.xq)

    def _matvec(self, J_e, v, transpose=False):
        op = J_e.swapaxes(-1, -2) if transpose else J_e
        v_e = self.gather(v)
        out = self.scatter(jnp.einsum("eij,ej->ei", op, v_e))
        return out.at[self.bc_dofs].set(v[self.bc_dofs], unique_indices=True)

    def _solve_lin(self, J_e, b, transpose=False, tol=1e-11):
        """Jacobi-preconditioned GMRES on the EBE operator."""
        diag = self.scatter(jnp.diagonal(J_e, axis1=1, axis2=2))
        diag = diag.at[self.bc_dofs].set(1.0, unique_indices=True)
        safe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
        x, info = gmres_counted(
            lambda v: self._matvec(J_e, v, transpose),
            b,
            M=lambda v: v / safe,
            tol=tol,
            maxiter=2000,
            restart=200,
        )
        if not info.converged:
            raise RuntimeError(
                f"research linear solve stalled (relres {info.relres:.2e})"
            )
        return x

    # -- solvers -----------------------------------------------------------
    def solve_primal(self, u0=None, max_iters=30, tol=1e-10):
        u = (
            jnp.zeros(self.n_dofs, self.dtype)
            if u0 is None
            else jnp.asarray(u0, self.dtype)
        )
        prev = np.inf
        for it in range(max_iters):
            R = self.residual(u)
            norm = float(jnp.linalg.norm(R))
            if norm < tol:
                return u
            # linear-solver floor: on large adapted meshes the inner
            # GMRES (tol 1e-11) caps the achievable ||R|| just above
            # the absolute tol — a stalled iterate within two decades
            # of tol is converged, not failed
            if norm > 0.9 * prev and norm <= 100.0 * tol:
                return u
            prev = norm
            J_e = self.elem_jacobian(u)
            du = self._solve_lin(J_e, -R)
            # simple backtracking
            alpha = 1.0
            for _ in range(8):
                n2 = float(jnp.linalg.norm(self.residual(u + alpha * du)))
                if n2 < norm or not np.isfinite(n2):
                    if np.isfinite(n2):
                        break
                alpha *= 0.5
            u = u + alpha * du
        if norm <= 100.0 * tol:
            return u
        raise RuntimeError(f"research Newton failed (||R|| = {norm:.3e})")

    def solve_adjoint(self, u_lin, dJ_du):
        """J(u_lin)^T z = dJ/du with zero rows at constrained dofs."""
        J_e = self.elem_jacobian(u_lin)
        rhs = dJ_du.at[self.bc_dofs].set(0.0, unique_indices=True)
        return self._solve_lin(J_e, rhs, transpose=True)

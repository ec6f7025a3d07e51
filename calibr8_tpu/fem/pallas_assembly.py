"""Pallas fused element-assembly kernel.

The XLA path (fem/assembly.py) is HBM-bandwidth bound: the many-seed
tangent passes of the fused [C; R] Jacobian spill intermediates, moving
~220 KB per element where ~1 KB is mathematically necessary (measured
with compiled.cost_analysis: 43 GB accessed for 196k elements).  This
kernel runs the ENTIRE assembly — the local constitutive solve, the
fused [C; R] linearization, and the static condensation
J = dR/dx - dR/dxi (dC/dxi)^{-1} dC/dx (reference evaluations.cpp:112)
— inside one Pallas program per element block, holding everything in
VMEM with the element axis on the 128 lanes.

Mosaic (the Pallas TPU compiler) cannot lower most of the code patterns
that vmapping per-element model functions produces (vector-valued while
conditions, i1 loop carries, scatters from .at[].set seeds, and — fatal
— broadcasts of unbatched constants emitted by vmap's batching rules,
which crash layout inference).  So the kernel uses hand-batched
trailing-layout model twins (models/batched.py) and a hand-batched
mechanics residual below; only models with a batched twin get this fast
path, everything else stays on the XLA path (solve/newton.py picks
automatically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from calibr8_tpu.fem import basis
from calibr8_tpu.models.base import Kinematics
from calibr8_tpu.models.batched import get_batched_model, usum
from calibr8_tpu.utils.smallsolve import gauss_solve_T

PARENT_MEASURE = {2: 0.5, 3: 1.0 / 6.0}


def supports_pallas(assembler) -> bool:
    return (
        get_batched_model(assembler.model) is not None
        and assembler.spec.mixed
        and not assembler.spec.plane_stress
    )


def _grad_u(u_T, gNT, d, npe):
    """grad_u[i, j] = sum_n u[n, i] dN_n/dx_j, built from rank-1 (E,)
    vector FMAs and stacks (the only broadcast Mosaic reliably lowers is
    the lane-aligned rank-1 -> rank-k one)."""
    rows = []
    for i in range(d):
        cols = []
        for j in range(d):
            acc = u_T[0, i] * gNT[0, j]
            for n in range(1, npe):
                acc = acc + u_T[n, i] * gNT[n, j]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def _batched_kinematics(spec, x_eT, xp_eT, gNT, block_e):
    d, npe = spec.dim, spec.npe
    u_T = x_eT.reshape(npe, spec.ndofs_per_node, block_e)[:, :d]
    up_T = xp_eT.reshape(npe, spec.ndofs_per_node, block_e)[:, :d]
    return Kinematics(
        grad_u=_grad_u(u_T, gNT, d, npe),
        grad_u_prev=_grad_u(up_T, gNT, d, npe),
    )


def make_batched_elem_residual(bmodel, spec, N1_np, q1w_np):
    """Trailing-layout mechanics residual (mechanics.cpp analog of
    mechanics/global_residual.py:make_elem_residual, hand-batched for
    Mosaic).  The static quadrature tables enter as Python float
    immediates in fully unrolled loops (scalar immediates are fine in
    Pallas; array constants and size-1 broadcast dims are not).
    R(x_eT (nde,E), xp_eT, xiT, gNT (npe,d,E), dJ (E,), h (E,), parT)
    -> (nde, E) node-interleaved."""
    d, npe, ndpn = spec.dim, spec.npe, spec.ndofs_per_node
    meas0 = PARENT_MEASURE[d]
    N1v = [[float(N1_np[q, n]) for n in range(npe)] for q in range(N1_np.shape[0])]
    w1v = [float(w) for w in np.asarray(q1w_np).ravel()]
    npts1 = len(w1v)

    def f(x_eT, xp_eT, xiT, gNT, dJ, hh, parT):
        E = x_eT.shape[-1]
        kin = _batched_kinematics(spec, x_eT, xp_eT, gNT, E)
        xm = x_eT.reshape(npe, ndpn, E)
        p_eT = xm[:, d]  # (npe, E)
        wdv0 = dJ * meas0  # (E,)

        p_ip = usum(p_eT, 0) * (1.0 / npe)
        sigma = bmodel.cauchy(xiT, kin, parT, p_ip)  # (d, d, E)

        mu = parT[0] / (2.0 * (1.0 + parT[1]))
        psf = bmodel.pressure_scale_factor(parT)
        hydro = bmodel.hydro_cauchy(xiT, kin, parT)  # (E,)
        R_p_const = -(hydro / psf) * (1.0 / npe) * wdv0  # (E,), same per node

        # grad_p[j] = sum_n p[n] gN[n, j]; stab term tau * grad_p
        tau = spec.stab_multiplier * 0.5 * hh * hh / mu  # (E,)
        grad_p = []
        for j in range(d):
            acc = p_eT[0] * gNT[0, j]
            for n in range(1, npe):
                acc = acc + p_eT[n] * gNT[n, j]
            grad_p.append(acc)

        # ip set 1 (order 2): -(p/psf) N_n w dv, unrolled over q and n
        p_q = [
            sum(N1v[q][n] * p_eT[n] for n in range(npe)) for q in range(npts1)
        ]
        coef = [(p_q[q] / psf) * (w1v[q] * dJ) for q in range(npts1)]

        # node-interleaved pack [u_0..u_{d-1}, p] per node, each row a
        # rank-1 (E,) vector expression
        rows = []
        for n in range(npe):
            for i in range(d):
                acc = sigma[i, 0] * gNT[n, 0]
                for j in range(1, d):
                    acc = acc + sigma[i, j] * gNT[n, j]
                rows.append(acc * wdv0)
            stab_n = grad_p[0] * gNT[n, 0]
            for j in range(1, d):
                stab_n = stab_n + grad_p[j] * gNT[n, j]
            r_p1_n = sum(coef[q] * N1v[q][n] for q in range(npts1))
            rows.append(R_p_const - tau * stab_n * wdv0 - r_p1_n)
        return jnp.stack(rows, axis=0)

    return f


def make_pallas_assemble(assembler, block_e: int = 1024, interpret: bool = False):
    """Build assemble(x, x_prev, xi_prev, params_all) ->
    (R (n_dofs,), J_e (n_elem, nde, nde), diag, xi, path, nfail)."""
    disc = assembler.disc
    model, spec = assembler.model, assembler.spec
    bmodel = get_batched_model(model)
    if bmodel is None:
        raise ValueError(f"no batched twin for model '{model.name}'")
    nxi = assembler.nxi
    nde = spec.ndofs_elem
    npe = spec.npe
    d = spec.dim
    n_elem = disc.n_elem
    npar = model.n_params

    E_pad = ((n_elem + block_e - 1) // block_e) * block_e
    n_blocks = E_pad // block_e
    pad = E_pad - n_elem

    def pad_T(a, fill=0.0):
        a = np.asarray(a)
        out = np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )
        return jnp.asarray(np.moveaxis(out, 0, -1))

    gN_T = pad_T(disc.grad_N)  # (npe, d, E)
    detJ_T = pad_T(np.asarray(disc.detJ))[None, :]  # (1, E)
    h_T = pad_T(np.asarray(disc.h), fill=1.0)[None, :]  # (1, E)
    es_pad = np.concatenate([np.asarray(disc.es_ids), np.zeros(pad, np.int32)])

    q1_pts, q1w_np = basis.quadrature(d, 2)
    N1_np = basis.shape_values(d, q1_pts)
    npts1 = N1_np.shape[0]

    elem_res = make_batched_elem_residual(bmodel, spec, N1_np, q1w_np)

    def kernel(x_ref, xp_ref, xip_ref, gN_ref, dJ_ref, h_ref, par_ref,
               iota_ref, R_ref, J_ref, xi_ref, path_ref, fail_ref):
        x_eT = x_ref[...]
        xp_eT = xp_ref[...]
        xipT = xip_ref[...]
        gNT = gN_ref[...]
        dJ = dJ_ref[...][0]
        hh = h_ref[...][0]
        parT = par_ref[...]

        kin = _batched_kinematics(spec, x_eT, xp_eT, gNT, block_e)
        xiT, pathv, failv = bmodel.local_solve(xipT, kin, parT)

        def G(v):
            xi_ = v[:nxi]
            xe_ = v[nxi:]
            kin_ = _batched_kinematics(spec, xe_, xp_eT, gNT, block_e)
            C = bmodel.residual(xi_, xipT, kin_, parT, pathv)
            R = elem_res(xe_, xp_eT, xi_, gNT, dJ, hh, parT)
            return jnp.concatenate([C, R], axis=0)

        v0 = jnp.concatenate([xiT, x_eT], axis=0)
        G0, lin = jax.linearize(G, v0)
        # host-provided iota: an in-kernel broadcasted_iota one-hot gets
        # constant-folded by Mosaic into shapes that crash its layout
        # passes, so the row-index matrix arrives as a runtime input
        rows = iota_ref[...]
        # cols[j] = dG/dv_j as a (nxi+nde, E) column; all downstream
        # matrices are assembled from rank-1 (E,) slices with axis-0
        # stacks — the only construction Mosaic reliably lowers
        # (jnp.stack(cols, axis=1) crashes layout inference)
        cols = [lin((rows == k).astype(v0.dtype)) for k in range(nxi + nde)]

        dC_dxi = jnp.stack(
            [jnp.stack([cols[k][i] for k in range(nxi)], 0) for i in range(nxi)],
            0,
        )
        dC_dx = jnp.stack(
            [
                jnp.stack([cols[nxi + j][i] for j in range(nde)], 0)
                for i in range(nxi)
            ],
            0,
        )
        dxi_dx = -gauss_solve_T(dC_dxi, dC_dx)  # (nxi, nde, E)
        # J row i = dR_i/dx + sum_k dR_i/dxi_k * dxi_k/dx, rank-1 FMAs
        jrows = []
        for i in range(nde):
            row = jnp.stack([cols[nxi + j][nxi + i] for j in range(nde)], 0)
            for k in range(nxi):
                row = row + cols[k][nxi + i] * dxi_dx[k]
            jrows.append(row)
        J_T = jnp.stack(jrows, axis=0)

        R_ref[...] = G0[nxi:]
        J_ref[...] = J_T
        xi_ref[...] = xiT
        path_ref[...] = pathv[None, :].astype(jnp.int32)
        fail_ref[...] = failv[None, :].astype(jnp.int32)

    grid = (n_blocks,)

    def bs(shape_prefix):
        nprefix = len(shape_prefix)
        return pl.BlockSpec(
            shape_prefix + (block_e,),
            lambda i, n=nprefix: (0,) * n + (i,),
            memory_space=pltpu.VMEM,
        )

    dtype = disc.dtype

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bs((nde,)),
            bs((nde,)),
            bs((nxi,)),
            bs((npe, d)),
            bs((1,)),
            bs((1,)),
            bs((npar,)),
            bs((nxi + nde,)),
        ],
        out_specs=[
            bs((nde,)),
            bs((nde, nde)),
            bs((nxi,)),
            bs((1,)),
            bs((1,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nde, E_pad), dtype),
            jax.ShapeDtypeStruct((nde, nde, E_pad), dtype),
            jax.ShapeDtypeStruct((nxi, E_pad), dtype),
            jax.ShapeDtypeStruct((1, E_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, E_pad), jnp.int32),
        ],
        interpret=interpret,
    )

    es_ids_pad = jnp.asarray(es_pad)
    iota_in = jnp.tile(
        jnp.arange(nxi + nde, dtype=jnp.int32)[:, None], (1, E_pad)
    )

    def assemble(x, x_prev, xi_prev, params_all):
        x_e = disc.gather_elem(x)
        xp_e = disc.gather_elem(x_prev)
        pars = params_all[es_ids_pad]  # (E_pad, npar)

        def pad_rt(a, fill=0.0):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
            ).T if pad else a.T

        x_eT = pad_rt(x_e)
        xp_eT = pad_rt(xp_e)
        xipT = pad_rt(xi_prev)
        parsT = pars.T

        R_T, J_T, xi_T, path2, fail2 = call(
            x_eT, xp_eT, xipT, gN_T, detJ_T, h_T, parsT, iota_in
        )
        R_e = R_T.T[:n_elem]
        J_e = jnp.moveaxis(J_T, -1, 0)[:n_elem]
        xi = xi_T.T[:n_elem]
        path = path2[0, :n_elem]
        nfail = jnp.sum(fail2[0, :n_elem])
        R = disc.scatter_elem(R_e)
        diag = disc.scatter_elem(jnp.diagonal(J_e, axis1=1, axis2=2))
        return R, J_e, diag, xi, path, nfail

    return assemble

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
    bm = get_batched_model(assembler.model)
    if bm is None:
        return False
    spec = assembler.spec
    if (
        assembler.disc.dtype == jnp.float64
        and jax.default_backend() == "tpu"
    ):
        # f64 Pallas is structurally impossible on this TPU stack: the
        # XLA:TPU "rewrite computation to not contain X64 element
        # types" pass has no rule for tpu_custom_call, so ANY Pallas
        # call with f64 operands fails to compile — independent of the
        # kernel body (probed: while / fori / fully-unrolled all fail
        # identically; scripts/probe_mosaic_f64.py).  f64 problems use
        # the generic XLA path.  CPU interpret-mode tests unaffected.
        return False
    if getattr(bm, "plane_stress", False):
        # displacement-only plane-stress kernel path; finite-deformation
        # twins carry the z-stretch local variable for the PK1 pullback
        return spec.plane_stress and not spec.mixed
    if getattr(bm, "displacement_only", False):
        # displacement-formulation models (isotropic_elastic): the
        # non-mixed momentum-rows kernel path, any dimension
        return not spec.mixed
    return spec.mixed and not spec.plane_stress


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


def make_pallas_assemble(
    assembler,
    block_e: int | None = None,
    interpret: bool = False,
    n_elem: int | None = None,
):
    """Build assemble(x, x_prev, xi_prev, params_all) ->
    (R (n_dofs,), J_e (n_elem, nde, nde), diag, xi, path, nfail).

    With `n_elem` given, returns the ELEMENT-LEVEL kernel instead: a
    call over pre-gathered trailing-layout element arrays (padded to
    .E_pad), no gather/scatter — the per-shard compute of the dist
    shard_map assembly (parallel/dist.py), where the halo exchange
    supplies the element dofs and the Export-ADD does the scatter."""
    disc = assembler.disc
    model, spec = assembler.model, assembler.spec
    bmodel = get_batched_model(model)
    if bmodel is None:
        raise ValueError(f"no batched twin for model '{model.name}'")
    if block_e is None:
        # twins with heavy per-element state declare a smaller block to
        # fit the VMEM stack
        block_e = getattr(bmodel, "block_e", 1024)
    # the element axis is the minor-most (lane) dim of every block:
    # Mosaic rejects blocks whose lane dim is not a multiple of 128
    block_e = -(-block_e // 128) * 128
    elem_level = n_elem is not None
    nxi = assembler.nxi
    nde = spec.ndofs_elem
    npe = spec.npe
    d = spec.dim
    n_elem = disc.n_elem if n_elem is None else int(n_elem)
    npar = model.n_params
    if elem_level:
        # small per-shard element counts: shrink the block to the next
        # lane multiple so tiny parts don't pad 1024-wide
        block_e = min(block_e, -(-n_elem // 128) * 128)

    E_pad = ((n_elem + block_e - 1) // block_e) * block_e
    n_blocks = E_pad // block_e
    pad = E_pad - n_elem

    def pad_T(a, fill=0.0):
        a = np.asarray(a)
        out = np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )
        return jnp.asarray(np.moveaxis(out, 0, -1))

    if not elem_level:
        gN_T = pad_T(disc.grad_N)  # (npe, d, E)
        detJ_T = pad_T(np.asarray(disc.detJ))[None, :]  # (1, E)
        h_T = pad_T(np.asarray(disc.h), fill=1.0)[None, :]  # (1, E)
        es_pad = np.concatenate(
            [np.asarray(disc.es_ids), np.zeros(pad, np.int32)]
        )

    q1_pts, q1w_np = basis.quadrature(d, 2)
    N1_np = basis.shape_values(d, q1_pts)
    npts1 = N1_np.shape[0]

    meas0 = PARENT_MEASURE[d]
    ndpn = spec.ndofs_per_node
    mixed = spec.mixed
    thick = float(spec.thickness)
    N1v = [[float(N1_np[q, n]) for n in range(npe)] for q in range(N1_np.shape[0])]
    w1v = [float(w) for w in np.asarray(q1w_np).ravel()]
    npts1 = len(w1v)
    # static pressure "mass" coefficients: sum_q w_q N_q[n] N_q[m]
    mass_c = [
        [
            sum(w1v[q] * N1v[q][n] * N1v[q][m] for q in range(npts1))
            for m in range(npe)
        ]
        for n in range(npe)
    ]
    ngu = d * d
    analytic = getattr(bmodel, "analytic_solve", False)
    finite = getattr(bmodel, "finite_deformation", False)
    # host-iota rows: gu seeds (+ xi seeds for the implicit mode and the
    # in-kernel local Newton)
    n_iota = max(ngu + (0 if analytic else nxi), nxi)

    from calibr8_tpu.models.batched import t_cof, t_det, t_F, t_mm, t_transpose

    def kernel(x_ref, xp_ref, xip_ref, gN_ref, dJ_ref, h_ref, par_ref,
               iota_ref, R_ref, J_ref, xi_ref, path_ref, fail_ref):
        x_eT = x_ref[...]
        xp_eT = xp_ref[...]
        xipT = xip_ref[...]
        gNT = gN_ref[...]
        dJ = dJ_ref[...][0]
        hh = h_ref[...][0]
        parT = par_ref[...]
        # host-provided iota: an in-kernel broadcasted_iota one-hot gets
        # constant-folded by Mosaic into shapes that crash its layout
        # passes, so the row-index matrix arrives as a runtime input
        rows_io = iota_ref[...]

        kin = _batched_kinematics(spec, x_eT, xp_eT, gNT, block_e)
        if analytic:
            xiT, pathv, failv = bmodel.local_solve(xipT, kin, parT)
        else:
            xiT, pathv, failv = bmodel.local_solve(xipT, kin, parT, rows_io)

        mu = parT[0] / (2.0 * (1.0 + parT[1]))
        wdv0 = dJ * meas0
        gu_prev = kin.grad_u_prev

        if mixed:
            psf = bmodel.pressure_scale_factor(parT)
            tau = spec.stab_multiplier * 0.5 * hh * hh / mu
            xm = x_eT.reshape(npe, ndpn, block_e)
            p_eT = xm[:, d]

            # frozen (state-independent under the gu/xi seeds) pressure
            # data
            p_ip = usum(p_eT, 0) * (1.0 / npe)
            grad_p = []
            for j in range(d):
                acc = p_eT[0] * gNT[0, j]
                for n in range(1, npe):
                    acc = acc + p_eT[n] * gNT[n, j]
                grad_p.append(acc)
            p_q = [
                sum(N1v[q][n] * p_eT[n] for n in range(npe))
                for q in range(npts1)
            ]
            coef = [(p_q[q] / psf) * (w1v[q] * dJ) for q in range(npts1)]
        else:
            p_ip = dJ * 0.0

        def S_rows(xi_, gu_):
            """FULL element residual rows (nde, E) at frozen nodal
            pressures — its (xi, gu) tangents are the state-dependent
            Jacobian block; the p columns are appended analytically.
            Non-mixed (plane-stress) specs emit only the thickness-
            weighted momentum rows (mechanics_plane_stress.cpp)."""
            from calibr8_tpu.models.base import Kinematics as Kin

            kin_ = Kin(grad_u=gu_, grad_u_prev=gu_prev)
            sigma = bmodel.cauchy(xi_, kin_, parT, p_ip)
            if not mixed:
                if finite:
                    # PK1 = z_stretch * sigma * cof(F) (the finite-
                    # deformation plane-stress pullback,
                    # mechanics_plane_stress.cpp:66-84 /
                    # mechanics/global_residual.py:145-154)
                    zs = xi_[bmodel.z_stretch_idx]
                    sigma = zs * t_mm(sigma, t_cof(t_F(gu_)))
                rows = []
                for n in range(npe):
                    for i in range(d):
                        acc = sigma[i, 0] * gNT[n, 0]
                        for j in range(1, d):
                            acc = acc + sigma[i, j] * gNT[n, j]
                        rows.append(acc * wdv0 * thick)
                return jnp.stack(rows, 0)
            if finite:
                F_ = t_F(gu_)
                sigma = t_mm(sigma, t_cof(F_))
                M = t_mm(t_transpose(t_cof(F_)), t_cof(F_))
                sc = tau / t_det(F_)
                stab_gp = [
                    sc * sum(M[j, k] * grad_p[k] for k in range(d))
                    for j in range(d)
                ]
            else:
                stab_gp = [tau * grad_p[j] for j in range(d)]
            hydro = bmodel.hydro_cauchy(xi_, kin_, parT)
            rp_const = -(hydro / psf) * (1.0 / npe) * wdv0
            rows = []
            for n in range(npe):
                for i in range(d):
                    acc = sigma[i, 0] * gNT[n, 0]
                    for j in range(1, d):
                        acc = acc + sigma[i, j] * gNT[n, j]
                    rows.append(acc * wdv0)
                stab_n = stab_gp[0] * gNT[n, 0]
                for j in range(1, d):
                    stab_n = stab_n + stab_gp[j] * gNT[n, j]
                r_p1_n = sum(coef[q] * N1v[q][n] for q in range(npts1))
                rows.append(rp_const - stab_n * wdv0 - r_p1_n)
            return jnp.stack(rows, 0)

        gu0f = kin.grad_u.reshape(ngu, block_e)
        if analytic:
            # ---- consistent tangent through the closed-form solve ----
            # xi*(gu) is differentiable, so the d*d grad_u tangents of
            # S(xi*(gu), gu) ARE the statically condensed Jacobian
            # dR/dx - dR/dxi (dC/dxi)^{-1} dC/dx (evaluations.cpp:112)
            def H(guf):
                gu_ = guf.reshape(d, d, block_e)
                from calibr8_tpu.models.base import Kinematics as Kin

                xi_, _, _ = bmodel.local_solve(
                    xipT, Kin(grad_u=gu_, grad_u_prev=gu_prev), parT
                )
                return S_rows(xi_, gu_)

            H0, lin = jax.linearize(H, gu0f)
            cols = [lin((rows_io[:ngu] == g).astype(H0.dtype)) for g in range(ngu)]
            K = [
                jnp.stack([cols[g][i] for g in range(ngu)], 0)
                for i in range(nde)
            ]
        else:
            # ---- implicit condensation about the Newton solution -----
            # seeds over v = [xi; gu]; dxi/dgu = -(dC/dxi)^{-1} dC/dgu
            def H(v):
                xi_ = v[:nxi]
                gu_ = v[nxi:].reshape(d, d, block_e)
                C = bmodel.residual(xi_, xipT,
                                    Kinematics(grad_u=gu_, grad_u_prev=gu_prev),
                                    parT, pathv)
                return jnp.concatenate([C, S_rows(xi_, gu_)], axis=0)

            v0 = jnp.concatenate([xiT, gu0f], axis=0)
            Hf0, lin = jax.linearize(H, v0)
            cols = [
                lin((rows_io[: nxi + ngu] == k).astype(v0.dtype))
                for k in range(nxi + ngu)
            ]
            dC_dxi = jnp.stack(
                [jnp.stack([cols[k][i] for k in range(nxi)], 0) for i in range(nxi)],
                0,
            )
            dC_dgu = jnp.stack(
                [
                    jnp.stack([cols[nxi + g][i] for g in range(ngu)], 0)
                    for i in range(nxi)
                ],
                0,
            )
            dxi_dgu = -gauss_solve_T(dC_dxi, dC_dgu)  # (nxi, ngu, E)
            K = []
            for i in range(nde):
                row = jnp.stack(
                    [cols[nxi + g][nxi + i] for g in range(ngu)], 0
                )
                for k in range(nxi):
                    row = row + cols[k][nxi + i] * dxi_dgu[k]
                K.append(row)
            H0 = Hf0[nxi:]

        if not mixed:
            # displacement-only: J rows/cols are exactly the gu tangents
            jrows = []
            for n in range(npe):
                for ci in range(d):
                    i = n * d + ci
                    ent = []
                    for m in range(npe):
                        for c in range(d):
                            acc = K[i][c * d + 0] * gNT[m, 0]
                            for j in range(1, d):
                                acc = acc + K[i][c * d + j] * gNT[m, j]
                            ent.append(acc)
                    jrows.append(jnp.stack(ent, 0))
            R_ref[...] = H0
            J_ref[...] = jnp.stack(jrows, axis=0)
            xi_ref[...] = xiT
            path_ref[...] = pathv[None, :].astype(jnp.int32)
            fail_ref[...] = failv[None, :].astype(jnp.int32)
            return

        # ---- analytic pressure columns -------------------------------
        if finite:
            F0 = t_F(kin.grad_u)
            cof0 = t_cof(F0)
            M0 = t_mm(t_transpose(cof0), cof0) / t_det(F0)
        gg = [
            [
                sum(gNT[m, j] * gNT[n, j] for j in range(d))
                if not finite
                else sum(
                    gNT[n, j] * M0[j, k] * gNT[m, k]
                    for j in range(d)
                    for k in range(d)
                )
                for n in range(npe)
            ]
            for m in range(npe)
        ]
        jrows = []
        for n in range(npe):
            for ci in range(d):
                i = n * ndpn + ci
                # p-column value is independent of which p node m
                if finite:
                    pcol = (
                        -(1.0 / npe)
                        * wdv0
                        * sum(cof0[ci, j] * gNT[n, j] for j in range(d))
                    )
                else:
                    pcol = -(1.0 / npe) * gNT[n, ci] * wdv0
                ent = []
                for m in range(npe):
                    for c in range(d):
                        acc = K[i][c * d + 0] * gNT[m, 0]
                        for j in range(1, d):
                            acc = acc + K[i][c * d + j] * gNT[m, j]
                        ent.append(acc)
                    ent.append(pcol)
                jrows.append(jnp.stack(ent, 0))
            # pressure row of node n
            i = n * ndpn + d
            ent = []
            for m in range(npe):
                for c in range(d):
                    acc = K[i][c * d + 0] * gNT[m, 0]
                    for j in range(1, d):
                        acc = acc + K[i][c * d + j] * gNT[m, j]
                    ent.append(acc)
                ent.append(
                    -tau * wdv0 * gg[m][n] - (dJ / psf) * mass_c[n][m]
                )
            jrows.append(jnp.stack(ent, 0))
        J_T = jnp.stack(jrows, axis=0)

        R_ref[...] = H0
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
            bs((n_iota,)),
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

    iota_in = jnp.tile(
        jnp.arange(n_iota, dtype=jnp.int32)[:, None], (1, E_pad)
    )

    if elem_level:

        def call_elems(x_eT, xp_eT, xipT, gN_T, detJ_T, h_T, parsT):
            """(R_T (nde, E_pad), J_T (nde, nde, E_pad), xi_T, path,
            fail) from pre-gathered element arrays, all trailing-layout
            and padded to E_pad (pad elements: detJ 0, h 1)."""
            return call(
                x_eT, xp_eT, xipT, gN_T, detJ_T, h_T, parsT, iota_in
            )

        call_elems.E_pad = E_pad
        call_elems.block_e = block_e
        call_elems.n_elem = n_elem
        return call_elems

    es_ids_pad = jnp.asarray(es_pad)

    def pad_rt(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        ).T if pad else a.T

    def prepare(x_prev, xi_prev):
        """Pre-transpose step-constant arrays.  x_prev and xi_prev are
        fixed across all Newton iterations and line-search trials of a
        load step, so their gather+relayout (~1/3 of the assembly wall
        time) is hoisted out of the per-iteration path."""
        return pad_rt(disc.gather_elem(x_prev)), pad_rt(xi_prev)

    def assemble_prepared(x, xp_eT, xipT, params_all, trailing_J=False):
        parsT = params_all[es_ids_pad].T  # (npar, E_pad)
        x_eT = pad_rt(disc.gather_elem(x))

        R_T, J_T, xi_T, path2, fail2 = call(
            x_eT, xp_eT, xipT, gN_T, detJ_T, h_T, parsT, iota_in
        )
        xi = xi_T.T[:n_elem]
        path = path2[0, :n_elem]
        nfail = jnp.sum(fail2[0, :n_elem])
        # ONE transpose + ONE fused scatter for residual and Jacobian
        # diagonal (two segment_sums dominated the assembly wall time)
        D_T = jnp.stack([J_T[i, i] for i in range(nde)], axis=0)
        RD = jnp.concatenate([R_T, D_T], axis=0).T[:n_elem]  # (E, 2*nde)
        rows = jnp.concatenate(
            [
                RD[:, :nde].reshape(n_elem * npe, ndpn),
                RD[:, nde:].reshape(n_elem * npe, ndpn),
            ],
            axis=1,
        )
        X = disc.scatter_rows(rows)
        R = disc.nodemat_to_flat(X[:, :ndpn])
        diag = disc.nodemat_to_flat(X[:, ndpn:])
        if trailing_J:
            return R, J_T, diag, xi, path, nfail
        J_e = jnp.moveaxis(J_T, -1, 0)[:n_elem]
        return R, J_e, diag, xi, path, nfail

    def assemble(x, x_prev, xi_prev, params_all):
        xp_eT, xipT = prepare(x_prev, xi_prev)
        return assemble_prepared(x, xp_eT, xipT, params_all)

    assemble.prepare = prepare
    assemble.assemble_prepared = assemble_prepared
    assemble.n_elem_pad = E_pad
    return assemble


# trailing-layout EBE matvec lives in fem/assembly.py (ebe_matvec_T)

"""Command-line drivers — the analog of the reference's 18 executables
(reference: source/calibr8/src/main_*.cpp, CMakeLists.txt:84-173).

Usage: python -m calibr8_tpu <command> <deck.yaml> [options]

  primal     forward solve + QoI + regression check + synthetic output
             (main_primal.cpp)
  inverse    gradient-based calibration (ROL analog: scipy L-BFGS-B /
             trust-constr over the canonical box; optional FD-vs-adjoint
             gradient check with the log10-drop regression)
             (main_inverse.cpp)
  objective  single objective + gradient evaluation, writes
             objective.dat / gradient.dat for external optimizers
             (main_objective.cpp)
  verify     nested-space exact verification, effectivity == 1
             (main_verify.cpp)
  error      adjoint error estimate + localization on the current mesh
             (main_error.cpp, single cycle)
  exact_error        TRUTH nested-space error + exact-weight localization
                     (main_exact_error.cpp)
  model_form_error   two-model form error: estimate / --verify / --exact
                     (main_model_form_error{,_verify,_exact_error}.cpp)
  multi_qoi          many QoIs + gradients from one primal solve
                     (main_evaluate_multiple_qois_and_gradients.cpp)
  primal_multi       independent multi-problem primal solves
                     (main_primal_multiple_problems.cpp)
  vfm        virtual-fields-method objective evaluation / calibration
             (main_virtual_fields_method.cpp)
  perturb    add Gaussian noise to measured fields in an .npz
             (perturber.cpp)
  mls        moving-least-squares smoothing of measured fields
             (moving_least_squares.cpp)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load_problem(deck_path):
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.problem import Problem

    spec = load_deck(deck_path)
    prob = Problem(spec)
    d = spec.disc
    fields = d.get("fields file")
    if fields:
        from calibr8_tpu.io.synthetic import load_fields

        load_fields(prob.mesh, fields)
    return spec, prob


def cmd_primal(args):
    spec, prob = _load_problem(args.deck)
    from calibr8_tpu.utils import timers

    timers.reset()
    with timers.phase("primal/total"):
        traj = prob.solve_primal()
    J = traj.J
    print(f"J: {J:.16e}")
    if getattr(args, "timers", False) or spec.sub("problem").get(
        "print timers", False
    ):
        timers.report()
    if spec.regression:
        expected = float(spec.regression["QoI"])
        tol = float(spec.regression.get("relative error tol", 1e-6))
        err = abs(J - expected) / abs(expected)
        print("------ regression summary -----")
        print(f"J computed: {J:.17e}")
        print(f"J expected: {expected:.17e}")
        print(f"relative error: {err:.17e}")
        print(" PASS" if err < tol else " FAIL")
        print("-------------------------------")
        if err >= tol:
            sys.exit(1)
    if spec.sub("problem").get("write synthetic", False):
        from calibr8_tpu.io.synthetic import attach_synthetic, save_fields

        attach_synthetic(prob.mesh, prob.disc, traj)
        out = spec.problem_name + "_synthetic.npz"
        save_fields(prob.mesh, out)
        print(f"synthetic fields written: {out}")
        # the reference stores synthetic data as fields INSIDE the
        # native mesh (synthetic.hpp:15-18, main_primal.cpp:193-196);
        # meshes loaded from .smb additionally write back the same way
        # (a calibration deck can point its `mesh file` straight at it)
        if getattr(prob.mesh, "smb_template", None) is not None:
            from calibr8_tpu.mesh.smb import write_smb

            out_smb = spec.problem_name + "_synthetic.smb"
            write_smb(prob.mesh, out_smb)
            print(f"synthetic mesh written: {out_smb}")
    if args.vtk:
        from calibr8_tpu.io.vtk import write_pvd

        write_pvd(args.vtk, prob, traj)
        print(f"VTK output written: {args.vtk}")
    return 0


def _build_objective(spec, prob):
    from calibr8_tpu.opt.objective import ActiveParams, AdjointObjective, FEMUObjective
    from calibr8_tpu.solve.adjoint import Adjoint
    from calibr8_tpu.solve.linear import LinearCfg

    inverse = spec.inverse
    active = ActiveParams.from_inverse_spec(
        inverse, prob.disc.elem_set_names, prob.model.param_names
    )
    obj_type = inverse.get("objective type", "pdeco")
    if obj_type in ("pdeco", "adjoint"):
        adj = Adjoint(
            prob.assembler, prob.qoi, prob.dbcs, LinearCfg(),
            mg_factory=prob.mg_factory,
        )
        obj = AdjointObjective(prob, adj, active)
    elif obj_type == "FEMU":
        obj = FEMUObjective(prob, active)
    elif obj_type in ("VFM", "FD_VFM", "FS_VFM", "Adjoint_VFM"):
        from calibr8_tpu.opt.vfm_objective import build_vfm_objective

        obj, active = build_vfm_objective(
            prob, inverse, spec.sub("virtual fields")
        )
    elif obj_type == "EUCLID":
        # multi-virtual-field EUCLID objective
        # (reference: main_objective.cpp:409-509); deck sublist:
        #   virtual fields: {vf 1: [node_set, component, obj_scale,
        #                           load_scale], ...}
        import jax.numpy as jnp

        from calibr8_tpu.opt.vfm_objective import (
            EUCLIDObjective,
            read_load_file,
        )
        from calibr8_tpu.solve.vfm import VirtualPower

        vfs = spec.sub("virtual fields")
        entries = [v for _, v in sorted(vfs.items())]
        assert entries, "EUCLID needs a 'virtual fields' sublist"
        names = [e[0] for e in entries]
        comps = [int(e[1]) for e in entries]
        oscales = [float(e[2]) if len(e) > 2 else 1.0 for e in entries]
        lscales = [float(e[3]) if len(e) > 3 else 1.0 for e in entries]
        load_data = read_load_file(inverse["load input file"])
        vp = VirtualPower(
            prob, jnp.zeros(prob.disc.n_dofs, prob.disc.dtype)
        )
        obj = EUCLIDObjective(
            prob, vp, active, load_data,
            node_set_names=names,
            vf_components=comps,
            obj_scale_factors=oscales,
            load_scale_factors=lscales,
        )
    elif obj_type in ("EqGap", "equilibrium gap"):
        import jax.numpy as jnp

        from calibr8_tpu.opt.vfm_objective import EquilibriumGapObjective
        from calibr8_tpu.solve.vfm import VirtualPower

        vp = VirtualPower(
            prob, jnp.zeros(prob.disc.n_dofs, prob.disc.dtype)
        )
        obj = EquilibriumGapObjective(
            prob, vp, active,
            gap_scale=float(inverse.get("objective scale factor", 1.0)),
        )
    else:
        raise ValueError(f"unknown objective type {obj_type!r}")
    return obj, active


def _build_multi_problem(spec):
    """A `problems:` deck (multi-experiment calibration, reference:
    test/adjoint/2prob.yaml.in, adjoint_objective.cpp loops problems):
    one Problem + objective per sub-deck, summed by
    MultiProblemObjective; the shared top-level `inverse:` sublist
    defines the common ActiveParams box."""
    from calibr8_tpu.deck import ProblemSpec
    from calibr8_tpu.opt.objective import MultiProblemObjective
    from calibr8_tpu.problem import Problem

    objs, active, prob0 = [], None, None
    for key in sorted(spec.sub("problems")):
        sub = dict(spec.sub("problems")[key])
        sub.setdefault("inverse", spec.sub("inverse"))
        subspec = ProblemSpec(sub)
        prob = Problem(subspec)
        prob0 = prob0 or prob
        obj, a = _build_objective(subspec, prob)
        active = active or a
        objs.append(obj)
    assert objs, "empty 'problems' sublist"
    return MultiProblemObjective(objs, active), active, prob0


def cmd_inverse(args):
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.opt.drivers import run_inverse
    from calibr8_tpu.opt.objective import fd_gradient_check

    spec = load_deck(args.deck)
    if spec.sub("problems"):
        obj, active, prob = _build_multi_problem(spec)
    else:
        spec, prob = _load_problem(args.deck)
        obj, active = _build_objective(spec, prob)
    inverse = spec.inverse
    x0 = active.to_canonical(active.extract(prob.params0))

    if inverse.get("check gradient", False):
        g = obj.gradient(x0)
        drop, errs = fd_gradient_check(obj.value, g, x0)
        print(f"gradient check: log10 error drop = {drop:.10f}")
        # 2prob-style decks nest the regression under `inverse:`
        reg = spec.regression or inverse.get("regression", {})
        if "log10 drop expected" in reg:
            expected = float(reg["log10 drop expected"])
            tol = float(reg.get("log10 drop tolerance", 1e-1))
            ok = abs(drop - expected) < tol
            print("------ regression summary -----")
            print(f"drop computed: {drop:.10f}  expected: {expected:.10f}")
            print(" PASS" if ok else " FAIL")
            if not ok:
                sys.exit(1)
        if int(inverse.get("iteration limit", 0)) == 0:
            return 0

    res = run_inverse(
        obj,
        active,
        x0=x0,
        method="trust-constr" if args.trust_region else "L-BFGS-B",
        gtol=float(inverse.get("gradient tolerance", 1e-8)),
        max_iters=int(inverse.get("iteration limit", 150)),
        out_file=args.out or "calibrated_params.txt",
        use_gradient=hasattr(obj, "gradient"),
    )
    print(f"optimization done: J = {res.J:.6e}, evals = {res.n_evals}")
    for name, val in zip(res.names, res.params):
        print(f"  {name}: {val:.12e}")
    return 0


def cmd_objective(args):
    spec, prob = _load_problem(args.deck)
    obj, active = _build_objective(spec, prob)
    x0 = active.to_canonical(active.extract(prob.params0))
    if hasattr(obj, "value_and_gradient"):
        J, g = obj.value_and_gradient(x0)
    else:
        J, g = obj.value(x0), obj.gradient(x0)
    with open("objective.dat", "w") as f:
        f.write(f"{J:.17e}\n")
    with open("gradient.dat", "w") as f:
        f.write(" ".join(f"{v:.17e}" for v in np.asarray(g)) + "\n")
    print(f"objective: {J:.16e}")
    return 0


def cmd_verify(args):
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.error.verify import verify

    spec = load_deck(args.deck)
    res = verify(spec)
    print(f"J^H: {res.J_H:.16e}")
    print(f"J^h: {res.J_h:.16e}")
    print(f"eta_R ~ {res.eta_R:.16e}")
    print(f"eta_C ~ {res.eta_C:.16e}")
    print(f"eta ~ {res.eta:.16e}")
    print(f"|eta| < {res.eta_bound:.16e}")
    print(f"E_exact: {res.E_exact:.16e}")
    print(f"I: {res.eta / res.E_exact:.16e}")
    print(f"E_lin_R: {res.E_lin_R:.16e}")
    print(f"E_lin_C: {res.E_lin_C:.16e}")
    print(f"E_computed / E_exact: {res.effectivity:.16e}")
    if spec.sub("problem").get("do regression", False):
        ok = abs(res.effectivity - 1.0) < 1e-8
        print("------ regression summary -----")
        print(" PASS" if ok else " FAIL")
        print("-------------------------------")
        if not ok:
            sys.exit(1)
    return 0


def cmd_spr_error(args):
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.error.spr import spr_error_estimate

    spec = load_deck(args.deck)
    res = spr_error_estimate(spec)
    print(f"J^H: {res.J_H:.16e}")
    print(f"total estimate ~ {res.eta:.15e}")
    if args.error_out:
        np.save(args.error_out, res.elem_error)
    return 0


def cmd_error(args):
    """The reference `error` driver is ADAPTIVE: primal -> nested fine
    adjoint -> localize -> adapt, for `adaptivity: solve cycles` cycles
    (main_error.cpp:296-330).  With no adaptivity sublist (and no
    --cycles), a single estimate pass is run."""
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.error.verify import verify

    spec = load_deck(args.deck)
    n_cycles = args.cycles or int(spec.sub("adaptivity").get("solve cycles", 0))
    if n_cycles > 1:
        from calibr8_tpu.error.adapt import adaptive_error_cycles

        res = adaptive_error_cycles(spec, n_cycles=n_cycles)
        for c in res.cycles:
            print(
                f"cycle {c['cycle']}: elems {c['n_elems']}, "
                f"J^H {c['J_H']:.12e}, eta {c['eta']:.6e}, "
                f"bound {c['eta_bound']:.6e}"
            )
        print(json.dumps({"cycles": res.cycles}))
        if args.error_out:
            np.save(args.error_out, np.asarray(res.etas))
        return 0
    res = verify(spec)
    out = {
        "eta": res.eta,
        "eta_bound": res.eta_bound,
        "J_H": res.J_H,
        "elem_error_abs_max": float(np.max(np.abs(res.elem_error))),
    }
    print(json.dumps(out))
    if args.error_out:
        np.save(args.error_out, res.elem_error)
    return 0


def cmd_research(args):
    """Research mini-app: adaptive adjoint-error study (nlpoisson /
    nlelasticity) — the analog of the reference's standalone `research`
    executable (research.cpp:12-40)."""
    import yaml

    from calibr8_tpu.research import run_research

    with open(args.deck) as f:
        params = yaml.safe_load(f)
    if len(params) == 1 and "physics" not in params:
        params = next(iter(params.values()))
    history = run_research(params)
    for row in history:
        print(
            f"cycle {row['cycle']}: elems {row['n_elems']}, "
            f"J^H {row['J_H']:.12e}, eta1 {row['eta1']:.6e} "
            f"(eff {row['eff1']:.4f}), eta2 {row['eta2']:.6e} "
            f"(eff {row['eff2']:.4f})"
        )
    print(json.dumps({"history": history}))
    return 0


def cmd_exact_error(args):
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.error.exact import exact_error

    spec = load_deck(args.deck)
    res = exact_error(spec)
    print(f"J^H: {res.J_H:.16e}")
    print(f"J^h (truth): {res.J_h:.16e}")
    print(f"E_exact = J^h - J^H: {res.E_exact:.16e}")
    print(f"eta (exact weights): {res.eta_exact:.16e}")
    print(f"|eta| bound: {res.eta_bound:.16e}")
    print(f"effectivity: {res.effectivity:.16e}")
    if args.error_out:
        np.save(args.error_out, res.elem_error)
    return 0


def cmd_model_form(args):
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.error.exact import model_form_exact_error
    from calibr8_tpu.error.model_form import (
        model_form_error_estimate,
        model_form_verify,
    )

    spec = load_deck(args.deck)
    if args.exact:
        res = model_form_exact_error(spec)
        print(f"J (base model): {res.J_H:.16e}")
        print(f"J (fine model): {res.J_h:.16e}")
        print(f"E_exact: {res.E_exact:.16e}")
        print(f"eta (exact weights): {res.eta_exact:.16e}")
        print(f"effectivity: {res.effectivity:.16e}")
        if args.error_out:
            np.save(args.error_out, res.elem_error)
        return 0
    if args.verify:
        res = model_form_verify(spec)
        print(f"J (base model): {res.J_H:.16e}")
        print(f"J (fine model): {res.J_h:.16e}")
        print(f"eta ~ {res.eta:.16e}")
        print(f"E_exact: {res.E_exact:.16e}")
        print(f"E_computed / E_exact: {res.effectivity:.16e}")
        if spec.sub("problem").get("do regression", False):
            ok = abs(res.effectivity - 1.0) < 1e-8
            print("------ regression summary -----")
            print(" PASS" if ok else " FAIL")
            print("-------------------------------")
            if not ok:
                sys.exit(1)
        return 0
    res = model_form_error_estimate(spec)
    print(f"J (base model): {res['J_base']:.16e}")
    print(f"eta ~ {res['eta']:.16e}")
    print(f"|eta| < {float(np.sum(np.abs(res['elem_error']))):.16e}")
    if args.error_out:
        np.save(args.error_out, res["elem_error"])
    return 0


def cmd_multi_qoi(args):
    from calibr8_tpu.opt.multi_qoi import evaluate_multiple_qois_and_gradients

    spec, prob = _load_problem(args.deck)
    qois = spec.data.get("quantities of interest")
    if qois is None:
        qois = [spec.data["quantity of interest"]]
    elif isinstance(qois, dict):
        qois = list(qois.values())
    out = evaluate_multiple_qois_and_gradients(prob, qois)
    for k, entry in enumerate(out):
        with open(f"objective_{k}.dat", "w") as f:
            f.write(f"{entry['J']:.17e}\n")
        with open(f"gradient_{k}.dat", "w") as f:
            f.write(
                " ".join(f"{v:.17e}" for v in entry["grad_all"].ravel()) + "\n"
            )
        print(f"qoi {k} ({entry['name']}): J = {entry['J']:.16e}")
    return 0


def cmd_primal_multi(args):
    """Solve several independent problems from one deck (the
    primal_multiple_problems driver: each sublist of `problems` is a
    full problem deck; shared `residuals` merge in)."""
    from calibr8_tpu.deck import load_deck
    from calibr8_tpu.problem import Problem
    from calibr8_tpu.spec import ProblemSpec

    spec = load_deck(args.deck)
    probs = spec.data.get("problems")
    assert probs, "deck needs a 'problems' sublist"
    for name, sub in probs.items():
        data = dict(spec.data)
        data.pop("problems")
        data.update(sub)
        sub_spec = ProblemSpec(data)
        prob = Problem(sub_spec)
        traj = prob.solve_primal()
        print(f"problem {name}: J = {traj.J:.16e}")
    return 0


def cmd_perturb(args):
    from calibr8_tpu.io import synthetic as syn
    from calibr8_tpu.mesh.mesh import Mesh

    data = dict(np.load(args.fields))
    rng = np.random.default_rng(args.seed)
    for k in data:
        if k.startswith("measured_") and not k.endswith("_0"):
            data[k] = data[k] + args.sigma * rng.standard_normal(data[k].shape)
    np.savez_compressed(args.out, **data)
    print(f"perturbed fields written: {args.out}")
    return 0


def cmd_vectorize(args):
    from calibr8_tpu.io.fields_utils import vectorize_fields

    data = dict(np.load(args.fields))
    out = vectorize_fields(data, args.num_steps)
    np.savez_compressed(args.out, **out)
    print(f"vectorized fields written: {args.out}")
    return 0


def cmd_add_node_set_fields(args):
    spec, prob = _load_problem(args.deck)
    from calibr8_tpu.io.fields_utils import add_node_set_fields
    from calibr8_tpu.io.synthetic import save_fields

    add_node_set_fields(prob.mesh)
    save_fields(prob.mesh, args.out)
    print(f"node-set indicator fields written: {args.out}")
    return 0


def cmd_transfer(args):
    from calibr8_tpu.io.fields_utils import transfer_surface_data

    data = dict(np.load(args.fields))
    src = np.load(args.src_coords)
    tgt = np.load(args.tgt_coords)
    out = transfer_surface_data(src, data, tgt, args.radius, args.order)
    np.savez_compressed(args.out, **out)
    print(f"transferred fields written: {args.out}")
    return 0


def cmd_mls(args):
    from calibr8_tpu.io.mls import mls_filter_npz

    mls_filter_npz(args.fields, args.coords, args.out, radius=args.radius, order=args.order)
    print(f"MLS-filtered fields written: {args.out}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="calibr8_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("primal")
    sp.add_argument("deck")
    sp.add_argument("--vtk", help="write VTK/PVD output to this basename")
    sp.add_argument(
        "--timers", action="store_true", help="print per-phase timers"
    )
    sp.set_defaults(fn=cmd_primal)

    sp = sub.add_parser("inverse")
    sp.add_argument("deck")
    sp.add_argument("--trust_region", action="store_true")
    sp.add_argument("--out")
    sp.set_defaults(fn=cmd_inverse)

    sp = sub.add_parser("objective")
    sp.add_argument("deck")
    sp.set_defaults(fn=cmd_objective)

    sp = sub.add_parser("verify")
    sp.add_argument("deck")
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser("research")
    sp.add_argument("deck")
    sp.set_defaults(fn=cmd_research)

    sp = sub.add_parser("error")
    sp.add_argument("deck")
    sp.add_argument("--error-out")
    sp.add_argument(
        "--cycles",
        type=int,
        default=0,
        help="adaptive solve-estimate-adapt cycles (overrides the "
        "deck's 'adaptivity: solve cycles')",
    )
    sp.set_defaults(fn=cmd_error)

    sp = sub.add_parser("exact_error")
    sp.add_argument("deck")
    sp.add_argument("--error-out")
    sp.set_defaults(fn=cmd_exact_error)

    sp = sub.add_parser("model_form_error")
    sp.add_argument("deck")
    sp.add_argument("--verify", action="store_true")
    sp.add_argument("--exact", action="store_true")
    sp.add_argument("--error-out")
    sp.set_defaults(fn=cmd_model_form)

    sp = sub.add_parser("multi_qoi")
    sp.add_argument("deck")
    sp.set_defaults(fn=cmd_multi_qoi)

    sp = sub.add_parser("primal_multi")
    sp.add_argument("deck")
    sp.set_defaults(fn=cmd_primal_multi)

    sp = sub.add_parser("vfm")
    sp.add_argument("deck")
    sp.add_argument("--trust_region", action="store_true")
    sp.add_argument("--out")
    sp.set_defaults(fn=cmd_inverse)

    sp = sub.add_parser("spr_error")
    sp.add_argument("deck")
    sp.add_argument("--error-out")
    sp.set_defaults(fn=cmd_spr_error)

    sp = sub.add_parser("perturb")
    sp.add_argument("fields")
    sp.add_argument("--sigma", type=float, default=1e-5)
    sp.add_argument("--seed", type=int, default=22)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_perturb)

    sp = sub.add_parser("vectorize")
    sp.add_argument("fields")
    sp.add_argument("out")
    sp.add_argument("--num-steps", type=int, default=10)
    sp.set_defaults(fn=cmd_vectorize)

    sp = sub.add_parser("add_node_set_fields")
    sp.add_argument("deck")
    sp.add_argument("out")
    sp.set_defaults(fn=cmd_add_node_set_fields)

    sp = sub.add_parser("transfer")
    sp.add_argument("fields")
    sp.add_argument("src_coords")
    sp.add_argument("tgt_coords")
    sp.add_argument("out")
    sp.add_argument("--radius", type=float, default=0.1)
    sp.add_argument("--order", type=int, default=2)
    sp.set_defaults(fn=cmd_transfer)

    sp = sub.add_parser("mls")
    sp.add_argument("fields")
    sp.add_argument("--coords", required=True)
    sp.add_argument("--radius", type=float, default=0.1)
    sp.add_argument("--order", type=int, default=2)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_mls)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""Merge phase-isolated scale-probe JSON lines into the bench cache row.

Reads /tmp/scale_chain.log (one JSON line per completed phase, see
scripts/scale_chain.sh) and writes .bench_results/scale_f32_n<N>.json
in the exact schema bench.py's scale mode emits, so the driver's
deadline-fallback picks it up.

Usage: python scripts/merge_scale_row.py [n=64] [log=/tmp/scale_chain.log]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_chain.log"
    phases = {}
    for line in open(log):
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if "seconds" in d and "error" not in d:
            # completed phase (setup-only lines lack "seconds"); the
            # chain's diagnostic fallbacks may log a SMALLER mesh
            # (newton size-bisect) — never mix sizes into one row.
            # Among candidates for the same phase prefer CONVERGED
            # (relres <= 2e-4, the f32 floor margin) over stalled, then
            # fastest — a later unconverged degree sweep must not
            # displace the converged row.
            cur = phases.setdefault(d["n_elem"], {}).get(d["phase"])

            def rank(p):
                rr = p.get("solve_relres", p.get("warmup_relres"))
                conv = rr is not None and rr <= 2e-4
                return (0 if conv else 1, p["seconds"])

            if cur is None or rank(d) < rank(cur):
                phases[d["n_elem"]][d["phase"]] = d

    # merge the largest mesh that completed all three phases
    need = {"assembly", "newton", "adjoint"}
    full = [ne for ne, p in phases.items() if need <= set(p)]
    if not full:
        missing = {
            ne: sorted(need - set(p)) for ne, p in phases.items()
        }
        raise SystemExit(f"incomplete: missing phases per size {missing}")
    phases = phases[max(full)]
    a, nw, ad = phases["assembly"], phases["newton"], phases["adjoint"]
    out = {
        "n_elem": a["n_elem"],
        "n_dofs": a["n_dofs"],
        "preconditioner": "multigrid",
        "seconds": a["seconds"],
        "gdof_per_s": a["gdof_per_s"],
        "newton_seconds": nw["seconds"],
        "newton_solve_relres": nw["solve_relres"],
        "adjoint_seconds": ad["seconds"],
        "adjoint_solve_relres": ad.get("solve_relres"),
        "adjoint_dof_per_s_per_chip": a["n_dofs"] / ad["seconds"],
        "adjoint_s_per_step_at_10M_dof_extrapolated": (
            ad["seconds"] * 1e7 / a["n_dofs"]
        ),
        "phase_isolated": True,
        "device": ad["device"],
    }
    # preconditioner-state split (mg.make_state): per-solve hierarchy
    # rebuild reported separately from the lagged steady-state step
    for src, pre in ((nw, "newton_"), (ad, "adjoint_")):
        for k in ("mg_make_s", "seconds_incl_mg_make", "solve_iters"):
            if k in src:
                out[pre + k] = src[k]
        if "precond_reuse" in src:
            out[pre + "precond_reuse"] = src["precond_reuse"]
    peak = max(p.get("hbm_peak_bytes", 0) for p in phases.values())
    if peak:
        out["hbm_peak_bytes"] = peak
        out["hbm_bytes_per_dof"] = round(peak / a["n_dofs"], 1)
        out["max_dofs_at_16gb_extrapolated"] = int(16e9 / (peak / a["n_dofs"]))

    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    path = os.path.join(REPO, ".bench_results", f"scale_f32_n{n}.json")
    with open(path, "w") as f:
        json.dump({"result": out, "ts": time.time(), "git": sha}, f, indent=1)
    print(path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

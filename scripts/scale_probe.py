"""Phase-isolated scale probe: run ONE scale-bench phase per process.

The full scale mode (bench.py --mode scale) died twice at n=64 with
UNAVAILABLE on the newton warmup; an axon fault wedges the client for
the rest of the process, so this probe isolates phases into separate
processes to find (and work around) the faulting one.

Usage (TPU):
  PYTHONPATH=/root/repo:$PYTHONPATH CALIBR8_X64=0 \
  python scripts/scale_probe.py {assembly|newton|adjoint} [n=64] [refs=3]

Prints one JSON line per phase.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
# lean Krylov basis at scale (see bench.py scale mode): restart=150
# OOM'd the 1.1M-DOF adjoint compile by 77 MB of HBM
os.environ.setdefault("CALIBR8_BENCH_RESTART", "50")
# match bench.py scale mode: degree-2 smoothers (code-size ceiling AND
# measured per-step optimum — deg-6 costs ~3x the smoother work per
# V-cycle for only ~20% fewer Krylov iterations; the round-4 "0.77 vs
# 1.58-1.99 s/iter" confusion was this default mismatch, not the ELL
# apply form)
os.environ.setdefault("CALIBR8_MG_CHEB_DEGREE", "2")
# AOT memory accounting before the first run: an OOM'd/faulted run
# still leaves the HBM evidence (bench.report_mem)
os.environ.setdefault("CALIBR8_BENCH_MEMSTATS", "1")


def main():
    phase = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    refs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    dtype_str = "f64" if os.environ.get("CALIBR8_X64", "0") == "1" else "f32"

    import jax

    import bench

    t0 = time.perf_counter()
    base_n = max(2, n >> refs) if refs else n
    prob = bench.build_problem(base_n, dtype_str, refinements=refs)
    disc = prob.disc
    hoist = disc.hoist_args(ell=True)
    out = {
        "phase": phase,
        "n_elem": int(disc.n_elem),
        "n_dofs": int(disc.n_dofs),
        "setup_s": round(time.perf_counter() - t0, 1),
        "cheb_degree": int(os.environ.get("CALIBR8_MG_CHEB_DEGREE", 6)),
        "restart": int(os.environ.get("CALIBR8_BENCH_RESTART", 50)),
    }
    print(json.dumps(out), flush=True)

    def _record_hbm():
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            out["hbm_peak_bytes"] = int(ms.get("peak_bytes_in_use", 0))
            out["hbm_in_use_bytes"] = int(ms.get("bytes_in_use", 0))
        except Exception:  # noqa: BLE001
            pass

    try:
        if phase == "assembly":
            bench._bench_assembly(
                prob, out, 5, with_roofline=False, hoist=hoist
            )
        elif phase == "newton":
            bench._bench_newton_split(prob, out, dtype_str, 3, hoist)
        elif phase == "adjoint":
            bench._bench_adjoint_split(
                prob, out, dtype_str, 3, hoist, prob.mg_factory
            )
        else:
            raise SystemExit(f"unknown phase {phase}")
    except Exception as e:  # noqa: BLE001
        # keep the mem_probe line + whatever HBM stats survive: the
        # point of this probe is evidence from FAILED runs too
        out["error"] = repr(e)[:500]
        _record_hbm()
        print(json.dumps(out), flush=True)
        raise
    out["device"] = str(jax.devices()[0])
    _record_hbm()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""calibr8_tpu — a TPU-native (JAX/XLA/Pallas) framework for constitutive
model calibration by PDE-constrained optimization.

A ground-up re-design of the capabilities of sandialabs/calibr8
(reference: /root/reference/source/calibr8): an implicit quasi-static
finite-element solver for solid mechanics with

  * a global residual R(x, x_prev, xi, p) = 0 (balance of linear momentum,
    optionally mixed u/p with GLS-type pressure stabilization),
  * local residuals C(xi, xi_prev, x, p) = 0 (elastoplastic constitutive
    models solved by Newton at every integration point),
  * scalar QoIs J(x, xi, p) (DIC displacement mismatch, load mismatch, ...),
  * exact parameter sensitivities dJ/dp via a two-level (global/local)
    adjoint over pseudo-time steps,
  * adjoint-based a-posteriori error estimation on nested refinements, and
  * virtual-fields-method (VFM) objectives.

Where the reference uses Sacado forward AD + Trilinos (Tpetra/Belos/MueLu)
+ PUMI on MPI, this framework uses jax.jacfwd/vjp on pure element kernels,
vmapped batched element assembly with segment_sum scatter, matrix-free /
element-by-element Krylov solves, and SPMD sharding over a TPU mesh via
jax.sharding + shard_map.

Precision: the reference is float64 throughout (local Newton tolerances of
1e-12); we enable jax x64 at import unless CALIBR8_X64=0 is set in the
environment (e.g. for bfloat16/f32 benchmarking paths).
"""

import os as _os

import jax as _jax

if (
    _os.environ.get("CALIBR8_X64", "1") != "0"
    or _os.environ.get("CALIBR8_IR", "0") == "1"
):
    # CALIBR8_IR=1 enables x64 WITHOUT changing the f32 problem dtype:
    # mixed-precision iterative refinement promotes only the true-
    # residual computation to f64 (solve/linear.py residual_hp) while
    # every solve stays f32 — the f32-measured relres floor at 1M+ DOF
    # (~1.5-2e-4 for the transposed/adjoint system) sits ABOVE the
    # 1e-4 tolerance, so convergence there needs an f64 measuring stick
    # and an f64 solution accumulator.
    _jax.config.update("jax_enable_x64", True)

# Some TPU plugin sitecustomize hooks force jax_platforms at interpreter
# start, overriding the JAX_PLATFORMS environment variable; re-assert the
# user's explicit choice so CPU test runs stay on CPU.
if _os.environ.get("JAX_PLATFORMS"):
    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

__version__ = "0.1.0"

from calibr8_tpu.deck import load_deck, ProblemSpec  # noqa: E402,F401

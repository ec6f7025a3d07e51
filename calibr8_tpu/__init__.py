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

if _os.environ.get("CALIBR8_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)
# CALIBR8_IR=1 (mixed-precision iterative refinement, solve/linear.py
# residual_hp + host_ir_loop) does NOT flip this global: the f64
# residual program is traced under jax.experimental.enable_x64() so
# every other program stays bit-identical to the plain f32 ones —
# process-wide x64 recompiled the 1.1M-DOF hierarchy-build program
# with i64 index types and crashed the remote TPU compile helper.

# Some TPU plugin sitecustomize hooks force jax_platforms at interpreter
# start, overriding the JAX_PLATFORMS environment variable; re-assert the
# user's explicit choice so CPU test runs stay on CPU.
if _os.environ.get("JAX_PLATFORMS"):
    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

__version__ = "0.1.0"

from calibr8_tpu.deck import load_deck, ProblemSpec  # noqa: E402,F401

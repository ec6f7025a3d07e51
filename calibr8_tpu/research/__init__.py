"""Research mini-app: adaptive adjoint-error estimation playground.

TPU-native rebuild of the reference's standalone research code
(reference: source/calibr8/research/ — research.cpp:12-40 driver,
nlpoisson.{hpp,cpp}, nlelasticity.hpp, error_adjoint.cpp, qoi_*.hpp):
nonlinear Poisson (manufactured solution) and nonlinear (Neo-Hookean)
elasticity primal solves, goal-oriented adjoint error estimates on the
nested fine space (eta1: fine adjoint at the prolonged state; eta2:
fine adjoint at the fine solution — the exact-linearization variant),
elementwise localization + bounds, and mesh-adaptation cycles with a
J-convergence history.
"""

from calibr8_tpu.research.physics import ResearchProblem
from calibr8_tpu.research.error import adjoint_error_estimate
from calibr8_tpu.research.driver import run_research

__all__ = ["ResearchProblem", "adjoint_error_estimate", "run_research"]

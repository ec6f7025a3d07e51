from calibr8_tpu.mechanics.global_residual import MechanicsSpec, make_elem_residual  # noqa: F401

"""Test configuration: force CPU with an 8-device virtual mesh so
sharding tests exercise real multi-device SPMD without TPU hardware,
and enable float64 (the reference is double-precision throughout)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# the axon TPU plugin's register() overrides jax_platforms at import
# (sitecustomize); force pure-CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

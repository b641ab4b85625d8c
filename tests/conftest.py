"""Test env setup: force JAX onto CPU with 8 virtual devices so mesh/pjit
logic is exercised without TPU hardware, and parity numerics stay fp32-exact.

The container pins JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize, so we
must override the env *and* the live config before any test imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

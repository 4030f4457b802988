"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Mirrors how the reference's CI needs no GPU (SURVEY.md §4): tests target the
CPU backend (``JAX_PLATFORMS=cpu``) with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware; float64 is enabled
so statistical self-consistency tests can use the reference's tolerances
(t-tests at alpha=1e-4 with 1e6 samples, tests/test_approximations.py:7-8).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment's sitecustomize may force-register a TPU platform via
# jax.config.update("jax_platforms", ...); override it after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

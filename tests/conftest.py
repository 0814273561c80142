"""Test configuration: force CPU backend with 8 virtual devices so kernel
and sharding tests run without TPU hardware (SURVEY.md section 4 test
strategy). Must run before jax initializes."""

import os

# The image's sitecustomize registers the remote-TPU PJRT plugin and forces
# jax_platforms="axon,cpu" — os.environ alone can't win. Override the config
# directly (before any computation) so tests run on local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

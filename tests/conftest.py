"""Test configuration.

Tests run on a virtual 8-device CPU mesh (f64 is native on CPU and the
sharding paths are exercised without real TPU pods, per SURVEY §4's
implication for the TPU build). The axon TPU plugin ignores the
JAX_PLATFORMS environment variable, so the backend is forced via
jax.config before any computation.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

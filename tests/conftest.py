"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit code paths are
exercised on 8 virtual CPU devices instead (XLA host-platform device count).
Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's site config pins jax_platforms to "axon,cpu" (a tunneled TPU);
# the env var is overridden, so force CPU through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

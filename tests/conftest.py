"""Test configuration: run everything on CPU with 8 virtual devices.

The outer environment pins JAX_PLATFORMS to the TPU plugin ("axon"); tests
must run on CPU (fp32 matmul parity + 8 virtual devices for sharding tests),
so we override via jax.config before any backend initialization. XLA_FLAGS
must also be set before the CPU client is created.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()

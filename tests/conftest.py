"""Test env: CPU backend with 8 virtual devices for multi-chip sharding tests.

Must run before any ``import jax`` (pytest imports conftest first).
The reference has no distributed tests at all (SURVEY §4); the virtual mesh
lets us test tp/dp shardings without TPU hardware.
"""

import os

# Force CPU even if the session env pins a TPU platform (e.g. JAX_PLATFORMS=axon):
# unit tests need exact fp32 math and a virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (env vars above must be set first)

# This JAX build defaults matmuls to fast (bf16-accumulation) precision even
# on CPU; parity tests need exact fp32.
jax.config.update("jax_default_matmul_precision", "highest")

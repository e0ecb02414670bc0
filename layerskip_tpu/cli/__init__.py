"""CLI package init: optional platform override.

This container's sitecustomize imports jax at interpreter startup and pins
the tunneled TPU backend, which defeats ``JAX_PLATFORMS=...`` set at process
launch. ``LAYERSKIP_PLATFORM=cpu`` (or tpu) reclaims the choice for CLI runs
(e.g. multi-device smoke tests on a virtual CPU mesh).
"""

import os

if os.environ.get("LAYERSKIP_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["LAYERSKIP_PLATFORM"])

"""Test env: CPU backend with 8 virtual devices for multi-chip sharding tests.

The container's sitecustomize imports jax at interpreter startup and pins
``JAX_PLATFORMS=axon`` (the tunneled real TPU), so setting env vars here is
too late for jax's import-time config. We override through ``jax.config``
instead — that is honored as long as no backend has been initialized yet.
Unit tests need (a) exact fp32 math and (b) a *virtual* 8-device mesh, which
the single tunneled TPU chip can't provide (the reference has no distributed
tests at all — SURVEY §4).
"""

import os


def pytest_addoption(parser):
    # addopts carries "-n auto" (pytest-xdist). In an environment installed
    # from the pre-xdist [test] extra, that would abort option parsing with
    # "unrecognized arguments" before a single test runs — register a no-op
    # fallback so the documented `pytest tests/ -q` still works (serially).
    try:
        import xdist  # noqa: F401
    except ImportError:
        parser.addoption(
            "-n", "--numprocesses", action="store", default=None,
            help="no-op fallback: pytest-xdist is not installed",
        )


_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (flags above must be set first)

jax.config.update("jax_platforms", "cpu")
# This JAX build defaults matmuls to fast (bf16-accumulation) precision even
# on CPU; parity tests need exact fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# Keep the persistent compile cache OUT of test runs: test_apps imports
# cli.loading, which points jax_compilation_cache_dir at the CLI cache
# (cli/loading.py) — and this jaxlib build SIGABRTs serializing CPU
# executables into it (observed: Fatal Python error in
# compilation_cache.put_executable_and_time during the suite). Tests must
# be hermetic regardless of import order.
jax.config.update("jax_enable_compilation_cache", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()

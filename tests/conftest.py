"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the driver benches on the real chip separately).

The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so
plain env vars are latched too late; override through jax.config instead.
XLA_FLAGS must still be set before the CPU backend is *created* (it is
created lazily, so doing it here works).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test"
    )

"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so sharding / pjit paths are
exercised without TPU hardware (mirrors the driver's dryrun_multichip check).

Note: the environment's sitecustomize registers a TPU ("axon") PJRT backend at
interpreter startup and presets JAX_PLATFORMS=axon, so env vars alone are not
enough — we must override through jax.config before any backend initializes.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()

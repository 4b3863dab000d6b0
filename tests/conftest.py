"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (the standard JAX
fake-backend trick).

Note: this environment injects an `axon` TPU platform via sitecustomize and
forces JAX_PLATFORMS=axon, so the env var alone is NOT enough — we must also
override the config after import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

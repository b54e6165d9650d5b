"""Root conftest: force JAX onto CPU with 8 virtual devices for the test
suite BEFORE any test imports jax. Some environment pytest plugins import jax
at startup, so plain env vars in tests/conftest.py are too late — we also
update the config directly (safe while the backend is uninitialized)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

"""Test env: run on CPU with 8 virtual devices so sharding/TP tests work
without TPU hardware (the fake-backend mechanism the reference lacks,
SURVEY.md §4). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU-tunnel plugin registers its backend from sitecustomize at
# interpreter start, which pins the platform before env vars are consulted;
# jax.config is the override that still works after that.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()

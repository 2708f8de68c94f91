"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's "multi-GPU tests without a cluster" strategy
(SURVEY.md §4): distribution logic is exercised on whatever local devices
exist. Here we force 8 virtual CPU devices so mg/shard_map paths compile
and execute without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# actually forces CPU. Set CUVS_TPU_TEST_PLATFORM=tpu to run tests on chip.
jax.config.update("jax_platforms", os.environ.get("CUVS_TPU_TEST_PLATFORM", "cpu"))
jax.config.update("jax_threefry_partitionable", True)

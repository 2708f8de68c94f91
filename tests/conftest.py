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
import pytest  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# actually forces CPU. Set CUVS_TPU_TEST_PLATFORM=tpu to run tests on chip.
jax.config.update("jax_platforms", os.environ.get("CUVS_TPU_TEST_PLATFORM", "cpu"))
jax.config.update("jax_threefry_partitionable", True)

# Long-running recall/scale tests, marked centrally so a fast dev loop is
# one flag away: `pytest -m "not slow"` (~3x faster); CI runs everything.
_SLOW = {
    "test_ivf_pq.py": [
        "test_recall", "test_per_cluster", "test_lut_dtype", "test_pq_bits",
        "test_extend", "test_prefilter", "test_build_streaming",
    ],
    "test_ivf_flat.py": ["test_recall", "test_extend", "test_adaptive"],
    "test_ivf_sq.py": ["test_recall"],
    "test_ivf_rabitq.py": ["test_recall", "test_bits"],
    "test_ivf_scan.py": ["test_cluster_major"],
    "test_cagra.py": [
        "test_recall", "test_itopk", "test_extend_many", "test_guarantee",
        "test_iterative", "test_ace",
    ],
    "test_kmeans.py": ["test_balanced", "test_find_k"],
    "test_mg.py": ["test_sharded_search"],
    "test_serialize.py": ["test_cagra_compressed", "test_tiered"],
    "test_graph_family.py": ["test_hnsw_cpu_hierarchy", "test_vamana_recall"],
    "test_reference_recall.py": ["test_cagra", "test_ivf"],
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        pats = _SLOW.get(item.fspath.basename, ())
        if any(item.name.startswith(p) for p in pats):
            item.add_marker(pytest.mark.slow)

"""Execution resources handle.

The reference threads a ``raft::resources`` handle (CUDA stream, workspace
memory resource, NCCL comms) through every call
(e.g. /root/reference/cpp/src/neighbors/ivf_flat/ivf_flat_search.cuh:57).
On TPU the XLA runtime owns streams and memory, so the handle reduces to
lightweight execution policy: target device(s), default compute dtype for
MXU matmuls, and batching knobs. All APIs accept ``res=None`` and fall back
to sensible defaults, so the handle is optional — unlike CUDA, nothing
needs explicit stream plumbing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Resources:
    """Execution policy for cuvs_tpu calls.

    Attributes:
      device: target ``jax.Device`` (None = JAX default device).
      compute_dtype: dtype fed to the MXU for distance matmuls. bfloat16
        maximizes MXU throughput; float32 maximizes accuracy.
      mesh: optional ``jax.sharding.Mesh`` for multi-chip (mg) calls.
      query_batch: internal query batching size for memory-bounded search
        loops (analog of ivf_pq max_internal_batch_size=4096,
        /root/reference/cpp/include/cuvs/neighbors/ivf_pq.hpp:212).
    """

    device: Optional[Any] = None
    compute_dtype: Any = jnp.float32
    mesh: Optional[Any] = None
    query_batch: int = 4096

    def put(self, x):
        """Place an array on this handle's device."""
        if self.device is None:
            return jnp.asarray(x)
        return jax.device_put(jnp.asarray(x), self.device)


_DEFAULT = Resources()


def default_resources() -> Resources:
    return _DEFAULT


def get(res: Optional[Resources]) -> Resources:
    return res if res is not None else _DEFAULT

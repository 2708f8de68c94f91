"""Fused distance + argmin — the k-means assignment inner loop.

Reference: fused L2/IP distance + argmin reduction
(/root/reference/cpp/src/distance/fused_distance_nn.cuh and
detail/fused_distance_nn/). On TPU this is a tiled matmul whose epilogue is
an argmin over the centroid axis; XLA fuses norm-add + argmin into the
matmul consumer, so no Pallas is needed — the MXU does the n*k*d work and
the VPU reduces [tile, k] to [tile] without materializing [n, k] in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.distance.pairwise import matmul_precision


@functools.partial(jax.jit, static_argnames=("row_tile", "compute_dtype", "sqrt"))
def _fused_impl(x, y, y_norms, row_tile, compute_dtype, sqrt, weights=None):
    m, d = x.shape
    k = y.shape[0]
    yc = y.astype(compute_dtype)
    xn_all = jnp.sum(jnp.asarray(x, jnp.float32) ** 2, axis=-1)

    pad = (-m) % row_tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xnp = jnp.pad(xn_all, ((0, pad),))
    xt = xp.reshape(-1, row_tile, d)
    xnt = xnp.reshape(-1, row_tile)

    def tile_fn(args):
        xtile, xn = args
        dots = lax.dot_general(
            xtile.astype(compute_dtype),
            yc,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=matmul_precision(compute_dtype),
        )  # [row_tile, k]
        dist = xn[:, None] + y_norms[None, :] - 2.0 * dots
        dist = jnp.maximum(dist, 0.0)
        if weights is not None:  # soft-balancing size penalty
            dist = dist * weights[None, :]
        idx = jnp.argmin(dist, axis=-1)
        val = jnp.min(dist, axis=-1)
        return idx.astype(jnp.int32), val

    idx, val = lax.map(tile_fn, (xt, xnt))
    idx = idx.reshape(-1)[:m]
    val = val.reshape(-1)[:m]
    if sqrt:
        val = jnp.sqrt(val)
    return idx, val


def fused_l2_argmin(
    x,
    y,
    y_norms: Optional[jnp.ndarray] = None,
    row_tile: int = 32768,
    compute_dtype=jnp.float32,
    sqrt: bool = False,
    center_weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each row of x, the nearest row of y under squared L2.

    Returns (labels [m] int32, min_dist [m] fp32). ``row_tile`` bounds the
    [tile, k] intermediate (parity with the reference's batch_samples=2^15
    mini-batching, include/cuvs/cluster/kmeans.hpp:111).
    ``center_weights`` [k] multiplies squared distances inside the argmin
    (the kmeans_balanced soft-balancing hook): returned min_dist is then
    in weighted space.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if y_norms is None:
        y_norms = jnp.sum(jnp.asarray(y, jnp.float32) ** 2, axis=-1)
    row_tile = int(min(row_tile, max(8, x.shape[0])))
    return _fused_impl(x, y, y_norms, row_tile, compute_dtype, sqrt,
                       center_weights)

"""Fused brute-force distance + top-k Pallas kernel.

Motivation (measured on v5e): the unfused path writes the [B, N] distance
matrix to HBM and reads it back for selection — 4 GB of traffic per 4096-
query batch at 131k rows, saturating HBM at ~10 TF/s effective. This
kernel keeps each [B_TILE, N_TILE] distance block in VMEM and reduces it
to per-tile top-k candidates on the spot, so HBM traffic drops to the
dataset stream + tiny candidate outputs and the MXU becomes the limit.

Per-tile exact top-k via K rounds of masked max/argmax (VPU reductions —
negligible next to the matmul). The union of per-tile top-k contains the
global top-k, so a final lax.top_k over [B, n_tiles*K] candidates outside
the kernel is exact.

Reference counterpart: the fused L2 + select "fusedL2knn" small-k path
(/root/reference/cpp/src/neighbors/detail/fused_l2_knn.cuh) — same fusion
idea, CUDA shared-memory reduction replaced by VMEM-resident tiles.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuvs_tpu.distance.pairwise import DistanceType


def _fused_kernel(q_ref, data_ref, out_v_ref, out_i_ref, *, k, n, tile_n, ip, exact):
    t = pl.program_id(1)
    q = q_ref[:]
    data = data_ref[:]
    dots = jnp.dot(q, data.T, preferred_element_type=jnp.float32)  # [B, T]
    if ip:
        dist = -dots  # min-space
    else:
        # norms computed in-kernel from the (possibly bf16) tiles — cheap
        # next to the matmul and avoids 1-D operands (Mosaic layout limits)
        qf = q.astype(jnp.float32)
        df = data.astype(jnp.float32)
        qn = jnp.sum(qf * qf, axis=1, keepdims=True)  # [B, 1]
        dn = jnp.sum(df * df, axis=1, keepdims=True)  # [T, 1]
        dist = qn + dn.T - 2.0 * dots
        dist = jnp.maximum(dist, 0.0)
    # mask padded dataset rows (global row id >= n)
    base = t * tile_n
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist = jnp.where(col + base < n, dist, jnp.inf)

    neg = -dist  # work in max-space
    if exact:
        # k rounds of masked max -> exact per-tile top-k (VPU cost k*B*N
        # overall; use for guaranteed-exact small-batch paths)
        for f in range(k):
            m = jnp.max(neg, axis=1)  # [B]
            am = jnp.argmax(neg, axis=1).astype(jnp.int32)  # first occurrence
            out_v_ref[0, :, f] = -m
            out_i_ref[0, :, f] = am + base
            hit = col == am[:, None]
            neg = jnp.where(hit, -jnp.inf, neg)
    else:
        # ONE pass: per-128-lane-block maxima (the approx_max_k bin
        # reduction, fused with the matmul). F = tile_n // 128 candidates
        # per tile; collisions of two global top-k in one 128-bin are the
        # only recall loss (~k^2/(2*n_bins) of queries lose one neighbor).
        B = neg.shape[0]
        F = tile_n // 128
        blocks = neg.reshape(B, F, 128)
        m = jnp.max(blocks, axis=2)  # [B, F]
        am = jnp.argmax(blocks, axis=2).astype(jnp.int32)  # [B, F]
        block_base = jax.lax.broadcasted_iota(jnp.int32, (B, F), 1) * 128
        out_v_ref[0, :, :] = -m
        out_i_ref[0, :, :] = am + block_base + base


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "block_q", "ip", "exact", "interpret")
)
def fused_bf_topk(
    queries,  # [B, d] compute dtype (bf16/f32)
    dataset,  # [N, d] same dtype as queries
    k: int,
    tile_n: int = 1024,
    block_q: int = 512,
    ip: bool = False,
    exact: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest rows. Returns (dists [B,k] min-space, ids [B,k]).

    exact=True emits per-tile top-k (union provably contains the global
    top-k); exact=False emits per-128-bin maxima (approx_max_k semantics,
    ~1 VPU pass). Pads B to block_q and N to tile_n internally.
    """
    B, d = queries.shape
    N = dataset.shape[0]
    pad_b = (-B) % block_q
    pad_n = (-N) % tile_n
    q = jnp.pad(queries, ((0, pad_b), (0, 0)))
    data = jnp.pad(dataset, ((0, pad_n), (0, 0)))
    n_tiles = (N + pad_n) // tile_n
    n_qb = (B + pad_b) // block_q

    grid = (n_qb, n_tiles)
    F = k if exact else tile_n // 128
    kernel = functools.partial(
        _fused_kernel, k=k, n=N, tile_n=tile_n, ip=ip, exact=exact
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, t: (i, 0)),
            pl.BlockSpec((tile_n, d), lambda i, t: (t, 0)),
        ],
        # TPU block constraint: last two block dims must divide (8, 128) or
        # equal the array dims -> outputs laid out [n_tiles, B, k]
        out_specs=[
            pl.BlockSpec((1, block_q, F), lambda i, t: (t, i, 0)),
            pl.BlockSpec((1, block_q, F), lambda i, t: (t, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, B + pad_b, F), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, B + pad_b, F), jnp.int32),
        ],
        interpret=interpret,
    )(q, data)

    # global merge over the candidate pool
    pool_v = jnp.moveaxis(out_v, 0, 1).reshape(B + pad_b, n_tiles * F)[:B]
    pool_i = jnp.moveaxis(out_i, 0, 1).reshape(B + pad_b, n_tiles * F)[:B]
    tv, tl = lax.top_k(-pool_v, k)
    ti = jnp.take_along_axis(pool_i, tl, axis=1)
    return -tv, ti


def search(
    dataset,
    dnorms,
    queries,
    k: int,
    metric: DistanceType = DistanceType.L2Expanded,
    compute_dtype=jnp.bfloat16,
    tile_n: int = 1024,
    block_q: int = 512,
    exact: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force k-NN via the fused kernel (L2 family + IP)."""
    if metric not in (
        DistanceType.L2Expanded,
        DistanceType.L2SqrtExpanded,
        DistanceType.InnerProduct,
    ):
        raise ValueError(f"fused kernel supports L2/IP, got {metric}")
    ip = metric == DistanceType.InnerProduct
    qf = jnp.asarray(queries, jnp.float32)
    block_q = int(min(block_q, max(8, qf.shape[0])))
    tile_n = int(min(tile_n, max(128, dataset.shape[0])))
    v, i = fused_bf_topk(
        qf.astype(compute_dtype),
        jnp.asarray(dataset, compute_dtype),
        int(k),
        tile_n=tile_n,
        block_q=block_q,
        ip=ip,
        exact=exact,
        interpret=interpret,
    )
    if ip:
        v = -v
    elif metric == DistanceType.L2SqrtExpanded:
        v = jnp.sqrt(jnp.maximum(v, 0.0))
    return v, i

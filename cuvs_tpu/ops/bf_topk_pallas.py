"""Fused brute-force distance + top-k Pallas kernel.

Motivation (measured on v5e): the unfused tiled path materializes each
[B, N_tile] distance block to HBM and reads it back for selection — at
10M rows that is ~40 GB of HBM traffic per 4096-query batch and caps
exact search at ~25k QPS. This kernel keeps each [B_TILE, N_TILE]
distance block in VMEM and reduces it on the spot, so HBM traffic drops
to ONE stream of the dataset plus a small candidate pool, and the int8
path runs the matmul on the MXU's 2x-rate int8 pipeline.

Reduction modes:
  * exact=True — k rounds of masked max per tile: the union of per-tile
    top-k provably contains the global top-k (exact small-batch path).
  * exact=False — per-128-lane-bin maxima (one VPU pass, the
    approx_max_k bin semantics): F = tile_n/128 candidates per tile; the
    only recall loss is two global top-k rows sharing one 128-bin
    (~k^2/2 / (N/128) of queries lose one neighbor — 0.6% at k=10,
    N=10M). Pair with refine() for the last digit of recall.

int8 mode: queries and dataset rows are globally-scaled int8; the dot
runs int8 x int8 -> int32 and ALL distances stay in quantized units
(ranking is scale-invariant); the caller rescales by q_scale**2.

Reference counterpart: fused L2 + select "fusedL2knn" small-k path
(/root/reference/cpp/src/neighbors/detail/fused_l2_knn.cuh) — same
fusion idea, CUDA shared-memory reduction replaced by VMEM tiles.
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
from cuvs_tpu.selection.select_k import topk as _select_topk


def _fused_kernel(q_ref, data_ref, out_v_ref, out_i_ref, *, k, n, tile_n, ip, exact):
    t = pl.program_id(1)
    q = q_ref[:]
    data = data_ref[:]
    int8_mode = data.dtype == jnp.int8
    if int8_mode:
        dots = jnp.dot(q, data.T, preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        dots = jnp.dot(q, data.T, preferred_element_type=jnp.float32)  # [B, T]
    if ip:
        dist = -dots  # min-space
    else:
        # norms computed in-kernel from the tiles — cheap next to the
        # matmul and avoids 1-D operands (Mosaic layout limits). In int8
        # mode these are quantized-space norms: consistent with the dots.
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
        # k rounds of masked max -> exact per-tile top-k
        for f in range(k):
            m = jnp.max(neg, axis=1)  # [B]
            am = jnp.argmax(neg, axis=1).astype(jnp.int32)  # first occurrence
            out_v_ref[0, :, f] = -m
            out_i_ref[0, :, f] = am + base
            hit = col == am[:, None]
            neg = jnp.where(hit, -jnp.inf, neg)
    else:
        raise AssertionError("approx mode uses _approx_kernel")


def _approx_kernel(q_ref, data_ref, out_v_ref, out_i_ref, *, n, tile_n,
                   inner, ip):
    """Per-128-lane-bin minima, dataset-stationary.

    Grid is (n_tiles, n_qb): the 3 MB data tile is fetched ONCE per tile
    and reused across all query blocks (the query block is the tiny
    operand), so the dataset streams exactly once per batch. Columns are
    processed in ``inner``-wide chunks so the f32 distance block stays
    ~4 MB regardless of tile width. Pool entries are bf16 value + uint8
    in-bin offset (3 bytes/bin vs 8): the global bin id is implicit in
    the pool column, so no absolute index is stored.
    """
    t = pl.program_id(0)
    q = q_ref[:]
    int8_mode = data_ref.dtype == jnp.int8
    qf = q.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=1, keepdims=True)  # [B, 1]
    base = t * tile_n
    for j in range(tile_n // inner):
        data = data_ref[j * inner : (j + 1) * inner, :]
        if int8_mode:
            dots = jnp.dot(q, data.T, preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            dots = jnp.dot(q, data.T, preferred_element_type=jnp.float32)
        if ip:
            dist = -dots
        else:
            df = data.astype(jnp.float32)
            dn = jnp.sum(df * df, axis=1, keepdims=True)
            dist = jnp.maximum(qn + dn.T - 2.0 * dots, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist = jnp.where(col + (base + j * inner) < n, dist, jnp.inf)
        B = dist.shape[0]
        F = inner // 128
        blocks = (-dist).reshape(B, F, 128)
        m = jnp.max(blocks, axis=2)
        am = jnp.argmax(blocks, axis=2)
        out_v_ref[:, j * F : (j + 1) * F] = (-m).astype(out_v_ref.dtype)
        out_i_ref[:, j * F : (j + 1) * F] = am.astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "block_q", "ip", "exact", "interpret")
)
def fused_bf_topk(
    queries,  # [B, d] compute dtype (bf16/f32/int8)
    dataset,  # [N, d] same dtype as queries
    k: int,
    tile_n: int = 2048,
    block_q: int = 1024,
    ip: bool = False,
    exact: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest rows. Returns (dists [B,k] min-space, ids [B,k]).

    Distances are in the dtype's own space (quantized units for int8
    inputs — callers rescale). Pads B to block_q and N to tile_n.
    """
    B, d = queries.shape
    N = dataset.shape[0]
    if not exact:
        # dataset-stationary approx path: wide tiles (the data block is
        # fetched once per tile and reused across query blocks), 4k-column
        # inner chunks to bound the f32 distance block, 256-row query
        # blocks. tile_n multiple of `inner`; F multiple of 128 for the
        # uint8/bf16 pool block layout.
        inner = 4096
        block_q = min(block_q, 256)
        tile_n = 32768 if jnp.dtype(dataset.dtype) == jnp.int8 else 16384
        if N <= tile_n:
            tile_n = max(inner, -(-N // inner) * inner)
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
    if exact:
        # small-N path: per-tile top-k blocks laid out [n_tiles, B, k]
        out_v, out_i = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_q, d), lambda i, t: (i, 0)),
                pl.BlockSpec((tile_n, d), lambda i, t: (t, 0)),
            ],
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
        pool_v = jnp.moveaxis(out_v, 0, 1).reshape(B + pad_b, n_tiles * F)[:B]
        pool_i = jnp.moveaxis(out_i, 0, 1).reshape(B + pad_b, n_tiles * F)[:B]
        tv, tl = lax.top_k(-pool_v, k)
        ti = jnp.take_along_axis(pool_i, tl, axis=1)
        return -tv, ti

    akernel = functools.partial(
        _approx_kernel, n=N, tile_n=tile_n, inner=inner, ip=ip
    )
    out_v, out_i = pl.pallas_call(
        akernel,
        grid=(n_tiles, n_qb),  # query block innermost: data tile reused
        in_specs=[
            pl.BlockSpec((block_q, d), lambda t, i: (i, 0)),
            pl.BlockSpec((tile_n, d), lambda t, i: (t, 0)),
        ],
        # pool laid out [B, n_tiles*F] directly — no post-hoc transpose of
        # a GB-scale candidate pool
        out_specs=[
            pl.BlockSpec((block_q, F), lambda t, i: (i, t)),
            pl.BlockSpec((block_q, F), lambda t, i: (i, t)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B + pad_b, n_tiles * F), jnp.float32),
            jax.ShapeDtypeStruct((B + pad_b, n_tiles * F), jnp.uint8),
        ],
        interpret=interpret,
    )(q, data)

    # global merge over the candidate pool (approx select: the pool is
    # already a per-bin reduction, a second bin pass is ~lossless). The
    # global id of pool column c is c*128 + in-bin offset.
    pool_v = out_v[:B]
    rt = None if pool_v.shape[1] <= 4 * k else 0.95
    tv, tl = _select_topk(pool_v, k, True, rt)
    local = jnp.take_along_axis(out_i[:B], tl, axis=1).astype(jnp.int32)
    ti = tl * 128 + local
    return tv, ti


def search(
    dataset,
    dnorms,
    queries,
    k: int,
    metric: DistanceType = DistanceType.L2Expanded,
    compute_dtype=jnp.bfloat16,
    tile_n: int = 2048,
    block_q: int = 1024,
    exact: bool = True,
    q_scale=None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force k-NN via the fused kernel (L2 family + IP).

    ``q_scale`` set => dataset is int8; queries are quantized with the
    same scale, the matmul runs on the int8 MXU path, and returned
    distances are rescaled by q_scale**2 (approximate — refine() for
    exact)."""
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
    if q_scale is not None:
        qq = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)
        dd = jnp.asarray(dataset)
    else:
        qq = qf.astype(compute_dtype)
        dd = jnp.asarray(dataset, compute_dtype)
    v, i = fused_bf_topk(
        qq, dd, int(k), tile_n=tile_n, block_q=block_q, ip=ip, exact=exact,
        interpret=interpret,
    )
    if q_scale is not None:
        v = v * (q_scale * q_scale)
    if ip:
        v = -v
    elif metric == DistanceType.L2SqrtExpanded:
        v = jnp.sqrt(jnp.maximum(v, 0.0))
    return v, i

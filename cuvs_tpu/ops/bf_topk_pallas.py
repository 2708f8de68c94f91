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
  * exact=False — strided per-lane-bin minima (the approx_max_k bin
    semantics): each tile keeps 128 bins of depth tile_n/128; the only
    recall loss is two global top-k rows sharing one bin (~k^2/2 /
    (N/128) of queries lose one neighbor). Pair with refine() for the
    last digit of recall.

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
        # f32 operands at HIGHEST (6-pass MXU): this kernel's exact mode
        # backs ground truth — the default reduced-precision f32 matmul
        # measurably disagrees with the unfused HIGHEST path on-chip
        prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        dots = jnp.dot(q, data.T, preferred_element_type=jnp.float32,
                       precision=prec)  # [B, T]
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


def _approx_kernel(q_ref, pen_ref, data_ref, out_v_ref, out_i_ref, *, mxu_n,
                   key_pack=False):
    """Per-128-lane-bin minima, dataset-stationary — VPU-lean epilogue.

    Grid is (n_tiles, n_qb): the data tile is fetched ONCE per tile and
    reused across all query blocks (the query block is the tiny
    operand), so the dataset streams exactly once per batch.

    Three VPU-economy moves (measured: the v1 epilogue made the fused
    kernel SLOWER than the unfused XLA path at 1M — 107k vs 205k QPS):
      1. norms arrive precomputed as ``pen`` = 0.5*||row||^2 (0 for IP),
         with +inf on padded rows — no in-kernel norm recompute per
         query block and no iota/where validity mask;
      2. the ranking score is one subtract: neg = dots - pen (the
         per-query norm is constant per row and omitted — callers
         rebuild exact L2 as qn + 2*value);
      3. bins are STRIDED: lane l of tile t collects columns
         {l, l+128, ...}; the reduction is a hand-rolled running
         (best, best-slice) loop over vreg-aligned [B, 128] slices —
         pure elementwise vreg ops, no cross-lane shuffles (the v1
         axis-2 argmax) and no [B, C, 128] reshape relayout (the v2
         middle-axis argmax: 186k QPS; this loop: 330-359k).
    Pool: per tile, 128 bins of depth C = tile_n/128; value = min
    ranking score (f32), uint8 in-bin slice c; global row id =
    t*tile_n + c*128 + l.

    ``mxu_n`` chunks the matmul along the data axis: the [B, tile_n]
    f32 dots block at the tuned 512x32768 geometry is 64M — written to
    VMEM by the MXU and re-read by the reduction loop, that round-trip
    is the gap between the measured 59% MFU and the matmul ceiling.
    Chunking keeps the live dots slab at [B, mxu_n] (4-16M) and runs
    the bin reduction per chunk while the next matmul executes.
    """
    q = q_ref[:]
    int8_mode = data_ref.dtype == jnp.int8
    B = q.shape[0]
    tile_n = data_ref.shape[0]
    n_ch = tile_n // mxu_n
    S = mxu_n // 128  # 128-lane slices per chunk
    best = besti = None
    for ch in range(n_ch):
        dsub = data_ref[ch * mxu_n : (ch + 1) * mxu_n, :]
        if int8_mode:
            # stay in int32 through the whole reduction: pen arrives as
            # the integer-rounded half-norm, the running (best, slice)
            # loop compares int32, and only the final [B, 128] pool is
            # converted — the per-element int32->f32 convert of the
            # [B, mxu_n] dots slab was ~1/4 of the VPU epilogue
            dots = jnp.dot(q, dsub.T, preferred_element_type=jnp.int32)
        else:
            dots = jnp.dot(q, dsub.T, preferred_element_type=jnp.float32)
        for s in range(S):
            c = ch * S + s
            if key_pack:
                # (score, slice) packed into ONE int32 key: the slice id
                # and the <<8 are pre-folded into pen (pen' = (pen<<8)-c
                # per slice row), so the per-element work is shift, sub,
                # max — 3 VPU ops vs the 4 of the compare/two-select
                # chain, and no besti register stream at all. Gated by
                # the caller to dims where (dots<<8) - pen' cannot
                # overflow int32.
                sl = (dots[:, s * 128 : (s + 1) * 128] << 8) \
                    - pen_ref[0, c : c + 1, :]
                best = sl if best is None else jnp.maximum(best, sl)
            else:
                sl = dots[:, s * 128 : (s + 1) * 128] \
                    - pen_ref[0, c : c + 1, :]
                if best is None:
                    best = sl
                    besti = jnp.zeros_like(sl, dtype=jnp.int32)
                else:
                    take = sl > best
                    best = jnp.where(take, sl, best)
                    besti = jnp.where(take, c, besti)
    # min-space ranking score; pool-only convert in int8 mode
    if key_pack:
        # unpack: arithmetic >>8 = floor-division recovers the signed
        # score; low byte is the in-bin slice id
        out_v_ref[0, :, :] = -(best >> 8).astype(jnp.float32)
        out_i_ref[0, :, :] = (best & 255).astype(jnp.uint8)
    else:
        out_v_ref[0, :, :] = -best.astype(jnp.float32)
        out_i_ref[0, :, :] = besti.astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "block_q", "ip", "exact", "interpret",
                     "mxu_n"),
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
    dnorms=None,  # [N] f32 squared row norms (L2 approx path; else None)
    mxu_n: int = 0,  # approx path: matmul chunk along data axis (0 = tile_n)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest rows. Returns (dists [B,k] min-space, ids [B,k]).

    Distances are in the dtype's own space (quantized units for int8
    inputs — callers rescale). Pads B to block_q and N to tile_n.
    """
    B, d = queries.shape
    N = dataset.shape[0]
    if not exact:
        # dataset-stationary approx path: the data tile is fetched once
        # per tile and reused across all query blocks; bins are strided
        # so C = tile_n/128 <= 256 fits the uint8 in-bin slice id.
        # Chunked matmul (mxu_n < tile_n) bounds the live dots slab, so
        # larger query blocks fit VMEM (fewer grid steps, deeper MXU
        # pipelining); the unchunked slab at 1024x32768 f32 would be 128M.
        block_q = min(block_q,
                      1024 if 0 < mxu_n < tile_n and mxu_n <= 8192 else 512)
        if tile_n < 4096 or tile_n % 128 or tile_n > 32768:
            tile_n = 16384
        if N <= tile_n:
            tile_n = -(-N // 128) * 128
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
        # small-N path: per-tile top-k blocks laid out [n_tiles, B, k].
        # The f32/HIGHEST dist block ([block_q, tile_n] f32 twice: dist +
        # neg working copy) lives on the kernel's VMEM stack — at the
        # 1024x2048 default that is ~18M, over the 16M default scoped
        # limit (the r4 driver OOM, BENCH_r04.json). Raise the scoped
        # limit like the approx path does (:242-244).
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(q, data)
        pool_v = jnp.moveaxis(out_v, 0, 1).reshape(B + pad_b, n_tiles * F)[:B]
        pool_i = jnp.moveaxis(out_i, 0, 1).reshape(B + pad_b, n_tiles * F)[:B]
        tv, tl = lax.top_k(-pool_v, k)
        ti = jnp.take_along_axis(pool_i, tl, axis=1)
        return -tv, ti

    # ranking penalty per row: 0.5*||row||^2 for L2 (in the data dtype's
    # own units — quantized for int8), 0 for IP; +inf on padded rows so
    # no in-kernel validity mask is needed
    C = tile_n // 128
    int8_mode = data.dtype == jnp.int8
    # key-pack mode: |dots| <= d*127^2 and the padded-row sentinel is
    # 3*d*127^2, so the packed key (score<<8 | slice) spans at most
    # 4*d*127^2*256 — gate to dims where that fits int32
    key_pack = int8_mode and 4 * d * 16129 * 256 < 2**31
    if int8_mode:
        # int32 epilogue: pen = round(||row||^2 / 2) stays exact-integer
        # arithmetic in-kernel (the +-0.5-unit rounding is far below the
        # int8 quantization noise); padded rows get a large sentinel in
        # place of +inf
        if ip:
            pen_flat = jnp.zeros((N,), jnp.int32)
        else:
            di = dataset.astype(jnp.int32)
            pen_flat = (jnp.sum(di * di, axis=1) + 1) >> 1
        sentinel = 3 * d * 16129 if key_pack else 1 << 30
        pen = jnp.pad(pen_flat, (0, pad_n), constant_values=sentinel)
    else:
        if ip:
            pen_flat = jnp.zeros((N,), jnp.float32)
        elif dnorms is not None:
            pen_flat = 0.5 * jnp.asarray(dnorms, jnp.float32)
        else:
            df = dataset.astype(jnp.float32)
            pen_flat = 0.5 * jnp.sum(df * df, axis=1)
        pen = jnp.pad(pen_flat, (0, pad_n), constant_values=jnp.inf)
    pen = pen.reshape(n_tiles, C, 128)
    if key_pack:
        # pre-fold the slice id and the <<8 into pen: in-kernel the key
        # is (dots<<8) - pen' with pen' = (pen<<8) - slice_id
        pen = (pen << 8) - lax.broadcasted_iota(jnp.int32, pen.shape, 1)

    if mxu_n <= 0 or mxu_n > tile_n or tile_n % mxu_n or mxu_n % 128:
        mxu_n = tile_n
    out_v, out_i = pl.pallas_call(
        functools.partial(_approx_kernel, mxu_n=mxu_n, key_pack=key_pack),
        grid=(n_tiles, n_qb),  # query block innermost: data tile reused
        in_specs=[
            pl.BlockSpec((block_q, d), lambda t, i: (i, 0)),
            pl.BlockSpec((1, C, 128), lambda t, i: (t, 0, 0)),
            pl.BlockSpec((tile_n, d), lambda t, i: (t, 0)),
        ],
        # pool laid out [n_tiles, B, 128] (Pallas wants the last two block
        # dims (8,128)-aligned or full); moveaxis below is one cheap
        # transpose of the already-reduced pool
        out_specs=[
            pl.BlockSpec((1, block_q, 128), lambda t, i: (t, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda t, i: (t, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, B + pad_b, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, B + pad_b, 128), jnp.uint8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, pen, data)

    # global merge over the candidate pool (approx select: the pool is
    # already a per-bin reduction, a second bin pass is ~lossless).
    # Pool column p = t*128 + lane; stored uint8 = strided slice c;
    # global row id = t*tile_n + c*128 + lane.
    pool_v = jnp.moveaxis(out_v, 0, 1).reshape(B + pad_b, n_tiles * 128)[:B]
    pool_i = jnp.moveaxis(out_i, 0, 1).reshape(B + pad_b, n_tiles * 128)[:B]
    rt = None if pool_v.shape[1] <= 4 * k else 0.95
    tv, tl = _select_topk(pool_v, k, True, rt)
    local = jnp.take_along_axis(pool_i, tl, axis=1).astype(jnp.int32)
    ti = (tl // 128) * tile_n + local * 128 + (tl % 128)
    # tv is the ranking score (dots - pen, min-space). Rebuild the true
    # distance: L2 = ||q||^2 + 2*score; IP = score (= -dots) directly.
    if not ip:
        qf32 = q[:B].astype(jnp.float32)
        qn = jnp.sum(qf32 * qf32, axis=1, keepdims=True)
        tv = jnp.maximum(qn + 2.0 * tv, 0.0)
    return tv, ti


def search(
    dataset,
    dnorms,
    queries,
    k: int,
    metric: DistanceType = DistanceType.L2Expanded,
    compute_dtype=jnp.bfloat16,
    tile_n: Optional[int] = None,
    block_q: Optional[int] = None,
    exact: bool = True,
    q_scale=None,
    interpret: bool = False,
    mxu_n: Optional[int] = None,
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
    if tile_n is None or block_q is None:
        # default tile geometry (env knobs for tuning sweeps); explicit
        # caller-passed values always win
        import os as _os

        if exact:
            tile_n = 2048 if tile_n is None else tile_n
            block_q = 1024 if block_q is None else block_q
        else:
            # measured best at 1M x 128 bf16 (v5e): 512/32768 = 359k QPS
            # vs 324-348k for smaller blocks and 233k unfused XLA path
            if tile_n is None:
                tile_n = int(_os.environ.get("CUVS_TPU_BF_TILE", 32768))
            if block_q is None:
                block_q = int(_os.environ.get("CUVS_TPU_BF_BLOCKQ", 512))
            if mxu_n is None:
                mxu_n = int(_os.environ.get("CUVS_TPU_BF_MXU_N", 0))
            # VMEM guard: the dataset window is tile_n x d x itemsize,
            # DOUBLE-buffered — wide rows (GIST 960) blow the 128M vmem
            # at the 128-dim-tuned 32768 default. 4096 floor: below it
            # fused_bf_topk resets the tile to 16384.
            isz = 1 if q_scale is not None else jnp.dtype(compute_dtype).itemsize
            cap_rows = (56 << 20) // max(1, 2 * isz * int(dataset.shape[1]))
            tile_n = int(min(tile_n, max(4096, cap_rows // 128 * 128)))
    block_q = int(min(block_q, max(8, qf.shape[0])))
    tile_n = int(min(tile_n, max(128, dataset.shape[0])))
    if exact:
        # keep the kernel's VMEM footprint under the raised 100M scoped
        # limit: dist+neg stack (2 * block_q * tile_n * 4) dominates;
        # operands are double-buffered on top
        isz = 1 if q_scale is not None else jnp.dtype(compute_dtype).itemsize
        d_ = int(dataset.shape[1])

        def _foot(bq, tn):
            return (2 * bq * tn * 4
                    + 2 * tn * d_ * isz + 2 * bq * d_ * isz
                    + 4 * bq * int(k) * 4)

        while block_q > 128 and _foot(block_q, tile_n) > 88 * 1024 * 1024:
            block_q //= 2
        while tile_n > 512 and _foot(block_q, tile_n) > 88 * 1024 * 1024:
            tile_n //= 2
    if q_scale is not None:
        qq = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)
        dd = jnp.asarray(dataset)
    else:
        qq = qf.astype(compute_dtype)
        dd = jnp.asarray(dataset, compute_dtype)
    v, i = fused_bf_topk(
        qq, dd, int(k), tile_n=tile_n, block_q=block_q, ip=ip, exact=exact,
        interpret=interpret, dnorms=dnorms, mxu_n=int(mxu_n or 0),
    )
    if q_scale is not None:
        v = v * (q_scale * q_scale)
    if ip:
        v = -v
    elif metric == DistanceType.L2SqrtExpanded:
        v = jnp.sqrt(jnp.maximum(v, 0.0))
    return v, i

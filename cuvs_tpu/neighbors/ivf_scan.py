"""Cluster-major IVF scan: the MXU-shaped inverted-list search.

The reference's interleaved scan
(/root/reference/cpp/src/neighbors/ivf_flat/ivf_flat_interleaved_scan_jit.cuh:423)
is query-major: each CTA walks its query's probed lists — efficient on
GPUs because warp gathers are cheap. On TPU a query-major scan degenerates
to batched mat-VECTOR products ([1, d] @ [d, W]) that waste 127/128 MXU
rows.

This module inverts the loop: group the (query, probe) pairs BY CLUSTER,
then each cluster chunk is one real batched matmul
``[C, M, d] x [C, W, d] -> [C, M, W]`` — M queries per cluster hit the
full systolic array. With batch x n_probes >> n_lists (the serving
regime), M is large and the scan runs at matmul speed.

Pipeline (all static shapes):
  1. sort pairs by cluster (two-pass stable argsort), slot = rank within
     cluster; callers size M via ``max_occupancy`` so no pair is dropped;
  2. lax.map over cluster chunks: dynamic-slice the cluster's rows,
     batched matmul + metric epilogue + validity/filter mask, per-pair
     top-k -> [n_lists, M, k];
  3. un-permute: every pair gathers its (cluster, slot) result row,
     final top-k over the [nq, p*k] pool.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.core import bitpack
from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType
from cuvs_tpu.neighbors import filters as filt
from cuvs_tpu.neighbors import ivf_common as ivf
from cuvs_tpu.selection.select_k import topk


@functools.partial(jax.jit, static_argnames=("n_lists",))
def max_occupancy(probe_ids: jnp.ndarray, n_lists: int) -> jnp.ndarray:
    """Largest number of (query, probe) pairs landing on one cluster.

    Callers size ``max_per_cluster`` with this so no pair is ever dropped
    (the reference's query-major scan has no analogous cap; dropping
    silently would lose recall on skewed probe distributions)."""
    counts = jnp.zeros((n_lists,), jnp.int32).at[probe_ids.reshape(-1)].add(1)
    return jnp.max(counts)


def group_pairs(probe_ids: jnp.ndarray, n_lists: int, max_per_cluster: int):
    """Group (query, probe) pairs by cluster.

    Returns:
      qidx: [n_lists, M] query index per slot (-1 empty/overflow)
      pair_slot: [nq, p] the slot each pair landed in (M = dropped)
    """
    nq, p = probe_ids.shape
    flat_c = probe_ids.reshape(-1)
    flat_q = jnp.repeat(jnp.arange(nq, dtype=jnp.int32), p)
    # stable two-pass sort: by pair index then by cluster
    order = jnp.argsort(flat_c, stable=True)
    c_s = flat_c[order]
    q_s = flat_q[order]
    first = jnp.concatenate([jnp.array([True]), c_s[1:] != c_s[:-1]])
    idx = jnp.arange(nq * p, dtype=jnp.int32)
    group_start = lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    slot = idx - group_start
    keep = slot < max_per_cluster
    row = jnp.where(keep, c_s, n_lists).astype(jnp.int32)  # OOB -> dropped
    col = jnp.where(keep, slot, 0).astype(jnp.int32)
    qidx = jnp.full((n_lists, max_per_cluster), -1, jnp.int32).at[row, col].set(
        q_s, mode="drop"
    )
    # pair -> slot mapping (in original pair order)
    pair_slot = jnp.full((nq * p,), max_per_cluster, jnp.int32).at[order].set(
        jnp.where(keep, slot, max_per_cluster)
    )
    return qidx, pair_slot.reshape(nq, p)


def _round_window_up(window: int, n_pad: int) -> int:
    """Size of the fused kernels' DMA window: window + 128 (room for the
    128-aligned start shift), rounded up to a multiple of 512 when the
    array allows. The kernel splits the window into W_k/128 lane blocks
    and picks the largest inner-matmul chunk dividing that count (<= 4
    blocks); a 512-multiple guarantees inner = 512 instead of degrading
    to 128-wide MXU ops when W_k/128 lands on a prime-ish count (e.g.
    window 3072 -> 25 blocks -> inner 128, measured 5.7k QPS vs 512-wide
    chunks at the same probe count)."""
    base = window + 128
    rounded = -(-base // 512) * 512
    # the window start is clamped to n_pad - W_k: keep W_k <= n_pad so the
    # clamp stays non-negative (tiny datasets)
    return rounded if rounded <= n_pad else base


@functools.partial(jax.jit, static_argnames=("n_lists", "m_tile", "n_tiles"))
def group_pairs_tiled(probe_ids: jnp.ndarray, n_lists: int, m_tile: int,
                      n_tiles: int):
    """Group (query, probe) pairs by cluster into FIXED-width tiles.

    ``group_pairs`` sizes every cluster's slot axis to the global max
    occupancy — on skewed probe distributions that pads the batched matmul
    ~8x (measured at 10M/4096 lists). Here a cluster with occupancy c gets
    ceil(c/m_tile) tiles of exactly m_tile slots, so padding is bounded by
    one partial tile per active cluster, and no host-side occupancy sync
    is needed (n_tiles = pairs//m_tile + n_lists is a static bound).

    Returns:
      tile_cluster: [n_tiles] cluster id per tile (-1 = empty)
      qidx:        [n_tiles, m_tile] query index per slot (-1 = empty)
      pair_tile:   [nq, p] tile of each pair
      pair_slot:   [nq, p] slot of each pair within its tile
    """
    nq, p = probe_ids.shape
    flat_c = probe_ids.reshape(-1)
    flat_q = jnp.repeat(jnp.arange(nq, dtype=jnp.int32), p)
    order = jnp.argsort(flat_c, stable=True)
    c_s = flat_c[order]
    q_s = flat_q[order]
    first = jnp.concatenate([jnp.array([True]), c_s[1:] != c_s[:-1]])
    idx = jnp.arange(nq * p, dtype=jnp.int32)
    group_start = lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    rank = idx - group_start
    occ = jnp.zeros((n_lists,), jnp.int32).at[flat_c].add(1)
    ntiles_c = -(-occ // m_tile)
    tile_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(ntiles_c)[:-1].astype(jnp.int32)]
    )
    tile_idx = tile_base[c_s] + rank // m_tile
    slot = rank % m_tile
    # the callers' default bound makes this mask provably all-True:
    # sum_c ceil(occ_c/M) <= pairs//M + n_active + 1; a dropped pair is
    # counted + reported below, never silent
    keep = tile_idx < n_tiles
    row = jnp.where(keep, tile_idx, n_tiles)
    tile_cluster = jnp.full((n_tiles,), -1, jnp.int32).at[row].set(c_s, mode="drop")
    qidx = jnp.full((n_tiles, m_tile), -1, jnp.int32).at[
        row, jnp.where(keep, slot, 0)
    ].set(q_s, mode="drop")
    pair_tile = jnp.zeros((nq * p,), jnp.int32).at[order].set(
        jnp.where(keep, tile_idx, n_tiles)
    )
    pair_slot = jnp.zeros((nq * p,), jnp.int32).at[order].set(slot)
    # drop telemetry: with the callers' default bound
    # (pairs//m_tile + n_active_clusters + 1 >= sum ceil(occ_c/m_tile))
    # drops are provably impossible; a caller-supplied smaller n_tiles
    # surfaces loudly instead of silently losing recall
    dropped = jnp.sum(~keep)
    # jax.debug.print stages a host callback, which the axon TPU plugin
    # cannot execute (io_callback UNIMPLEMENTED); stage it only where
    # callbacks work (CPU — i.e. the test suite). On TPU the callers'
    # default bound makes drops provably impossible.
    if jax.default_backend() == "cpu":
        jax.lax.cond(
            dropped > 0,
            lambda d: jax.debug.print(
                "cuvs_tpu.ivf_scan: {d} (query, probe) pairs dropped — "
                "n_tiles bound too small; recall is degraded", d=d
            ),
            lambda d: None,
            dropped,
        )
    return tile_cluster, qidx, pair_tile.reshape(nq, p), pair_slot.reshape(nq, p)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "window", "max_per_cluster", "cluster_chunk",
        "compute_dtype", "recall_target",
    ),
)
def cluster_major_scan(
    sorted_data,
    sorted_norms,
    lists,
    queries_f32,
    probe_ids,
    prefilter,
    k,
    metric,
    window,
    max_per_cluster,
    cluster_chunk,
    compute_dtype,
    recall_target,
    q_scale=None,
):
    """IVF-Flat cluster-major search core. Returns (dists [nq,k], ids).

    ``q_scale`` set => sorted_data is int8-quantized; queries are quantized
    with the same scale and the block matmul runs on the MXU int8 path
    (int32 accumulate), rescaled by q_scale**2; norms stay exact f32.
    """
    nq, d = queries_f32.shape
    n_lists = lists.offsets.shape[0]
    p = probe_ids.shape[1]
    M = max_per_cluster
    ip = metric == DistanceType.InnerProduct
    cosine = metric == DistanceType.CosineExpanded
    dp = sorted_data.shape[1]
    qpad = jnp.pad(queries_f32, ((0, 0), (0, dp - d))) if dp != d else queries_f32

    qidx, pair_slot = group_pairs(probe_ids, n_lists, M)
    qn = jnp.sum(queries_f32 * queries_f32, axis=1)
    if cosine:
        qn = jnp.sqrt(qn)
    if q_scale is not None:
        qc_all = jnp.clip(jnp.round(qpad / q_scale), -127, 127).astype(jnp.int8)
        scale2 = q_scale * q_scale
    else:
        qc_all = qpad.astype(compute_dtype)
        scale2 = None

    pad_l = (-n_lists) % cluster_chunk
    qidx_p = jnp.pad(qidx, ((0, pad_l), (0, 0)), constant_values=-1)
    cl_ids = jnp.arange(n_lists + pad_l, dtype=jnp.int32)
    kk = min(k, window)

    def chunk_fn(args):
        qi, cl = args  # [C, M], [C]
        C = qi.shape[0]
        safe_c = jnp.minimum(cl, n_lists - 1)
        starts = lists.offsets[safe_c]
        data_w = ivf.window_gather(sorted_data, starts, window)  # [C, W, d]
        ids_w = ivf.window_gather(lists.ids, starts, window)
        lab_w = ivf.window_gather(lists.labels, starts, window)
        norm_w = ivf.window_gather(sorted_norms, starts, window)

        safe_q = jnp.maximum(qi, 0)
        qs = qc_all[safe_q]  # [C, M, d]
        if scale2 is not None:
            dots = lax.dot_general(
                qs, data_w, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * scale2  # [C, M, W]
        else:
            dots = lax.dot_general(
                qs,
                data_w.astype(compute_dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=pairwise.matmul_precision(compute_dtype),
            )  # [C, M, W]

        if ip:
            order = -dots
        elif cosine:
            denom = jnp.maximum(
                qn[safe_q][:, :, None] * jnp.sqrt(norm_w)[:, None, :], 1e-30
            )
            order = 1.0 - dots / denom
        else:
            order = jnp.maximum(
                qn[safe_q][:, :, None] + norm_w[:, None, :] - 2.0 * dots, 0.0
            )

        valid = (lab_w == safe_c[:, None])[:, None, :]  # [C, 1, W]
        valid = jnp.logical_and(valid, (qi >= 0)[:, :, None])
        mask = filt.passes(prefilter, safe_q[:, :, None], ids_w[:, None, :])
        if mask is not None:
            valid = jnp.logical_and(valid, mask)
        order = jnp.where(valid, order, jnp.inf)

        o2 = order.reshape(C * M, window)
        tv, tl = topk(o2, kk, True, recall_target)
        ti = jnp.take_along_axis(
            jnp.repeat(ids_w, M, axis=0).reshape(C * M, window), tl, axis=1
        )
        return tv.reshape(C, M, kk), ti.reshape(C, M, kk)

    tv, ti = lax.map(
        chunk_fn,
        (qidx_p.reshape(-1, cluster_chunk, M), cl_ids.reshape(-1, cluster_chunk)),
    )
    tv = tv.reshape(n_lists + pad_l, M, kk)[:n_lists]
    ti = ti.reshape(n_lists + pad_l, M, kk)[:n_lists]
    # pad one extra slot row (dropped pairs land there)
    tv = jnp.pad(tv, ((0, 0), (0, 1), (0, 0)), constant_values=jnp.inf)
    ti = jnp.pad(ti, ((0, 0), (0, 1), (0, 0)))

    # un-permute: [nq, p, kk]
    pv = tv[probe_ids, pair_slot]  # fancy gather over (cluster, slot)
    pi = ti[probe_ids, pair_slot]
    pool_v = pv.reshape(nq, p * kk)
    pool_i = pi.reshape(nq, p * kk)
    fv, fl = topk(pool_v, k, True, None)
    fi = jnp.take_along_axis(pool_i, fl, axis=1)
    if ip:
        fv = -fv
    fv = ivf.postprocess_distances(fv, metric)
    return fv, fi


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "window", "m_tile", "cluster_chunk",
        "compute_dtype", "recall_target", "n_tiles",
    ),
)
def cluster_major_scan_tiled(
    sorted_data,
    sorted_norms,
    lists,
    queries_f32,
    probe_ids,
    prefilter,
    k,
    metric,
    window,
    m_tile,
    cluster_chunk,
    compute_dtype,
    recall_target,
    n_tiles,
    q_scale=None,
):
    """IVF-Flat cluster-major search over fixed-width pair tiles.

    Same math as ``cluster_major_scan`` but grouped by ``group_pairs_tiled``
    (bounded padding, no host sync; see its docstring). ``q_scale`` set =>
    int8 data + quantized queries on the MXU int8 path.
    """
    nq, d = queries_f32.shape
    p = probe_ids.shape[1]
    n_lists = lists.offsets.shape[0]
    M = m_tile
    is_udf = callable(metric) and not isinstance(metric, DistanceType)
    ip = metric == DistanceType.InnerProduct
    cosine = metric == DistanceType.CosineExpanded
    dp = sorted_data.shape[1]
    if dp != d:  # lane-aligned storage (e.g. 96 -> 128): zero-pad queries
        queries_pad = jnp.pad(queries_f32, ((0, 0), (0, dp - d)))
    else:
        queries_pad = queries_f32

    tile_cluster, qidx, pair_tile, pair_slot = group_pairs_tiled(
        probe_ids, n_lists, M, n_tiles
    )
    qn = jnp.sum(queries_f32 * queries_f32, axis=1)
    if cosine:
        qn = jnp.sqrt(qn)
    if q_scale is not None:
        qc_all = jnp.clip(jnp.round(queries_pad / q_scale), -127, 127).astype(jnp.int8)
        scale2 = q_scale * q_scale
    else:
        qc_all = queries_pad.astype(compute_dtype)
        scale2 = None

    pad_t = (-n_tiles) % cluster_chunk
    qidx_p = jnp.pad(qidx, ((0, pad_t), (0, 0)), constant_values=-1)
    tc_p = jnp.pad(tile_cluster, (0, pad_t), constant_values=-1)
    kk = min(k, window)

    def chunk_fn(args):
        qi, cl = args  # [C, M], [C] cluster per tile (-1 empty)
        C = qi.shape[0]
        safe_c = jnp.clip(cl, 0, n_lists - 1)
        starts = lists.offsets[safe_c]
        data_w = ivf.window_gather(sorted_data, starts, window)  # [C, W, d]
        ids_w = ivf.window_gather(lists.ids, starts, window)
        lab_w = ivf.window_gather(lists.labels, starts, window)
        norm_w = ivf.window_gather(sorted_norms, starts, window)

        safe_q = jnp.maximum(qi, 0)
        qs = qc_all[safe_q]  # [C, M, d]
        if is_udf:
            # metric UDF: fn(q [M,d], rows [W,d]) -> [M,W], vmapped over
            # the cluster-tile axis; quantized storage is dequantized
            data_f = data_w[..., :d].astype(jnp.float32)
            if q_scale is not None:
                data_f = data_f * q_scale
            order = jnp.asarray(
                jax.vmap(metric)(queries_f32[safe_q], data_f), jnp.float32)
        elif scale2 is not None:
            dots = lax.dot_general(
                qs, data_w, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * scale2
        else:
            dots = lax.dot_general(
                qs,
                data_w.astype(compute_dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=pairwise.matmul_precision(compute_dtype),
            )  # [C, M, W]

        if is_udf:
            pass
        elif ip:
            order = -dots
        elif cosine:
            denom = jnp.maximum(
                qn[safe_q][:, :, None] * jnp.sqrt(norm_w)[:, None, :], 1e-30
            )
            order = 1.0 - dots / denom
        else:
            order = jnp.maximum(
                qn[safe_q][:, :, None] + norm_w[:, None, :] - 2.0 * dots, 0.0
            )

        valid = (lab_w == safe_c[:, None])[:, None, :]  # [C, 1, W]
        valid = jnp.logical_and(valid, (qi >= 0)[:, :, None])
        mask = filt.passes(prefilter, safe_q[:, :, None], ids_w[:, None, :])
        if mask is not None:
            valid = jnp.logical_and(valid, mask)
        order = jnp.where(valid, order, jnp.inf)

        o2 = order.reshape(C * M, window)
        tv, tl = topk(o2, kk, True, recall_target)
        ti = jnp.take_along_axis(
            jnp.repeat(ids_w, M, axis=0).reshape(C * M, window), tl, axis=1
        )
        return tv.reshape(C, M, kk), ti.reshape(C, M, kk)

    tv, ti = lax.map(
        chunk_fn,
        (qidx_p.reshape(-1, cluster_chunk, M), tc_p.reshape(-1, cluster_chunk)),
    )
    tv = tv.reshape(n_tiles + pad_t, M, kk)[:n_tiles]
    ti = ti.reshape(n_tiles + pad_t, M, kk)[:n_tiles]
    # one extra tile row: dropped pairs (pair_tile == n_tiles) land there
    tv = jnp.pad(tv, ((0, 1), (0, 0), (0, 0)), constant_values=jnp.inf)
    ti = jnp.pad(ti, ((0, 1), (0, 0), (0, 0)))

    pv = tv[pair_tile, pair_slot]  # [nq, p, kk]
    pi = ti[pair_tile, pair_slot]
    fv, fl = topk(pv.reshape(nq, p * kk), k, True, None)
    fi = jnp.take_along_axis(pi.reshape(nq, p * kk), fl, axis=1)
    if ip:
        fv = -fv
    fv = ivf.postprocess_distances(fv, metric)
    return fv, fi


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "window", "m_tile", "compute_dtype", "n_tiles",
        "recall_target", "bin_cap", "interpret",
    ),
)
def cluster_major_scan_fused(
    sorted_data,
    sorted_norms,
    lists,
    queries_f32,
    probe_ids,
    k,
    metric,
    window,
    m_tile,
    compute_dtype,
    n_tiles,
    recall_target=None,
    q_scale=None,
    bin_cap=None,
    prefilter=None,
    overfetch=4,
    interpret=False,
):
    """IVF-Flat cluster-major search through the fused Pallas scan kernel
    (ops/ivf_scan_pallas.py): no HBM order tensor, no per-row sorts —
    each probed window is scored and bin-reduced entirely in VMEM.

    Same grouping as ``cluster_major_scan_tiled``; per-probe candidates
    are per-128-row-bin minima (approx-select semantics; pair with
    refine() for the last recall digit). L2 family + InnerProduct only.

    Filters (sample_filter_data.cuh analog): a BITSET filter folds into
    the kernel's per-row penalty array — filtered rows carry a +inf
    penalty, so they never occupy a bin slot (exact semantics, zero
    kernel cost). BITMAP/UDF filters are per-query, so they mask the
    candidate pool after the scan: the pool is over-fetched by
    ``overfetch``x, masked, and re-selected — approximate when more than
    (overfetch-1)*k of a query's pool leaders are filtered out (the
    reference's filtering_rate trade-off, cagra.hpp:355).
    """
    from cuvs_tpu.ops import ivf_scan_pallas

    nq, d = queries_f32.shape
    p = probe_ids.shape[1]
    n_lists = lists.offsets.shape[0]
    M = m_tile
    ip = metric == DistanceType.InnerProduct
    dp = sorted_data.shape[1]
    n_pad = sorted_data.shape[0]
    W_k = _round_window_up(window, n_pad)

    flt = None if (prefilter is None or prefilter.is_none) else prefilter
    bitset_mode = flt is not None and flt.kind == "bitset"
    post_mode = flt is not None and not bitset_mode
    ip_kernel = ip
    if bitset_mode:
        from cuvs_tpu.core import bitset as _bs

        # poison filtered rows' penalty: +inf penalty => the row loses
        # every bin comparison. IP has no norm term, so route through the
        # L2 penalty path with zero "norms" — order values come back as
        # -2*q.y (2x the IP order value), rescaled after the top-k.
        m = min(lists.ids.shape[0], sorted_norms.shape[0])
        valid_rows = _bs.bitset_test(flt.bits, lists.ids[:m])
        base = jnp.zeros_like(sorted_norms) if ip else sorted_norms
        sorted_norms = base.at[:m].set(
            jnp.where(valid_rows, base[:m], jnp.inf))
        ip_kernel = False

    tile_cluster, qidx, pair_tile, pair_slot = group_pairs_tiled(
        probe_ids, n_lists, M, n_tiles
    )
    # per-tile window metadata (starts 128-aligned for tiled-layout DMA)
    safe_c = jnp.clip(tile_cluster, 0, n_lists - 1)
    start = lists.offsets[safe_c]
    al = (start // 128) * 128
    al = jnp.minimum(al, ((n_pad - W_k) // 128) * 128)
    lo = start - al
    sizes = jnp.where(tile_cluster >= 0, lists.sizes[safe_c], 0)

    qp = jnp.pad(queries_f32, ((0, 0), (0, dp - d))) if dp != d else queries_f32
    if q_scale is not None:
        qc = jnp.clip(jnp.round(qp / q_scale), -127, 127).astype(jnp.int8)
        scale2 = q_scale * q_scale
        int8_mode = True
    else:
        qc = qp.astype(compute_dtype)
        scale2 = jnp.float32(1.0)
        int8_mode = False

    # inner chunk: largest divisor of W_k at most 32 blocks (4 MB f32 dots)
    blocks = W_k // 128
    ib = max((b for b in range(1, min(blocks, 32) + 1) if blocks % b == 0))
    # bins are strided per lane: every window has 128 bins of depth
    # W/128, so a cluster's top-k spreads over 128 bins regardless of
    # list size; cap 2 covers k <= ~32 with negligible collision loss
    cap = int(bin_cap) if bin_cap else int(min(32, max(2, -(-k // 32))))
    out_v, out_i = ivf_scan_pallas.fused_ivf_scan(
        sorted_data, sorted_norms, qc, qidx, al, lo, sizes, scale2,
        W=W_k, m_tile=M, inner=ib * 128, ip=ip_kernel, int8_mode=int8_mode,
        cap=cap, interpret=interpret,
    )
    Fc = cap * 128

    # sentinel tile row for dropped pairs (cannot occur at the default
    # n_tiles bound — see group_pairs_tiled)
    out_v = jnp.pad(out_v, ((0, 1), (0, 0), (0, 0)), constant_values=jnp.inf)
    out_i = jnp.pad(out_i, ((0, 1), (0, 0), (0, 0)))
    pv = out_v[pair_tile, pair_slot].reshape(nq, p * Fc)
    po = out_i[pair_tile, pair_slot].reshape(nq, p * Fc)

    kk = min(k, p * Fc)
    fetch = min(p * Fc, max(k * overfetch, k)) if post_mode else kk
    tv, tl = topk(pv, fetch, True, recall_target)
    ok = jnp.isfinite(tv)
    # recover global positions: pool col = probe j * Fc + rank r * 128 +
    # lane bin; stored uint8 = 128-slice id within the window
    al_pad = jnp.append(al, 0)
    probe_j = tl // Fc
    tile_sel = jnp.take_along_axis(pair_tile, probe_j, axis=1)
    off = jnp.take_along_axis(po, tl, axis=1).astype(jnp.int32)
    pos = al_pad[tile_sel] + off * 128 + ((tl % Fc) % 128)
    fi = jnp.where(ok, lists.ids[jnp.where(ok, pos, 0)], 0)

    if bitset_mode and ip:
        tv = tv * 0.5  # kernel scored -2*q.y through the L2 penalty path
    if post_mode:
        qid = jnp.arange(nq, dtype=jnp.int32)
        mask = filt.passes(flt, qid[:, None], fi)
        tv = jnp.where(jnp.logical_and(ok, mask), tv, jnp.inf)
        tv, fi = lax.sort((tv, fi), dimension=1, num_keys=1)
        tv, fi = tv[:, :kk], fi[:, :kk]
        ok = jnp.isfinite(tv)

    if ip:
        fv = jnp.where(ok, -tv, -jnp.inf)
    else:
        qn = jnp.sum(queries_f32 * queries_f32, axis=1)
        fv = jnp.maximum(tv + qn[:, None], 0.0)
        fv = ivf.postprocess_distances(fv, metric)
    if kk < k:
        fv = jnp.pad(fv, ((0, 0), (0, k - kk)),
                     constant_values=-jnp.inf if ip else jnp.inf)
        fi = jnp.pad(fi, ((0, 0), (0, k - kk)))
    return fv, fi


def block_diag_codebook(pq_centers, dp: int, dtype=jnp.bfloat16):
    """[S, book, pq_len] per-subspace codebook -> transposed
    block-diagonal [dp, S*book] (dp = rot_dim padded to a lane multiple):
    column s*book + c holds codebook row (s, c) placed at dims
    [s*pq_len, (s+1)*pq_len). One MXU matmul with a [S*book, W] one-hot
    then decodes a whole code block."""
    S, book, pq_len = pq_centers.shape
    cb = jnp.zeros((S * book, dp), jnp.float32)
    for s in range(S):
        cb = cb.at[s * book : (s + 1) * book,
                   s * pq_len : (s + 1) * pq_len].set(pq_centers[s])
    return cb.T.astype(dtype)


def pack_codes_transposed(codes_sorted, window: int):
    """[n, S] uint8 list-sorted codes -> ([Sw, n + window] uint32 packed
    words, exactly the raw code bytes) for the fused PQ kernel's
    contiguous per-word-row window DMA."""
    n, S = codes_sorted.shape
    Sw = -(-S // 4)
    c = jnp.pad(codes_sorted.astype(jnp.uint32),
                ((0, window), (0, Sw * 4 - S)))
    w = c.reshape(-1, Sw, 4)
    words = (w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16)
             | (w[:, :, 3] << 24))
    # pad word rows to a sublane multiple: the kernel's window DMA slices
    # dim 0 of the HBM word matrix, and Mosaic requires 8-aligned slice
    # shapes there (pq_dim=48 -> Sw=12 would otherwise fail to lower)
    Sw8 = -(-Sw // 8) * 8
    return jnp.pad(words.T, ((0, Sw8 - Sw), (0, 0)))


def decoded_norms(codes_sorted, pq_centers, window: int, W_k: int):
    """Squared norms of the decoded residuals, padded for the fused
    kernel's 1024-aligned norm DMA (subspace dims are disjoint, so
    ||y||^2 = sum_s ||codebook[s, code_s]||^2 — a small-table gather)."""
    norm_tab = jnp.sum(pq_centers * pq_centers, axis=2)  # [S, book]
    S = codes_sorted.shape[1]
    nrm = jnp.zeros((codes_sorted.shape[0],), jnp.float32)
    for s in range(S):
        nrm = nrm + norm_tab[s, codes_sorted[:, s].astype(jnp.int32)]
    n_pad = codes_sorted.shape[0] + window
    Wn = -(-(W_k + 896) // 1024) * 1024
    need = (n_pad // 1024 + 1) * 1024 + Wn
    return jnp.pad(nrm, (0, need - nrm.shape[0]))


def cluster_major_scan_pq_fused(
    codes_t,
    sorted_norms,
    centers_rot,
    pq_centers,
    rotation,
    lists,
    queries_f32,
    probe_ids,
    k,
    metric,
    window,
    m_tile,
    n_tiles,
    recall_target=None,
    bin_cap=None,
    book=256,
    prefilter=None,
    overfetch=4,
    fused_dtype="bf16",
    interpret=False,
):
    """IVF-PQ cluster-major search through the fused Pallas PQ kernel
    (ops/ivf_scan_pallas.py::fused_pq_scan): codes are decoded in VMEM
    with one-hot MXU matmuls and scored/bin-reduced on-chip — no HBM
    reconstruction tensor, no order tensor (the reference analog:
    ivf_pq_compute_similarity_impl.cuh:35-78). PER_SUBSPACE codebooks,
    L2 family + InnerProduct. Rankings are ADC-approximate — pair with
    refine() for the last recall digits.

    ``fused_dtype="int8"`` runs the kernel's ADC-LUT scoring matmul at
    v5e's doubled int8 rate: the per-tile LUT is quantized IN-KERNEL
    with one dynamic scale for a ~0.5-1.5%% extra ADC error that refine
    absorbs (the reference's analog knob is search_params.lut_dtype =
    CUDA_R_8U, ivf_pq.hpp:339).

    Filters: bitset folds into the kernel's per-row penalty (exact; IP
    rides the penalty channel via ``use_pen``); bitmap/udf mask an
    overfetched pool after the scan (see cluster_major_scan_fused)."""
    from cuvs_tpu.ops import ivf_scan_pallas

    nq, d = queries_f32.shape
    p = probe_ids.shape[1]
    n_lists = lists.offsets.shape[0]
    M = m_tile
    ip = metric == DistanceType.InnerProduct
    rot_dim = rotation.shape[0]
    dp = -(-rot_dim // 128) * 128
    n_pad = codes_t.shape[1]
    W_k = _round_window_up(window, n_pad)

    tile_cluster, qidx, pair_tile, pair_slot = group_pairs_tiled(
        probe_ids, n_lists, M, n_tiles
    )
    safe_c = jnp.clip(tile_cluster, 0, n_lists - 1)
    start = lists.offsets[safe_c]
    al = (start // 128) * 128
    al = jnp.minimum(al, ((n_pad - W_k) // 128) * 128)
    lo = start - al
    sizes = jnp.where(tile_cluster >= 0, lists.sizes[safe_c], 0)

    # rotated-frame operands (PQ error >> bf16 rounding; refine recovers)
    int8_mode = fused_dtype == "int8"
    cdt = jnp.bfloat16
    qrot = queries_f32 @ rotation.T  # [nq, rot_dim] f32
    qrot_p = jnp.pad(qrot, ((0, 0), (0, dp - rot_dim))).astype(cdt)
    crot_p = jnp.pad(centers_rot, ((0, 0), (0, dp - rot_dim))).astype(cdt)
    centers_tile = crot_p[safe_c]  # [n_tiles, dp]
    cb_t = block_diag_codebook(pq_centers, dp, cdt)

    flt = None if (prefilter is None or prefilter.is_none) else prefilter
    bitset_mode = flt is not None and flt.kind == "bitset"
    use_pen = False
    if bitset_mode:
        from cuvs_tpu.core import bitset as _bs

        m = min(lists.ids.shape[0], sorted_norms.shape[0])
        valid_rows = _bs.bitset_test(flt.bits, lists.ids[:m])
        if ip:
            # IP scoring has no norm term; carry a 0/+inf filter penalty
            # on the norm channel instead (kernel use_pen path)
            base = jnp.zeros_like(sorted_norms)
            use_pen = True
        else:
            base = sorted_norms
        sorted_norms = base.at[:m].set(
            jnp.where(valid_rows, base[:m], jnp.inf))

    blocks = W_k // 128
    ib = max(b for b in range(1, min(blocks, 4) + 1) if blocks % b == 0)
    cap = int(bin_cap) if bin_cap else int(min(32, max(2, -(-k // 32))))
    out_v, out_i = ivf_scan_pallas.fused_pq_scan(
        codes_t, sorted_norms, qrot_p, cb_t, centers_tile,
        qidx, al, lo, sizes,
        W=W_k, m_tile=M, inner=ib * 128, ip=ip, cap=cap, book=book,
        use_pen=use_pen, int8_mode=int8_mode, interpret=interpret,
    )
    # per-(query, probe) cluster term: L2 adds ||q' - c_rot||^2's query
    # part ||Rq - c_rot||^2; IP adds -q.center (q.x = q.c + q_rot.y)
    offs = _cluster_offsets(qrot, centers_rot, probe_ids, ip)
    return _pool_with_offsets(
        out_v, out_i, pair_tile, pair_slot, al, lists, offs, k, metric,
        ip, cap, recall_target,
        post_filter=flt if (flt is not None and not bitset_mode) else None,
        overfetch=overfetch,
    )


def _cluster_offsets(qrot, centers_rot, probe_ids, ip):
    """Per-(query, probe) cluster term added outside the fused quantized
    kernels: -q.center for IP ranking, ||Rq - c_rot||^2 for L2."""
    qcd = jnp.einsum("nd,cd->nc", qrot, centers_rot,
                     preferred_element_type=jnp.float32)
    sel = jnp.take_along_axis(qcd, probe_ids, axis=1)  # [nq, p]
    if ip:
        return -sel
    qn = jnp.sum(qrot * qrot, axis=1)
    cn = jnp.sum(centers_rot * centers_rot, axis=1)
    return qn[:, None] + cn[probe_ids] - 2.0 * sel


def _pool_with_offsets(out_v, out_i, pair_tile, pair_slot, al, lists, offs,
                       k, metric, ip, cap, recall_target,
                       post_filter=None, overfetch=4):
    """Shared fused-kernel postlude: sentinel-pad the tile pool, add the
    per-probe offsets, cross-probe top-k, recover global ids from
    (window start, 128-slice, lane). ``post_filter`` (bitmap/udf
    prefilter) masks an ``overfetch``x-deep candidate pool before the
    final cut."""
    nq, p = pair_tile.shape
    Fc = cap * 128
    out_v = jnp.pad(out_v, ((0, 1), (0, 0), (0, 0)), constant_values=jnp.inf)
    out_i = jnp.pad(out_i, ((0, 1), (0, 0), (0, 0)))
    pv = out_v[pair_tile, pair_slot]  # [nq, p, Fc]
    po = out_i[pair_tile, pair_slot].reshape(nq, p * Fc)
    pv = (pv + offs[:, :, None]).reshape(nq, p * Fc)

    kk = min(k, p * Fc)
    fetch = min(p * Fc, max(k * overfetch, k)) if post_filter is not None else kk
    tv, tl = topk(pv, fetch, True, recall_target)
    ok = jnp.isfinite(tv)
    al_pad = jnp.append(al, 0)
    probe_j = tl // Fc
    tile_sel = jnp.take_along_axis(pair_tile, probe_j, axis=1)
    off = jnp.take_along_axis(po, tl, axis=1).astype(jnp.int32)
    pos = al_pad[tile_sel] + off * 128 + ((tl % Fc) % 128)
    fi = jnp.where(ok, lists.ids[jnp.where(ok, pos, 0)], 0)

    if post_filter is not None:
        qid = jnp.arange(nq, dtype=jnp.int32)
        mask = filt.passes(post_filter, qid[:, None], fi)
        tv = jnp.where(jnp.logical_and(ok, mask), tv, jnp.inf)
        tv, fi = lax.sort((tv, fi), dimension=1, num_keys=1)
        tv, fi = tv[:, :kk], fi[:, :kk]
        ok = jnp.isfinite(tv)

    if ip:
        fv = jnp.where(ok, -tv, -jnp.inf)
    else:
        fv = jnp.where(ok, jnp.maximum(tv, 0.0), jnp.inf)
        fv = ivf.postprocess_distances(fv, metric)
    if kk < k:
        fv = jnp.pad(fv, ((0, 0), (0, k - kk)),
                     constant_values=-jnp.inf if ip else jnp.inf)
        fi = jnp.pad(fi, ((0, 0), (0, k - kk)))
    return fv, fi


def cluster_major_scan_rabitq_fused(
    codes_t,
    sorted_fa,
    sorted_fr,
    centers_rot,
    rotation,
    lists,
    queries_f32,
    probe_ids,
    k,
    metric,
    window,
    m_tile,
    n_tiles,
    bits,
    recall_target=None,
    bin_cap=None,
    prefilter=None,
    overfetch=4,
    interpret=False,
):
    """IVF-RaBitQ cluster-major search through the fused quantized-code
    kernel: bit-packed levels are decoded in VMEM (the decode matrix
    carries the centered xu = level + k_b values, absorbing the
    per-query k_b * sum(q_rot) term) and the unbiased estimator's window
    part fa + fr * <q_rot, xu> is the kernel epilogue. Reference analog:
    bitwise_emit_distances_kernel.cu.in:85-108. Rankings feed refine().

    ``sorted_fa``/``sorted_fr`` are the METRIC-EFFECTIVE factors:
    (f_add, f_rescale) for L2, (0, 0.5*f_rescale) for InnerProduct — the
    caller folds the transform so the kernel is metric-agnostic."""
    from cuvs_tpu.ops import ivf_scan_pallas

    nq, d = queries_f32.shape
    n_lists = lists.offsets.shape[0]
    M = m_tile
    ip = metric == DistanceType.InnerProduct
    rot_dim = rotation.shape[0]
    dp = -(-rot_dim // 128) * 128
    n_pad = codes_t.shape[1]
    W_k = _round_window_up(window, n_pad)
    book = 1 << bits

    tile_cluster, qidx, pair_tile, pair_slot = group_pairs_tiled(
        probe_ids, n_lists, M, n_tiles
    )
    safe_c = jnp.clip(tile_cluster, 0, n_lists - 1)
    start = lists.offsets[safe_c]
    al = (start // 128) * 128
    al = jnp.minimum(al, ((n_pad - W_k) // 128) * 128)
    lo = start - al
    sizes = jnp.where(tile_cluster >= 0, lists.sizes[safe_c], 0)

    cdt = jnp.bfloat16
    qrot = queries_f32 @ rotation.T
    qrot_p = jnp.pad(qrot, ((0, 0), (0, dp - rot_dim))).astype(cdt)
    crot_p = jnp.pad(centers_rot, ((0, 0), (0, dp - rot_dim))).astype(cdt)
    centers_tile = crot_p[safe_c]

    # decode matrix: entry (s*book + c, s) = c + k_b (the centered level)
    kb = -((1 << bits) - 1) / 2.0
    levels = (jnp.arange(book, dtype=jnp.float32) + kb)[None, :, None]
    xu_tab = jnp.broadcast_to(levels, (rot_dim, book, 1))
    cb_t = block_diag_codebook(xu_tab, dp, cdt)

    flt = None if (prefilter is None or prefilter.is_none) else prefilter
    bitset_mode = flt is not None and flt.kind == "bitset"
    if bitset_mode:
        from cuvs_tpu.core import bitset as _bs

        # fold the filter into fa: the estimator -(fa + fr*dots) goes to
        # -inf on filtered rows regardless of metric (fa is poisoned to
        # +inf on invalid window slots by the kernel already)
        m = min(lists.ids.shape[0], sorted_fa.shape[0])
        valid_rows = _bs.bitset_test(flt.bits, lists.ids[:m])
        sorted_fa = sorted_fa.at[:m].set(
            jnp.where(valid_rows, sorted_fa[:m], jnp.inf))

    blocks = W_k // 128
    ib = max(b for b in range(1, min(blocks, 4) + 1) if blocks % b == 0)
    cap = int(bin_cap) if bin_cap else int(min(32, max(2, -(-k // 32))))
    out_v, out_i = ivf_scan_pallas.fused_pq_scan(
        codes_t, sorted_fa, qrot_p, cb_t, centers_tile,
        qidx, al, lo, sizes,
        W=W_k, m_tile=M, inner=ib * 128, ip=ip, cap=cap, book=book,
        bits=bits, mode="rabitq", sorted_fr=sorted_fr,
        interpret=interpret,
    )
    offs = _cluster_offsets(qrot, centers_rot, probe_ids, ip)
    return _pool_with_offsets(
        out_v, out_i, pair_tile, pair_slot, al, lists, offs, k, metric,
        ip, cap, recall_target,
        post_filter=flt if (flt is not None and not bitset_mode) else None,
        overfetch=overfetch,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "window", "max_per_cluster", "cluster_chunk",
        "compute_dtype", "recall_target", "pq_bits", "codebook_gen", "pq_dim_s",
        "bin_cap",
    ),
)
def cluster_major_scan_pq(
    sorted_codes,
    centers,
    centers_rot,
    pq_centers,
    rotation,
    lists,
    queries_f32,
    probe_ids,
    prefilter,
    k,
    metric,
    window,
    max_per_cluster,
    cluster_chunk,
    compute_dtype,
    recall_target,
    pq_bits=8,
    codebook_gen="per_subspace",
    pq_dim_s=0,
    bin_cap=0,
):
    """IVF-PQ cluster-major search via decode-and-dot.

    The reference scans PQ codes with a per-query LUT in shared memory
    (ivf_pq_compute_similarity_impl.cuh) — an ADC gather per (query, row,
    subspace). On TPU gathers are the bottleneck and FLOPs are nearly
    free, so instead each cluster's code block is RECONSTRUCTED once
    (``y = centers_rot[c] + Σ_s codebook[s, code]``, one contiguous
    gather per subspace, shared by every query probing the cluster) and
    scored with one batched MXU matmul — mathematically identical to ADC
    for both L2 and IP.

    ``bin_cap > 0`` switches the per-window selection from an exact
    per-row top-k sort to ``bin_cap`` masked-max rounds over 128-lane
    bins (the fused-kernel semantics, ops/ivf_scan_pallas.py): XLA fuses
    the reduction into the matmul consumer, so the [C, M, W] order
    tensor never reaches HBM — measured as the dominant cost of this
    path. PQ rankings feed refine() anyway, so the bin approximation is
    free in practice.
    """
    nq, d = queries_f32.shape
    n_lists = lists.offsets.shape[0]
    p = probe_ids.shape[1]
    M = max_per_cluster
    per_cluster = codebook_gen == "per_cluster"
    if per_cluster:
        pq_dim = pq_dim_s
        _, book, pq_len = pq_centers.shape
    else:
        pq_dim, book, pq_len = pq_centers.shape
    rot_dim = pq_dim * pq_len
    ip = metric == DistanceType.InnerProduct

    qidx, pair_slot = group_pairs(probe_ids, n_lists, M)
    qrot = (queries_f32 @ rotation.T).astype(compute_dtype)  # [nq, rot_dim]
    qn = jnp.sum(queries_f32 * queries_f32, axis=1)

    pad_l = (-n_lists) % cluster_chunk
    qidx_p = jnp.pad(qidx, ((0, pad_l), (0, 0)), constant_values=-1)
    cl_ids = jnp.arange(n_lists + pad_l, dtype=jnp.int32)
    F = window // 128
    kk = min(bin_cap, 128) * F if bin_cap else min(k, window)
    sub_ids = jnp.arange(pq_dim, dtype=jnp.int32)

    def chunk_fn(args):
        qi, cl = args  # [C, M], [C]
        C = qi.shape[0]
        safe_c = jnp.minimum(cl, n_lists - 1)
        starts = lists.offsets[safe_c]
        words_w = ivf.window_gather(sorted_codes, starts, window)  # [C, W, words] u32
        ids_w = ivf.window_gather(lists.ids, starts, window)
        lab_w = ivf.window_gather(lists.labels, starts, window)
        codes_w = bitpack.unpack(words_w, pq_bits, pq_dim)  # [C, W, S] int32

        # reconstruct in rotated space: y = center_rot + codebook[s, code]
        if per_cluster:
            cb = pq_centers[safe_c]  # [C, book, pq_len] own codebook
            recon = jax.vmap(lambda b, ix: b[ix])(
                cb, codes_w.reshape(C, -1)
            ).reshape(C, window, pq_dim, pq_len)
        else:
            recon = pq_centers[sub_ids[None, None, :], codes_w, :]
        y = recon.reshape(C, window, rot_dim) + centers_rot[safe_c][:, None, :]
        yn = jnp.sum(y * y, axis=2)  # [C, W]
        yc = y.astype(compute_dtype)

        safe_q = jnp.maximum(qi, 0)
        qs = qrot[safe_q]  # [C, M, rot_dim]
        dots = lax.dot_general(
            qs, yc, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=pairwise.matmul_precision(compute_dtype),
        )  # [C, M, W]

        if ip:
            order = -dots
        else:
            order = jnp.maximum(qn[safe_q][:, :, None] + yn[:, None, :] - 2.0 * dots, 0.0)

        valid = (lab_w == safe_c[:, None])[:, None, :]
        valid = jnp.logical_and(valid, (qi >= 0)[:, :, None])
        mask = filt.passes(prefilter, safe_q[:, :, None], ids_w[:, None, :])
        if mask is not None:
            valid = jnp.logical_and(valid, mask)
        order = jnp.where(valid, order, jnp.inf)

        if bin_cap:
            # per-128-bin masked-max rounds (ops/ivf_scan_pallas.py
            # semantics): fuses into the matmul consumer, so the
            # [C, M, W] order tensor never reaches HBM
            cap = min(bin_cap, 128)
            neg = (-order).reshape(C * M, F, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (C * M, F, 128), 2)
            fbase = jax.lax.broadcasted_iota(jnp.int32, (C * M, F), 1) * 128
            vs, is_ = [], []
            for r_i in range(cap):
                mv = jnp.max(neg, axis=2)
                am = jnp.argmax(neg, axis=2)
                pos = (fbase + am).reshape(C, M, F)
                vs.append(-mv)
                is_.append(jnp.take_along_axis(ids_w[:, None, :], pos, axis=2))
                if r_i + 1 < cap:
                    neg = jnp.where(lane == am[:, :, None], -jnp.inf, neg)
            tv = jnp.concatenate(vs, axis=1).reshape(C, M, kk)
            ti = jnp.concatenate([i.reshape(C * M, F) for i in is_],
                                 axis=1).reshape(C, M, kk)
            return tv, ti

        o2 = order.reshape(C * M, window)
        tv, tl = topk(o2, kk, True, recall_target)
        ti = jnp.take_along_axis(
            jnp.repeat(ids_w, M, axis=0).reshape(C * M, window), tl, axis=1
        )
        return tv.reshape(C, M, kk), ti.reshape(C, M, kk)

    tv, ti = lax.map(
        chunk_fn,
        (qidx_p.reshape(-1, cluster_chunk, M), cl_ids.reshape(-1, cluster_chunk)),
    )
    tv = tv.reshape(n_lists + pad_l, M, kk)[:n_lists]
    ti = ti.reshape(n_lists + pad_l, M, kk)[:n_lists]
    tv = jnp.pad(tv, ((0, 0), (0, 1), (0, 0)), constant_values=jnp.inf)
    ti = jnp.pad(ti, ((0, 0), (0, 1), (0, 0)))

    pv = tv[probe_ids, pair_slot]
    pi = ti[probe_ids, pair_slot]
    fv, fl = topk(pv.reshape(nq, p * kk), k, True, None)
    fi = jnp.take_along_axis(pi.reshape(nq, p * kk), fl, axis=1)
    if ip:
        fv = -fv
    fv = ivf.postprocess_distances(fv, metric)
    return fv, fi

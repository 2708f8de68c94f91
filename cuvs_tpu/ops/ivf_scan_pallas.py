"""Fused IVF cluster-major scan: one Pallas kernel per probed-window tile.

The reference fuses its IVF list scan with an in-register top-k
(/root/reference/cpp/src/neighbors/ivf_flat/ivf_flat_interleaved_scan_jit.cuh:423;
PQ analog ivf_pq/ivf_pq_compute_similarity_impl.cuh:35-78). The unfused
TPU cluster-major scan (neighbors/ivf_scan.py) materializes a [C, M, W]
order tensor to HBM and runs an exact top-k sort per (cluster, slot) row —
at 10M rows / 64 probes that is ~10 GB of HBM traffic plus 786k row sorts
per 4096-query batch, which is why the IVF tier lost to exact brute force.

This kernel keeps the whole scan on-chip per tile:

  grid = (n_tiles,) over the fixed-width pair tiles of group_pairs_tiled
  1. the tile's cluster window (rows + norms) is DMA'd HBM->VMEM by a
     PREFETCHED 128-aligned offset, double-buffered across grid steps so
     the next window streams while the current one is scored;
  2. the tile's M query rows are materialized from the VMEM-resident
     query block with a one-hot MXU matmul (scattered row gathers are
     row-rate bound on TPU — measured round 2; a [M, nq] one-hot times
     [nq, d] rides the systolic array instead);
  3. one [M, d] x [W, d]^T matmul (int8 path: int8 x int8 -> int32 on the
     MXU), L2/IP epilogue against exact f32 norms, validity mask from the
     prefetched [lo, lo+size) range;
  4. per-128-lane-bin minima (the approx_min_k bin semantics) reduced in
     VMEM: each tile writes only [M, F] bf16/f32 values + uint8 in-bin
     offsets (F = window/128) — ~40 KB instead of a 4 MB slice of the
     order tensor.

Bin capacity: IVF concentrates a query's true top-k inside its nearest
probed cluster, so a 1-deep bin reduction (the brute-force approx-kernel
semantics) loses every collision within that cluster's few bins. The
kernel therefore keeps the best ``cap`` rows PER BIN (cap extra
masked-max VPU rounds, cheap next to the matmul); callers size
``cap * window/128 >= ~2k`` so per-cluster candidate capacity clears k.
Residual loss = a query having > cap of its true top-k in one 128-row
bin of one cluster. refine() recovers the tail.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(
    # scalar prefetch
    al_ref,      # [n_tiles+1] int32 128-aligned window starts (row units)
    lo_ref,      # [n_tiles]   int32 first valid col within window
    sz_ref,      # [n_tiles]   int32 valid cols (list size), 0 = empty tile
    # inputs
    qidx_ref,    # [1, 1, M] int32 query id per slot (-1 empty)
    q_ref,       # [nq_pad, d] queries, compute dtype (VMEM resident)
    scale_ref,   # [1, 1] f32 dots scale (q_scale**2 for int8, else 1.0)
    data_hbm,    # [n_pad, dp] dataset rows (HBM)
    norms_hbm,   # [n_pad] f32 squared row norms (HBM)
    # outputs
    out_v_ref,   # [1, M, F] f32 bin-min order values
    out_i_ref,   # [1, M, F] uint8 in-bin offsets
    # scratch
    data_buf,    # [2, W, dp] VMEM
    norm_buf,    # [2, W] f32 VMEM
    sems,        # DMA semaphores [2, 2]
    *,
    W: int,
    inner: int,
    ip: bool,
    int8_mode: bool,
    nq_pad: int,
    cap: int,
):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    M = qidx_ref.shape[2]

    def window_dma(slot, tile):
        start = al_ref[tile]
        return (
            pltpu.make_async_copy(
                data_hbm.at[pl.ds(start, W), :], data_buf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                norms_hbm.at[pl.ds(start, W)], norm_buf.at[slot], sems.at[slot, 1]
            ),
        )

    @pl.when(t == 0)
    def _():
        for dma in window_dma(0, 0):
            dma.start()

    @pl.when(t + 1 < n_tiles)
    def _():
        for dma in window_dma((t + 1) % 2, t + 1):
            dma.start()

    # one-hot gather of the tile's query rows while the window streams in:
    # qtile[m, :] = queries[qidx[m], :] (empty slots -> zero rows, never
    # read downstream because the pair->(tile, slot) map skips them)
    qidx = qidx_ref[0, 0, :].reshape(M, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (M, nq_pad), 1)
    if int8_mode:
        onehot = (col == qidx).astype(jnp.int8)
        qtile = jnp.dot(onehot, q_ref[:], preferred_element_type=jnp.int32
                        ).astype(jnp.int8)
    else:
        onehot = (col == qidx).astype(q_ref.dtype)
        qtile = jnp.dot(onehot, q_ref[:], preferred_element_type=jnp.float32
                        ).astype(q_ref.dtype)

    slot = t % 2
    for dma in window_dma(slot, t):
        dma.wait()

    lo = lo_ref[t]
    hi = lo + sz_ref[t]
    scale = scale_ref[0, 0]

    # score the window in `inner`-wide chunks so the f32 distance block
    # stays bounded regardless of window size
    for j in range(W // inner):
        data = data_buf[slot, j * inner : (j + 1) * inner, :]
        if int8_mode:
            dots = jnp.dot(qtile, data.T, preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * scale
        else:
            dots = jnp.dot(qtile, data.T, preferred_element_type=jnp.float32
                           ) * scale
        if ip:
            order = -dots  # min-space
        else:
            # ranking omits the per-query norm (constant per row across
            # the whole search): order = ||y||^2 - 2 q.y
            nrm = norm_buf[slot, j * inner : (j + 1) * inner].reshape(1, inner)
            order = nrm - 2.0 * dots
        cix = jax.lax.broadcasted_iota(jnp.int32, (M, inner), 1) + j * inner
        order = jnp.where((cix >= lo) & (cix < hi), order, jnp.inf)

        fj = inner // 128
        F_tot = W // 128
        blocks = (-order).reshape(M, fj, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (M, fj, 128), 2)
        for r in range(cap):
            m = jnp.max(blocks, axis=2)
            am = jnp.argmax(blocks, axis=2)
            c0 = r * F_tot + j * fj
            out_v_ref[0, :, c0 : c0 + fj] = (-m).astype(out_v_ref.dtype)
            out_i_ref[0, :, c0 : c0 + fj] = am.astype(jnp.uint8)
            if r + 1 < cap:
                blocks = jnp.where(lane == am[:, :, None], -jnp.inf, blocks)


@functools.partial(
    jax.jit,
    static_argnames=("W", "m_tile", "inner", "ip", "int8_mode", "cap",
                     "interpret"),
)
def fused_ivf_scan(
    sorted_data,   # [n_pad, dp] rows grouped by list (int8/bf16/f32)
    sorted_norms,  # [n_pad] f32 squared norms of the ORIGINAL rows
    queries,       # [nq, d] compute dtype (int8 pre-quantized / bf16 / f32)
    qidx,          # [n_tiles, M] int32 query per slot (-1 empty)
    starts_al,     # [n_tiles] int32 128-aligned window starts
    lo,            # [n_tiles] int32 first valid col in window
    sizes,         # [n_tiles] int32 list size (0 = empty tile)
    scale2,        # [] f32 dots scale (q_scale**2 for int8 data, else 1.0)
    W: int,
    m_tile: int,
    inner: int,
    ip: bool,
    int8_mode: bool,
    cap: int = 2,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused scan. Returns (order values [n_tiles, M, cap*F] f32,
    in-bin offsets [n_tiles, M, cap*F] uint8); F = W // 128; column
    r*F + b holds the (r+1)-th best row of bin b. Order values are
    ranking-space only (L2: ||y||^2 - 2 q.y; IP: -q.y, both times scale)."""
    n_tiles, M = qidx.shape
    nq, d = queries.shape
    dp = sorted_data.shape[1]
    F = cap * (W // 128)
    # query block must tile the MXU contraction: pad rows to sublane align
    align = 32 if int8_mode else 8
    nq_pad = -(-nq // align) * align
    qp = jnp.pad(queries, ((0, nq_pad - nq), (0, dp - d)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda t, al, lo_, sz: (t, 0, 0)),
            pl.BlockSpec((nq_pad, dp), lambda t, al, lo_, sz: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t, al, lo_, sz: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, M, F), lambda t, al, lo_, sz: (t, 0, 0)),
            pl.BlockSpec((1, M, F), lambda t, al, lo_, sz: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, W, dp), sorted_data.dtype),
            pltpu.VMEM((2, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _scan_kernel, W=W, inner=inner, ip=ip, int8_mode=int8_mode,
        nq_pad=nq_pad, cap=cap,
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, M, F), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, M, F), jnp.uint8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.append(jnp.asarray(starts_al, jnp.int32), 0),
        jnp.asarray(lo, jnp.int32),
        jnp.asarray(sizes, jnp.int32),
        qidx[:, None, :],
        qp,
        jnp.asarray(scale2, jnp.float32).reshape(1, 1),
        sorted_data,
        sorted_norms,
    )
    return out_v, out_i

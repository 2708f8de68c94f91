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
     PREFETCHED aligned offset, double-buffered across grid steps so the
     next window streams while the current one is scored. Data rows are
     sliced at 128-row alignment (int8/bf16/f32 sublane tilings all
     divide 128); norms are a [n/128, 128] 2-D layout sliced at 1024-row
     alignment (Mosaic's f32 tile is (8, 128) — a flat 1-D f32 array
     only slices at 1024-element granularity, measured on-device);
  2. the tile's M query rows are materialized from the VMEM-resident
     query block with a one-hot MXU matmul (scattered row gathers are
     row-rate bound on TPU — measured round 2; a [M, nq] one-hot times
     [nq, d] rides the systolic array instead);
  3. one [M, d] x [W, d]^T matmul (int8 path: int8 x int8 -> int32 on the
     MXU), L2/IP epilogue against exact f32 norms, validity mask from the
     prefetched [lo, lo+size) range;
  4. per-128-lane-bin minima (the approx_min_k bin semantics) reduced in
     VMEM: each tile writes only [M, cap*F] values + uint8 in-bin
     offsets (F = window/128) — KBs instead of a 4 MB slice of the
     order tensor.

Bin capacity: IVF concentrates a query's true top-k inside its nearest
probed cluster, so a 1-deep bin reduction (the brute-force approx-kernel
semantics) loses every collision within that cluster's few bins. The
kernel therefore keeps the best ``cap`` rows PER BIN (cap extra
masked-max VPU rounds, cheap next to the matmul); callers size
``cap * list_size/128 >= ~2k`` so per-cluster candidate capacity clears
k (cap >= k makes the per-window selection exact). Residual loss = a
query having > cap of its true top-k in ONE 128-row bin of one cluster.
refine() recovers the tail.
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
    norms_hbm,   # [n_norm/128, 128] f32 squared row norms (HBM)
    # outputs
    out_v_ref,   # [1, M, cap*F] f32 bin-min order values
    out_i_ref,   # [1, M, cap*F] uint8 in-bin offsets
    # scratch
    data_buf,    # [2, W, dp] VMEM
    norm_buf,    # [2, Wn/128, 128] f32 VMEM
    sems,        # DMA semaphores [2, 2]
    *,
    W: int,
    Wn: int,
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
        # the wrapper 128-aligns every window start; the hint lets Mosaic
        # prove the slice offset divides the sublane tiling (16 for
        # packed bf16, 32 for int8) for the runtime value
        start = pl.multiple_of(al_ref[tile], 128)
        dmas = [
            pltpu.make_async_copy(
                data_hbm.at[pl.ds(start, W), :], data_buf.at[slot],
                sems.at[slot, 0],
            )
        ]
        if not ip:  # IP ranking needs no norms
            nrow = pl.multiple_of((start // 1024) * 8, 8)  # 1024-aligned
            dmas.append(
                pltpu.make_async_copy(
                    norms_hbm.at[pl.ds(nrow, Wn // 128), :],
                    norm_buf.at[slot], sems.at[slot, 1],
                )
            )
        return dmas

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
    # norm rows sit (al % 1024)/128 rows past the norm window start
    nshift = (al_ref[t] // 128) % 8
    blocks = W // 128

    # per-tile poisoned penalty [blocks, 128]: 0.5*||y||^2/scale on valid
    # window positions (global col in [lo, hi)), +inf outside — the
    # validity mask rides the one score subtract instead of a per-chunk
    # iota/where pass (the array is tiny: W/128 x 128)
    cix = (jax.lax.broadcasted_iota(jnp.int32, (blocks, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (blocks, 128), 1))
    valid = (cix >= lo) & (cix < hi)
    if ip:
        pen = jnp.where(valid, 0.0, jnp.inf)
    else:
        nrm = norm_buf[slot, pl.ds(nshift, blocks), :]
        pen = jnp.where(valid, nrm * (0.5 / scale), jnp.inf)

    # running top-`cap` per STRIDED lane bin: bin l collects window
    # columns {l, l+128, ...} (in-bin id = 128-slice index, <= 255).
    # The insertion chain is pure elementwise vreg ops on [M, 128]
    # slices — no cross-lane max/argmax shuffles, no [M, C, 128]
    # reshape relayouts (measured 1.7-3x on the brute-force analog).
    NEG = jnp.float32(-jnp.inf)
    best = [jnp.full((M, 128), NEG, jnp.float32) for _ in range(cap)]
    bidx = [jnp.zeros((M, 128), jnp.int32) for _ in range(cap)]
    for j in range(W // inner):
        data = data_buf[slot, j * inner : (j + 1) * inner, :]
        if int8_mode:
            dots = jnp.dot(qtile, data.T, preferred_element_type=jnp.int32
                           ).astype(jnp.float32)
        else:
            dots = jnp.dot(qtile, data.T, preferred_element_type=jnp.float32)
        fj = inner // 128
        for c in range(fj):
            cc = j * fj + c
            v_in = dots[:, c * 128 : (c + 1) * 128] - pen[cc : cc + 1, :]
            i_in = jnp.int32(cc)
            for r in range(cap):
                tk = v_in > best[r]
                if r + 1 < cap:
                    best[r], v_in = (jnp.where(tk, v_in, best[r]),
                                     jnp.where(tk, best[r], v_in))
                    bidx[r], i_in = (jnp.where(tk, i_in, bidx[r]),
                                     jnp.where(tk, bidx[r], i_in))
                else:  # last level: the displaced value is dropped
                    best[r] = jnp.where(tk, v_in, best[r])
                    bidx[r] = jnp.where(tk, i_in, bidx[r])

    # order values at true scale, min-space: L2 = ||y||^2 - 2 q.y*scale
    # = -2*scale*neg; IP = -q.y*scale = -scale*neg. Invalid -> +inf.
    f = (-scale) if ip else (-2.0 * scale)
    for r in range(cap):
        out_v_ref[0, :, r * 128 : (r + 1) * 128] = f * best[r]
        out_i_ref[0, :, r * 128 : (r + 1) * 128] = bidx[r].astype(jnp.uint8)


def _pq_scan_kernel(
    # scalar prefetch
    al_ref,      # [n_tiles+1] int32 128-aligned window starts (row units)
    lo_ref,      # [n_tiles]   int32 first valid col within window
    sz_ref,      # [n_tiles]   int32 valid cols (list size), 0 = empty tile
    # inputs
    qidx_ref,    # [1, 1, M] int32 query id per slot (-1 empty)
    q_ref,       # [nq_pad, dp] ROTATED queries, compute dtype (VMEM)
    ctile_ref,   # [1, 1, dp] rotated center of this tile's cluster
    cb_ref,      # [dp, S*book] transposed block-diagonal decode matrix
    codes_hbm,   # [Sw, n_pad] uint32 bit-packed codes (bits each)
    *rest,       # mode "pq":     norms_hbm, outs, codes_buf, norm_buf, sems
                 # mode "rabitq": fa_hbm, fr_hbm, outs, codes_buf, fa_buf,
                 #                fr_buf, sems
    W: int,
    Wn: int,
    inner: int,
    ip: bool,
    nq_pad: int,
    cap: int,
    S: int,
    book: int,
    bits: int,
    mode: str,
    use_pen: bool = False,
    int8_mode: bool = False,
):
    """Quantized-code analog of ``_scan_kernel`` (the reference's fused
    LUT scans: ivf_pq_compute_similarity_impl.cuh:35-78, RaBitQ
    bitwise_emit_distances_kernel.cu.in:85-108). Instead of an ADC
    gather per (query, row, subspace) — gathers are row-rate bound on
    TPU — the kernel is the reference's LUT scan mapped to the MXU:
    once per tile it builds the ADC lookup table for every query in the
    tile with one matmul, lut = q'tile @ cb  [M, S*book] (cb is the
    transposed block-diagonal decode matrix, so lut[m, s*book+c] =
    <q'_m restricted to subspace s, codebook[s, c]>), then each code
    chunk is scored with a single MXU matmul lut @ onehot, where the
    transposed one-hot [S*book, inner] is built by per-subspace static
    bit-extract + sublane-iota compare (no relayouts). This is ~2x less
    MXU work per scanned row than decode-then-score (an M-tall pass
    instead of dp-tall + M-tall) and M >= 128 fills the systolic array.
    Codes travel as [Sw, n_pad] packed words (exact bit-packed memory
    parity) so the window DMA is Sw contiguous W*4-byte lines.

    ``int8_mode`` quantizes the LUT to int8 IN-KERNEL with one dynamic
    per-tile scale (the LUT's dynamic range is tiny — centered-query
    times residual-codeword partials), running the scoring matmul at
    the doubled int8 MXU rate; the int32 one-hot accumulate is exact,
    so the only error is the 8-bit LUT rounding the reference also
    offers (search_params::lut_dtype = CUDA_R_8U, ivf_pq.hpp:339).

    Epilogues: mode "pq" scores q'.y - 0.5||y||^2 against decoded
    residual norms (order out = ||y||^2 - 2 q'.y); mode "rabitq" scores
    the unbiased estimator's window part -(fa + fr * <q_rot, xu>) with
    two per-row factor arrays (order out = fa + fr*dots; the centering
    constant k_b rides the decode matrix as xu = level + k_b)."""
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    M = qidx_ref.shape[2]
    rabitq = mode == "rabitq"
    if rabitq:
        (fa_hbm, fr_hbm, out_v_ref, out_i_ref, codes_buf, fa_buf, fr_buf,
         sems) = rest
    else:
        norms_hbm, out_v_ref, out_i_ref, codes_buf, norm_buf, sems = rest
    Sw = codes_buf.shape[1]

    def window_dma(slot, tile):
        start = pl.multiple_of(al_ref[tile], 128)
        dmas = [
            pltpu.make_async_copy(
                codes_hbm.at[:, pl.ds(start, W)], codes_buf.at[slot],
                sems.at[slot, 0],
            )
        ]
        nrow = pl.multiple_of((start // 1024) * 8, 8)
        if rabitq:
            dmas.append(pltpu.make_async_copy(
                fa_hbm.at[pl.ds(nrow, Wn // 128), :], fa_buf.at[slot],
                sems.at[slot, 1]))
            dmas.append(pltpu.make_async_copy(
                fr_hbm.at[pl.ds(nrow, Wn // 128), :], fr_buf.at[slot],
                sems.at[slot, 2]))
        elif not ip or use_pen:  # PQ-IP ranking needs no norms unless a
            # filter penalty rides the norm channel (use_pen)
            dmas.append(pltpu.make_async_copy(
                norms_hbm.at[pl.ds(nrow, Wn // 128), :], norm_buf.at[slot],
                sems.at[slot, 1]))
        return dmas

    @pl.when(t == 0)
    def _():
        for dma in window_dma(0, 0):
            dma.start()

    @pl.when(t + 1 < n_tiles)
    def _():
        for dma in window_dma((t + 1) % 2, t + 1):
            dma.start()

    # one-hot gather of the tile's query rows (see _scan_kernel); PQ-L2
    # shifts to the cluster frame: q' = R q - center_rot, so the kernel
    # scores ||y||^2 - 2 q'.y and the caller adds ||q'||^2. RaBitQ keeps
    # raw R q (its cluster term g_add is applied by the caller).
    qidx = qidx_ref[0, 0, :].reshape(M, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (M, nq_pad), 1)
    onehot = (col == qidx).astype(q_ref.dtype)
    qtile = jnp.dot(onehot, q_ref[:], preferred_element_type=jnp.float32
                    ).astype(q_ref.dtype)
    if not ip and not rabitq:
        qtile = qtile - ctile_ref[0]

    # per-tile ADC LUT (see docstring): one [M, dp] x [dp, S*book]
    # matmul amortized over the whole window
    lut = jnp.dot(qtile, cb_ref[:], preferred_element_type=jnp.float32)
    if int8_mode:
        # dynamic per-tile scale; |lut/ls| <= 127 by construction so the
        # round needs no clip, and the int8 cast of +/-127.0 is exact
        ls = jnp.maximum(jnp.max(jnp.abs(lut)), 1e-30) / 127.0
        lut_q = jnp.round(lut / ls).astype(jnp.int8)
    else:
        ls = jnp.float32(1.0)
        lut_q = lut.astype(q_ref.dtype)

    slot = t % 2
    for dma in window_dma(slot, t):
        dma.wait()

    lo = lo_ref[t]
    hi = lo + sz_ref[t]
    nshift = (al_ref[t] // 128) % 8
    blocks = W // 128

    cix = (jax.lax.broadcasted_iota(jnp.int32, (blocks, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (blocks, 128), 1))
    valid = (cix >= lo) & (cix < hi)
    if rabitq:
        # fa poisoned to +inf off-window makes v = -(fa + fr*dots) = -inf
        fa_pen = jnp.where(valid, fa_buf[slot, pl.ds(nshift, blocks), :],
                           jnp.inf)
        fr_blk = fr_buf[slot, pl.ds(nshift, blocks), :]
    elif ip:
        if use_pen:  # norm channel carries a 0/+inf filter penalty
            nrm = norm_buf[slot, pl.ds(nshift, blocks), :]
            pen = jnp.where(valid, nrm, jnp.inf)
        else:
            pen = jnp.where(valid, 0.0, jnp.inf)
    else:
        nrm = norm_buf[slot, pl.ds(nshift, blocks), :]
        pen = jnp.where(valid, nrm * 0.5, jnp.inf)

    NEG = jnp.float32(-jnp.inf)
    best = [jnp.full((M, 128), NEG, jnp.float32) for _ in range(cap)]
    bidx = [jnp.zeros((M, 128), jnp.int32) for _ in range(cap)]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (book, inner), 0)
    mask_v = (1 << bits) - 1
    for j in range(W // inner):
        # ---- score this chunk in VMEM: LUT @ one-hot^T, one matmul ----
        oh_rows = []
        for s in range(S):
            lo_bit = s * bits
            w0, sh = lo_bit // 32, lo_bit % 32
            word = codes_buf[slot, w0 : w0 + 1,
                             j * inner : (j + 1) * inner]  # [1, inner] u32
            v = jax.lax.shift_right_logical(word, jnp.uint32(sh))
            if sh + bits > 32 and w0 + 1 < Sw:  # code straddles words
                v = v | (codes_buf[slot, w0 + 1 : w0 + 2,
                                   j * inner : (j + 1) * inner]
                         << jnp.uint32(32 - sh))
            code = v.astype(jnp.int32) & mask_v
            oh_rows.append((sub_iota == code).astype(lut_q.dtype))
        oh = jnp.concatenate(oh_rows, axis=0)  # [S*book, inner]
        if int8_mode:
            # one-hot column sums select S int8 LUT entries per row: the
            # int32 accumulate is exact; ls restores the true scale
            dots = jnp.dot(lut_q, oh, preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * ls
        else:
            dots = jnp.dot(lut_q, oh, preferred_element_type=jnp.float32)
        fj = inner // 128
        for c in range(fj):
            cc = j * fj + c
            dblk = dots[:, c * 128 : (c + 1) * 128]
            if rabitq:
                v_in = -(fa_pen[cc : cc + 1, :]
                         + fr_blk[cc : cc + 1, :] * dblk)
            else:
                v_in = dblk - pen[cc : cc + 1, :]
            i_in = jnp.int32(cc)
            for r in range(cap):
                tk = v_in > best[r]
                if r + 1 < cap:
                    best[r], v_in = (jnp.where(tk, v_in, best[r]),
                                     jnp.where(tk, best[r], v_in))
                    bidx[r], i_in = (jnp.where(tk, i_in, bidx[r]),
                                     jnp.where(tk, bidx[r], i_in))
                else:
                    best[r] = jnp.where(tk, v_in, best[r])
                    bidx[r] = jnp.where(tk, i_in, bidx[r])

    # order values, min-space. PQ: L2 = ||y||^2 - 2 q'.y = -2*neg (caller
    # adds ||q'||^2 per probe); IP = -q.y (caller adds -q.center).
    # RaBitQ: fa + fr*dots (caller adds g_add / -q.center).
    f = -1.0 if (ip or rabitq) else -2.0
    for r in range(cap):
        out_v_ref[0, :, r * 128 : (r + 1) * 128] = f * best[r]
        out_i_ref[0, :, r * 128 : (r + 1) * 128] = bidx[r].astype(jnp.uint8)


def _norm_layout(arr, n_pad: int, Wn: int):
    """Pad a per-row f32 array for the 1024-aligned norm DMA and reshape
    to the [n/128, 128] 2-D window layout."""
    need = (n_pad // 1024 + 1) * 1024 + Wn
    if arr.shape[0] < need:
        arr = jnp.pad(arr, (0, need - arr.shape[0]))
    return arr[: (arr.shape[0] // 128) * 128].reshape(-1, 128)


@functools.partial(
    jax.jit,
    static_argnames=("W", "m_tile", "inner", "ip", "cap", "book", "bits",
                     "mode", "use_pen", "int8_mode", "interpret"),
)
def fused_pq_scan(
    codes_t,       # [Sw, n_pad] uint32 bit-packed codes, list-sorted
    sorted_norms,  # [n] f32: "pq" decoded-residual sq norms; "rabitq" fa
    queries_rot,   # [nq, dp] rotated queries, compute dtype, dp % 128 == 0
    cb_t,          # [dp, S*book] transposed block-diagonal decode matrix
    centers_tile,  # [n_tiles, dp] rotated center rows per tile
    qidx,          # [n_tiles, M] int32 query per slot (-1 empty)
    starts_al,     # [n_tiles] int32 128-aligned window starts
    lo,            # [n_tiles] int32 first valid col in window
    sizes,         # [n_tiles] int32 list size (0 = empty tile)
    W: int,
    m_tile: int,
    inner: int,
    ip: bool,
    cap: int = 2,
    book: int = 256,
    bits: int = 8,
    mode: str = "pq",
    sorted_fr=None,  # [n] f32 rabitq f_rescale (effective), else None
    use_pen: bool = False,  # IP mode: norm channel carries a filter penalty
    int8_mode: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused quantized-code scan. Same output contract as
    ``fused_ivf_scan``: order values are the per-window ranking part
    (pq: ||y||^2 - 2 q'.y / -q.y; rabitq: fa + fr*<q_rot, xu>); the
    caller adds the per-(query, probe) cluster term before the
    cross-probe top-k. ``int8_mode`` quantizes the in-kernel ADC LUT
    to int8 with a dynamic per-tile scale (see _pq_scan_kernel)."""
    n_tiles, M = qidx.shape
    nq, dp = queries_rot.shape
    # the window DMA slices dim 0 of the word matrix: Mosaic needs that
    # slice 8-aligned. Build paths pre-pad; this guard is a no-op there
    # and a correctness fallback for direct callers.
    Sw = codes_t.shape[0]
    if Sw % 8:
        codes_t = jnp.pad(codes_t, ((0, -(-Sw // 8) * 8 - Sw), (0, 0)))
        Sw = codes_t.shape[0]
    S = cb_t.shape[1] // book
    F = cap * 128
    Wn = -(-(W + 896) // 1024) * 1024
    n_pad = codes_t.shape[1]
    rabitq = mode == "rabitq"
    nq_pad = -(-nq // 8) * 8
    qp = jnp.pad(queries_rot, ((0, nq_pad - nq), (0, 0)))

    factor_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (2 if rabitq else 1)
    factor_bufs = (
        [pltpu.VMEM((2, Wn // 128, 128), jnp.float32)] * 2
        if rabitq else [pltpu.VMEM((2, Wn // 128, 128), jnp.float32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda t, al, lo_, sz: (t, 0, 0)),
            pl.BlockSpec((nq_pad, dp), lambda t, al, lo_, sz: (0, 0),
                         memory_space=pltpu.VMEM),
            # [n_tiles, 1, dp] with a (1, 1, dp) block: Mosaic requires the
            # last-two block dims to divide (8, 128) or equal the array
            # dims, so the per-tile row rides a leading singleton dim
            pl.BlockSpec((1, 1, dp), lambda t, al, lo_, sz: (t, 0, 0)),
            pl.BlockSpec((dp, S * book), lambda t, al, lo_, sz: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + factor_specs,
        out_specs=[
            pl.BlockSpec((1, M, F), lambda t, al, lo_, sz: (t, 0, 0)),
            pl.BlockSpec((1, M, F), lambda t, al, lo_, sz: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Sw, W), jnp.uint32),
        ] + factor_bufs + [
            pltpu.SemaphoreType.DMA((2, 3 if rabitq else 2)),
        ],
    )
    kernel = functools.partial(
        _pq_scan_kernel, W=W, Wn=Wn, inner=inner, ip=ip, nq_pad=nq_pad,
        cap=cap, S=S, book=book, bits=bits, mode=mode, use_pen=use_pen,
        int8_mode=int8_mode,
    )
    operands = [
        jnp.append(jnp.asarray(starts_al, jnp.int32), 0),
        jnp.asarray(lo, jnp.int32),
        jnp.asarray(sizes, jnp.int32),
        qidx[:, None, :],
        qp,
        centers_tile[:, None, :],
        cb_t,
        codes_t,
        _norm_layout(sorted_norms, n_pad, Wn),
    ]
    if rabitq:
        operands.append(_norm_layout(sorted_fr, n_pad, Wn))
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
    )(*operands)
    return out_v, out_i


@functools.partial(
    jax.jit,
    static_argnames=("W", "m_tile", "inner", "ip", "int8_mode", "cap",
                     "interpret"),
)
def fused_ivf_scan(
    sorted_data,   # [n_pad, dp] rows grouped by list (int8/bf16/f32)
    sorted_norms,  # [n_norm] f32 squared norms of the ORIGINAL rows
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
    """Run the fused scan. Returns (order values [n_tiles, M, cap*128]
    f32, in-bin 128-slice ids [n_tiles, M, cap*128] uint8). Bins are
    STRIDED: lane bin l collects window columns {l, l+128, ...}; output
    column r*128 + l holds the (r+1)-th best row of bin l; its window
    position = slice_id*128 + l. Order values are ranking-space
    (L2: ||y||^2 - 2 q.y; IP: -q.y, both at true scale)."""
    n_tiles, M = qidx.shape
    nq, d = queries.shape
    dp = sorted_data.shape[1]
    F = cap * 128
    # norm window: covers the <=896-row shift between the data window's
    # 128-aligned start and the norm DMA's 1024-aligned start
    Wn = -(-(W + 896) // 1024) * 1024
    # the norm array must reach any 1024-aligned start + Wn and reshape
    # to [*, 128]; build paths pre-pad (ivf_flat._pack) — this pad is a
    # no-op there and a correctness fallback elsewhere
    need = (sorted_data.shape[0] // 1024 + 1) * 1024 + Wn
    if sorted_norms.shape[0] < need:
        sorted_norms = jnp.pad(sorted_norms,
                               (0, need - sorted_norms.shape[0]))
    norms2 = sorted_norms[: (sorted_norms.shape[0] // 128) * 128].reshape(-1, 128)
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
            pltpu.VMEM((2, Wn // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _scan_kernel, W=W, Wn=Wn, inner=inner, ip=ip, int8_mode=int8_mode,
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
        norms2,
    )
    return out_v, out_i

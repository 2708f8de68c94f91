"""IVF-RaBitQ: inverted file over 1-9 bit RaBitQ codes with the unbiased
inner-product estimator.

Reference: ``cuvs::neighbors::ivf_rabitq``
(/root/reference/cpp/include/cuvs/neighbors/ivf_rabitq.hpp — n_lists=1024,
bits_per_dim in [1..9]; GPU sub-library
cpp/src/neighbors/ivf_rabitq/gpu_index/: codes+factors
quantizer_gpu.cu:220-470, scaling-factor calibration :808-905, query
factors ivf_gpu.cu:983-1020, distance estimator
jit_lto_kernels/bitwise_emit_distances_kernel.cu.in:85-108).

RaBitQ (SIGMOD'24) math, as implemented by the reference:
  * residual r = x - c is randomly rotated; each dim stores a level
    ``l ∈ [0, 2^bits)`` whose centred value ``xu = l - (2^bits-1)/2``
    approximates the direction of r (1-bit: xu = ±0.5 sign grid; ex-bits
    add magnitude levels of the unit residual, sign-folded).
  * per-vector factors make the dot estimator unbiased:
      f_add     = ||r||² + 2||r||²·<c_rot, xu>/<r, xu>
      f_rescale = -2||r||²/<r, xu>
    and the L2 estimate is
      est = f_add + ||q-c||² + f_rescale·(<q_rot, l> + k_b·Σq_rot)
    with k_b = -(2^bits-1)/2 (so the paren equals <q_rot, xu>).
  * the magnitude scaling factor is calibrated once per (dim, bits) by
    maximizing E[<xu, r̄>/||xu||] over random unit vectors.

TPU-native design: codes are bit-packed into uint32 words
(core/bitpack.py — byte parity with the reference layout) and the scan
unpacks in-register (static shifts) straight into one MXU matmul
``q_rot @ l^T`` per probed window; the estimator is a 2-FMA epilogue.
The reference's QUANT4/QUANT8/LUT16/LUT32 query-quantization modes are a
GPU register-pressure workaround — on TPU the bf16 MXU path subsumes them
(``compute_dtype`` knob).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cuvs_tpu.cluster import kmeans_balanced
from cuvs_tpu.core import bitpack
from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric
from cuvs_tpu.neighbors import filters as filt
from cuvs_tpu.neighbors import ivf_common as ivf
from cuvs_tpu.neighbors.ivf_pq import _make_rotation
from cuvs_tpu.selection.select_k import topk


@dataclasses.dataclass(frozen=True)
class IndexParams:
    """Mirrors ivf_rabitq::index_params (ivf_rabitq.hpp:38-85)."""

    n_lists: int = 1024
    bits_per_dim: int = 3
    metric: DistanceType = DistanceType.L2Expanded
    kmeans_n_iters: int = 20
    max_train_points_per_cluster: int = 256
    seed: int = 0

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))
        if not (1 <= self.bits_per_dim <= 9):
            raise ValueError("bits_per_dim must be in [1, 9]")


@dataclasses.dataclass(frozen=True)
class SearchParams:
    """Mirrors ivf_rabitq::search_params (ivf_rabitq.hpp:95-107). The
    reference search_mode enum maps to compute_dtype here (see module doc)."""

    n_probes: int = 20
    compute_dtype: object = jnp.bfloat16
    recall_target: object = None
    scan_algo: str = "auto"  # see ivf_flat.SearchParams.scan_algo


@flax.struct.dataclass
class Index:
    centers: jnp.ndarray  # [n_lists, d]
    center_norms: jnp.ndarray
    rotation: jnp.ndarray  # [d, d] random orthogonal
    centers_rot: jnp.ndarray  # [n_lists, d] rotated centers
    sorted_codes: jnp.ndarray  # [n + W, ceil(d*bits/32)] uint32 packed levels
    sorted_fadd: jnp.ndarray  # [n + W] estimator f_add
    sorted_frescale: jnp.ndarray  # [n + W] estimator f_rescale
    lists: ivf.SortedLists
    metric: DistanceType = flax.struct.field(pytree_node=False, default=DistanceType.L2Expanded)
    window: int = flax.struct.field(pytree_node=False, default=128)
    n_rows: int = flax.struct.field(pytree_node=False, default=0)
    bits_per_dim: int = flax.struct.field(pytree_node=False, default=3)
    # fused-scan serving layout: the SAME bit-packed words transposed to
    # [ceil(d*bits/32), n + W] for contiguous per-word-row window DMA
    # (ops/ivf_scan_pallas.py::fused_pq_scan mode="rabitq")
    sorted_codes_t: Optional[jnp.ndarray] = None

    @property
    def n_lists(self):
        return self.centers.shape[0]

    @property
    def dim(self):
        return self.centers.shape[1]

    @property
    def size(self):
        return self.n_rows


@functools.lru_cache(maxsize=None)
def best_scaling_factor(dim: int, ex_bits: int, n_samples: int = 100, seed: int = 7) -> float:
    """Calibrate the magnitude scaling factor for ex-bit codes.

    Mirrors quantizer_gpu.cu:808-905 (best_rescale_factor averaged over
    random unit vectors): pick t maximizing E[<xu,r̄>/||xu||], the cosine
    between the quantized grid point and the true unit residual. A dense
    grid over [t_start, t_end] replaces the reference's exact breakpoint
    walk — the objective is flat near its peak, so ~512 samples suffice.
    """
    if ex_bits <= 0:
        return 0.0
    rng = np.random.default_rng(seed)
    o = np.abs(rng.standard_normal((n_samples, dim)))
    o /= np.linalg.norm(o, axis=1, keepdims=True)
    max_o = o.max(axis=1)  # [S]
    t_end = ((1 << ex_bits) - 1 + 10) / max_o
    t_start = 0.1 * t_end
    ts = t_start[:, None] + (t_end - t_start)[:, None] * (
        np.arange(512) / 511.0
    )[None, :]  # [S, T]
    code = np.minimum(
        np.floor(ts[:, :, None] * o[:, None, :] + 1e-5), (1 << ex_bits) - 1
    )  # [S, T, dim]
    num = ((code + 0.5) * o[:, None, :]).sum(axis=2)
    den = np.sqrt(dim * 0.25 + (code * code + code).sum(axis=2))
    ip = num / den  # [S, T]
    best_t = ts[np.arange(n_samples), ip.argmax(axis=1)]
    return float(best_t.mean())


def _encode_levels(res: jnp.ndarray, bits: int, scale: float):
    """Rotated residuals -> levels l in [0, 2^bits) (sign-folded magnitude
    grid, quantizer_gpu.cu:360-375) and the centred values xu."""
    ex = bits - 1
    sign = res >= 0
    if ex == 0:
        l = sign.astype(jnp.int32)
    else:
        rnorm = jnp.sqrt(jnp.maximum(jnp.sum(res * res, axis=1, keepdims=True), 1e-30))
        mag = jnp.minimum(
            jnp.floor(scale * jnp.abs(res) / rnorm + 1e-5).astype(jnp.int32),
            (1 << ex) - 1,
        )
        l = jnp.where(sign, (1 << ex) + mag, (1 << ex) - 1 - mag)
    xu = l.astype(jnp.float32) - ((1 << bits) - 1) / 2.0
    return l, xu


def build(dataset, params: Optional[IndexParams] = None, **kw) -> Index:
    if params is None:
        params = IndexParams(**kw)
    xf = jnp.asarray(dataset, jnp.float32)
    n, d = xf.shape
    n_lists = min(params.n_lists, n)
    key = jax.random.PRNGKey(params.seed)

    centers = kmeans_balanced.fit(
        xf, n_lists,
        kmeans_balanced.BalancedParams(
            n_clusters=n_lists, n_iters=params.kmeans_n_iters, seed=params.seed,
        ),
    )
    labels = kmeans_balanced.predict(xf, centers)
    rotation = _make_rotation(key, d, d, True)  # RaBitQ always rotates
    centers_rot = centers @ rotation.T
    res = (xf - centers[labels]) @ rotation.T

    scale = best_scaling_factor(d, params.bits_per_dim - 1)
    l, xu = _encode_levels(res, params.bits_per_dim, scale)

    # per-vector estimator factors (quantizer_gpu.cu:272-292 / :410-425)
    l2_sqr = jnp.sum(res * res, axis=1)
    denom = jnp.sum(res * xu, axis=1)
    denom = jnp.where(denom == 0.0, jnp.inf, denom)
    ip_cent = jnp.sum(centers_rot[labels] * xu, axis=1)
    fadd = l2_sqr + 2.0 * l2_sqr * ip_cent / denom
    frescale = -2.0 * l2_sqr / denom

    codes = bitpack.pack(l, params.bits_per_dim)

    window = ivf.round_window(int(jnp.max(jnp.zeros((n_lists,), jnp.int32).at[labels].add(1))))
    order, lists = ivf.sort_by_label(labels, n_lists, pad=window)
    pad1 = lambda a, v=0: jnp.pad(a, [(0, window)] + [(0, 0)] * (a.ndim - 1), constant_values=v)
    sorted_codes = pad1(codes[order]).astype(jnp.uint32)
    # fused path covers bits <= 8 (book = 2^bits one-hot rows per dim).
    # Word rows pad to a sublane multiple of 8 for the kernel's dim-0
    # window DMA (e.g. dim 96 @ 1 bit -> 3 words would fail to lower).
    if params.bits_per_dim <= 8:
        ct = sorted_codes.T
        codes_t = jnp.pad(ct, ((0, -(-ct.shape[0] // 8) * 8 - ct.shape[0]),
                               (0, 0)))
    else:
        codes_t = None
    return Index(
        centers=centers,
        center_norms=pairwise.row_norms(centers),
        rotation=rotation,
        centers_rot=centers_rot,
        sorted_codes=sorted_codes,
        sorted_codes_t=codes_t,
        sorted_fadd=pad1(fadd[order]),
        sorted_frescale=pad1(frescale[order]),
        lists=lists,
        metric=params.metric,
        window=window,
        n_rows=int(n),
        bits_per_dim=params.bits_per_dim,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_probes", "metric", "window", "compute_dtype",
                     "recall_target", "bits"),
)
def _search_impl(
    centers, center_norms, rotation, centers_rot, sorted_codes, sorted_fadd,
    sorted_frescale, lists, queries, prefilter, k, n_probes, metric, window,
    compute_dtype, recall_target, bits,
):
    nq, d = queries.shape
    qf = jnp.asarray(queries, jnp.float32)
    probe_ids = ivf.coarse_search(qf, centers, center_norms, n_probes, metric)
    ip = metric == DistanceType.InnerProduct
    qn = jnp.sum(qf * qf, axis=1)
    qrot = qf @ rotation.T
    kb = -((1 << bits) - 1) / 2.0
    kb_sumq = kb * jnp.sum(qrot, axis=1)  # [nq] (ivf_gpu.cu:1000-1021)
    qc = qrot.astype(compute_dtype)
    qid = jnp.arange(nq, dtype=jnp.int32)

    def probe_step(carry, j):
        best_v, best_i = carry
        cluster = probe_ids[:, j]
        starts = lists.offsets[cluster]
        words_w = ivf.window_gather(sorted_codes, starts, window)  # [nq, W, words]
        ids_w = ivf.window_gather(lists.ids, starts, window)
        lab_w = ivf.window_gather(lists.labels, starts, window)
        fadd_w = ivf.window_gather(sorted_fadd, starts, window)
        fres_w = ivf.window_gather(sorted_frescale, starts, window)

        levels = bitpack.unpack(words_w, bits, d)  # [nq, W, d] int32
        raw = lax.dot_general(
            qc[:, None, :], levels.astype(compute_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=pairwise.matmul_precision(compute_dtype),
        )[:, 0, :]  # <q_rot, l>
        xu_dot = raw + kb_sumq[:, None]  # <q_rot, xu>

        qdotc = jnp.sum(qf * centers[cluster], axis=1)  # [nq]
        if ip:
            # <q, x> = <q,c> + α·<q_rot, xu>, α = ||r||²/<r,xu> = -f_rescale/2
            est = qdotc[:, None] + (-0.5 * fres_w) * xu_dot
            order = -est
        else:
            g_add = qn + jnp.sum(centers[cluster] * centers[cluster], axis=1) - 2.0 * qdotc
            est = fadd_w + g_add[:, None] + fres_w * xu_dot
            order = jnp.maximum(est, 0.0)

        valid = lab_w == cluster[:, None]
        mask = filt.passes(prefilter, qid[:, None], ids_w)
        if mask is not None:
            valid = jnp.logical_and(valid, mask)
        order = jnp.where(valid, order, jnp.inf)
        tv, tl = topk(order, min(k, window), True, recall_target)
        ti = jnp.take_along_axis(ids_w, tl, axis=1)
        mv = jnp.concatenate([best_v, tv], axis=1)
        mi = jnp.concatenate([best_i, ti], axis=1)
        sv, sidx = lax.top_k(-mv, k)
        return ((-sv), jnp.take_along_axis(mi, sidx, axis=1)), None

    init = (jnp.full((nq, k), jnp.inf, jnp.float32), jnp.zeros((nq, k), jnp.int32))
    (bv, bi), _ = lax.scan(probe_step, init, jnp.arange(n_probes))
    if ip:
        bv = -bv
    return ivf.postprocess_distances(bv, metric), bi


def search(
    index: Index,
    queries,
    k: int,
    params: Optional[SearchParams] = None,
    prefilter: Optional[filt.Prefilter] = None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate search via the RaBitQ unbiased estimator; pair with
    neighbors.refine for exact re-ranking."""
    if params is None:
        params = SearchParams(**kw)
    if prefilter is None:
        prefilter = filt.no_filter()
    queries = jnp.asarray(queries)
    nq = queries.shape[0]
    n_probes = min(params.n_probes, index.n_lists)

    algo = params.scan_algo
    # fused geometry is static (group_pairs_tiled) — available under an
    # outer trace (mg shard_map), same as ivf_flat/ivf_pq
    fused_ok = (
        index.sorted_codes_t is not None
        and index.metric in (
            DistanceType.L2Expanded,
            DistanceType.L2SqrtExpanded,
            DistanceType.InnerProduct,
        )
    )
    if algo == "auto":
        algo = (
            "fused"
            if (fused_ok and jax.default_backend() == "tpu"
                and nq * n_probes >= 4 * index.n_lists)
            else "query_major"
        )
    if algo == "fused" and not fused_ok:
        algo = "query_major"
    if algo == "fused":
        from cuvs_tpu.neighbors import ivf_scan

        qf = jnp.asarray(queries, jnp.float32)
        probe_ids = ivf.coarse_search(
            qf, index.centers, index.center_norms, n_probes, index.metric)
        ip = index.metric == DistanceType.InnerProduct
        # metric-effective factors (see cluster_major_scan_rabitq_fused)
        if ip:
            fa = jnp.zeros_like(index.sorted_fadd)
            fr = 0.5 * index.sorted_frescale
        else:
            fa, fr = index.sorted_fadd, index.sorted_frescale
        M = int(min(128, max(8, nq)))
        n_tiles = nq * n_probes // M + min(index.n_lists, nq * n_probes) + 1
        cap = int(min(32, max(2, -(-k // 32))))
        return ivf_scan.cluster_major_scan_rabitq_fused(
            index.sorted_codes_t,
            fa,
            fr,
            index.centers_rot,
            index.rotation,
            index.lists,
            qf,
            probe_ids,
            int(k),
            index.metric,
            index.window,
            M,
            int(n_tiles),
            int(index.bits_per_dim),
            None if params.recall_target is None else float(params.recall_target),
            bin_cap=cap,
            prefilter=prefilter,
            interpret=jax.default_backend() != "tpu",
        )
    return _search_impl(
        index.centers,
        index.center_norms,
        index.rotation,
        index.centers_rot,
        index.sorted_codes,
        index.sorted_fadd,
        index.sorted_frescale,
        index.lists,
        queries,
        prefilter,
        int(k),
        int(min(params.n_probes, index.n_lists)),
        index.metric,
        index.window,
        params.compute_dtype,
        None if params.recall_target is None else float(params.recall_target),
        int(index.bits_per_dim),
    )

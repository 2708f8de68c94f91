"""IVF-Flat: inverted-file index over raw vectors.

Reference: ``cuvs::neighbors::ivf_flat``
(/root/reference/cpp/include/cuvs/neighbors/ivf_flat.hpp; build
cpp/src/neighbors/ivf_flat/ivf_flat_build.cuh:394, search
ivf_flat_search.cuh:41-309, fused interleaved scan
ivf_flat_interleaved_scan_jit.cuh:423). Defaults mirror the reference:
n_lists=1024, kmeans_n_iters=20, kmeans_trainset_fraction=0.5, n_probes=20.

TPU-native design (see ivf_common): dataset rows are sorted by list into a
dense array; a probe is a static-width dynamic-slice window + batched dot.
The scan loops over probes with a running top-k merge, so peak memory is
[nq, W] not [nq, n_probes, W]. ``adaptive_centers`` drifts centers to the
exact centroid of list contents on extend (ivf_flat.hpp:36-47).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.cluster import kmeans_balanced
from cuvs_tpu.utils.tracing import traced
from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric
from cuvs_tpu.neighbors import filters as filt
from cuvs_tpu.neighbors import ivf_common as ivf
from cuvs_tpu.selection.select_k import select_k, topk


@dataclasses.dataclass(frozen=True)
class IndexParams:
    """Mirrors ivf_flat::index_params (ivf_flat.hpp:28-66)."""

    n_lists: int = 1024
    metric: DistanceType = DistanceType.L2Expanded
    kmeans_n_iters: int = 20
    kmeans_trainset_fraction: float = 0.5
    adaptive_centers: bool = False
    add_data_on_build: bool = True
    seed: int = 0
    # jnp.int8 stores globally-scaled int8 rows: the cluster-major scan
    # then runs on the MXU int8 path (2x bf16 FLOPs, half the HBM traffic,
    # 1/4 the f32 index bytes) with exact f32 norms; bfloat16 halves bytes
    # with no scale bookkeeping. None keeps the dataset dtype.
    storage_dtype: object = None

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))


@dataclasses.dataclass(frozen=True)
class SearchParams:
    """Mirrors ivf_flat::search_params (ivf_flat.hpp:76).

    recall_target < 1.0 switches per-probe top-k to the TPU-approximate
    selection (exact on CPU)."""

    n_probes: int = 20
    compute_dtype: object = jnp.float32
    recall_target: object = None
    # "auto" | "query_major" | "cluster_major" | "fused" — cluster_major
    # batches each list's probing queries into one MXU matmul
    # (ivf_scan.py); "fused" additionally runs the whole scan in one
    # Pallas kernel with in-VMEM bin selection (ops/ivf_scan_pallas.py —
    # the ivf_flat_interleaved_scan analog). auto picks fused on TPU for
    # large unfiltered L2/IP batches, cluster_major otherwise.
    scan_algo: str = "auto"
    # search-time metric UDF (ivf_flat.hpp:80 metric_udf analog): a
    # jax-traceable fn(x [m,d], y [n,d]) -> [m,n] distances (min = close)
    # traced into the coarse search and the list scans — the JIT-LTO
    # analog is jax tracing itself. Excludes the fused Pallas path.
    metric_udf: object = None


@flax.struct.dataclass
class Index:
    centers: jnp.ndarray  # [n_lists, d]
    center_norms: jnp.ndarray  # [n_lists] (squared L2, or L2 for cosine)
    sorted_data: jnp.ndarray  # [n + W, d] rows grouped by list
    sorted_norms: jnp.ndarray  # [n + W] squared row norms (always from the
    # ORIGINAL un-quantized rows)
    lists: ivf.SortedLists
    q_scale: Optional[jnp.ndarray] = None  # [] f32, int8 storage only
    metric: DistanceType = flax.struct.field(pytree_node=False, default=DistanceType.L2Expanded)
    window: int = flax.struct.field(pytree_node=False, default=128)
    n_rows: int = flax.struct.field(pytree_node=False, default=0)
    adaptive_centers: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def n_lists(self) -> int:
        return self.centers.shape[0]

    @property
    def dim(self) -> int:
        return self.centers.shape[1]

    @property
    def size(self) -> int:
        return self.n_rows


def _center_norms(centers, metric):
    if metric == DistanceType.CosineExpanded:
        return pairwise.row_norms(centers, squared=False)
    return pairwise.row_norms(centers, squared=True)


def _norm_pad_len(n: int, window: int) -> int:
    """Total sorted_norms length: past n + window, extra room so the fused
    Pallas scan's 1024-aligned norm-window DMA (ops/ivf_scan_pallas.py)
    never reads out of bounds and the [*, 128] reshape is exact."""
    n_pad_rows = n + window
    wn = -(-(window + 1024) // 1024) * 1024
    return (n_pad_rows // 1024 + 1) * 1024 + wn


@functools.partial(jax.jit, static_argnames=("out_dtype", "chunk"))
def _gather_rows(ds, order, out_dtype, chunk=1 << 20):
    """Chunked gather + dtype convert: the full-size f32 intermediate of
    ``ds[order].astype(dtype)`` never materializes (at 10M x 96 that
    transient is ~5 GB of lane-padded HBM and OOMs next to the source)."""
    n = order.shape[0]
    chunk = max(1, min(chunk, n))
    pad = (-n) % chunk
    op = jnp.pad(order, (0, pad))
    out = lax.map(lambda o: ds[o].astype(out_dtype), op.reshape(-1, chunk))
    return out.reshape(-1, ds.shape[1])[:n]


def _pack(dataset, ids, labels, centers, metric, n_lists, adaptive,
          storage_dtype=None, q_scale=None, norms=None):
    """Assemble the index from labeled rows (shared by build/extend)."""
    if int(dataset.shape[0]) == 0:
        # empty index (add_data_on_build=False): quantizer only; extend()
        # fills the lists (and picks the int8 scale from the first rows)
        window = ivf.round_window(0)
        _, lists = ivf.sort_by_label(
            jnp.zeros((0,), jnp.int32), n_lists, pad=window)
        dt = (jnp.dtype(storage_dtype) if storage_dtype is not None
              else dataset.dtype)
        dp = -(-int(dataset.shape[1]) // 128) * 128
        return Index(
            centers=centers,
            center_norms=_center_norms(centers, metric),
            sorted_data=jnp.zeros((window, dp), dt),
            sorted_norms=jnp.zeros((_norm_pad_len(0, window),), jnp.float32),
            lists=lists,
            q_scale=None,
            metric=metric,
            window=window,
            n_rows=0,
            adaptive_centers=adaptive,
        )
    sizes_max = int(jnp.max(jnp.zeros((n_lists,), jnp.int32).at[labels].add(1)))
    window = ivf.round_window(sizes_max)
    order, lists = ivf.sort_by_label(labels, n_lists, pad=window)
    # replace sorted ids (which index into `dataset`) with global ids
    global_ids = jnp.pad(jnp.asarray(ids, jnp.int32)[order], (0, window), constant_values=0)
    lists = lists._replace(ids=global_ids)
    # norms always come from the original rows (exact even when the stored
    # rows are quantized)
    if norms is None:
        norms = pairwise.row_norms(dataset)
    if storage_dtype is not None and jnp.dtype(storage_dtype) == jnp.int8 \
            and dataset.dtype != jnp.int8:
        # quantize BEFORE reordering: the gather then moves int8 rows, not
        # a second f32 copy (at 10M x 96 the f32 reorder transient OOMs)
        if q_scale is None:
            q_scale = jnp.maximum(
                jnp.max(jnp.abs(jnp.asarray(dataset, jnp.float32))), 1e-30
            ) / 127.0
        x8 = jnp.clip(
            jnp.round(jnp.asarray(dataset, jnp.float32) / q_scale), -127, 127
        ).astype(jnp.int8)
        rows = x8[order]
    elif storage_dtype is not None:
        rows = _gather_rows(dataset, order, jnp.dtype(storage_dtype))
    else:
        rows = _gather_rows(dataset, order, dataset.dtype)
    # lane-align the stored width: TPU HBM tiles pad the minor dim to 128
    # physically anyway, and the fused scan's window DMA requires it —
    # explicit zero columns cost nothing and keep every path aligned
    dp = -(-rows.shape[1] // 128) * 128
    if dp != rows.shape[1]:
        rows = jnp.pad(rows, ((0, 0), (0, dp - rows.shape[1])))
    sorted_data = jnp.concatenate(
        [rows, jnp.zeros((window, rows.shape[1]), rows.dtype)], axis=0
    )
    n_rows_total = int(dataset.shape[0])
    sorted_norms = jnp.pad(
        norms[order], (0, _norm_pad_len(n_rows_total, window) - n_rows_total)
    )
    return Index(
        centers=centers,
        center_norms=_center_norms(centers, metric),
        sorted_data=sorted_data,
        sorted_norms=sorted_norms,
        lists=lists,
        q_scale=q_scale,
        metric=metric,
        window=window,
        n_rows=int(dataset.shape[0]),
        adaptive_centers=adaptive,
    )


@traced("ivf_flat::build")
def build(dataset, params: Optional[IndexParams] = None, **kw) -> Index:
    """Train the coarse quantizer and populate lists (ivf_flat_build.cuh:394)."""
    if params is None:
        params = IndexParams(**kw)
    dataset = jnp.asarray(dataset)
    n = dataset.shape[0]
    n_lists = min(params.n_lists, n)
    trainset = jnp.asarray(dataset, jnp.float32)
    centers = kmeans_balanced.fit(
        trainset,
        n_lists,
        kmeans_balanced.BalancedParams(
            n_clusters=n_lists,
            n_iters=params.kmeans_n_iters,
            trainset_fraction=params.kmeans_trainset_fraction,
            seed=params.seed,
        ),
    )
    if params.metric == DistanceType.CosineExpanded:
        # cosine lists are built on normalized geometry
        centers = centers / jnp.maximum(
            jnp.linalg.norm(centers, axis=1, keepdims=True), 1e-30
        )
        normed = trainset / jnp.maximum(
            jnp.linalg.norm(trainset, axis=1, keepdims=True), 1e-30
        )
        labels = kmeans_balanced.predict(normed, centers)
    else:
        labels = kmeans_balanced.predict(trainset, centers)
    ids = jnp.arange(n, dtype=jnp.int32)
    if not params.add_data_on_build:
        # reference semantics (ivf_flat.hpp add_data_on_build): train the
        # coarse quantizer only; rows arrive later via extend()
        dataset, ids, labels = dataset[:0], ids[:0], labels[:0]
    return _pack(dataset, ids, labels, centers, params.metric, n_lists,
                 params.adaptive_centers, params.storage_dtype)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(buf, rows, pos):
    """In-place donated row scatter. The row width MUST be lane-aligned
    (multiple of 128 for int8): otherwise XLA inserts a full-buffer layout
    copy that defeats donation (measured: 22 GB transient for a 10 GB
    index at d=96; 0 extra at d=128)."""
    return buf.at[pos].set(rows)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_vec(buf, vals, pos):
    return buf.at[pos].set(vals)


def build_streaming(
    slice_provider,
    n_slices: int,
    n_lists: int = 16384,
    metric: DistanceType = DistanceType.L2Expanded,
    trainset_rows: int = 2_000_000,
    kmeans_n_iters: int = 10,
    seed: int = 0,
    align_dim: bool = True,
) -> Index:
    """Out-of-HBM-source IVF-Flat build with int8 list storage.

    For datasets whose f32 form exceeds HBM (DEEP-100M: 38 GB f32 vs a
    ~12.8 GB lane-aligned int8 index): the device only ever holds the
    final index plus one slice. Reference analog: sharded SNMG build +
    conservative list allocation (snmg.cuh:127-166) — the TPU-native
    equivalent packs the whole index into one chip's HBM via quantized
    storage.

    ``slice_provider(i) -> [rows, d]`` float array, called up to 3x per
    slice (re-read/regenerate, don't cache). Two modes, picked by where
    the provider's arrays live:

    * DEVICE arrays (``jax.Array``, e.g. generated on-chip or staged):
      labels/norms/scale computed on device; only 4 B/row labels + norms
      cross to the host (the axon tunnel downloads at ~5 MB/s); rows are
      quantized on device and scattered straight into the donated final
      buffer (``align_dim`` pads the row width to the next 128 multiple
      so the scatter is truly in-place — see _scatter_rows).
    * HOST numpy arrays: labels via fast bf16 uploads + device predict;
      quantize + grouped placement on the host; one device_put per final
      array.
    """
    import numpy as np

    metric = normalize_metric(metric)
    if metric not in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded,
                      DistanceType.InnerProduct):
        raise ValueError("build_streaming supports L2/IP metrics")

    first = slice_provider(0)
    device_mode = isinstance(first, jax.Array)
    d = int(first.shape[1])
    # lane-align in BOTH modes: the fused Pallas scan's window DMA (and
    # donated device scatters) require an int8 row width that is a
    # multiple of 128; host mode pads on the host before upload.
    dp = (-(-d // 128) * 128) if align_dim else d

    # ---- pass 0: subsample for training ----
    if device_mode:
        sub = []
        for i in range(n_slices):
            sl = slice_provider(i)
            sub.append(sl[:: max(1, sl.shape[0] * n_slices // trainset_rows)])
        trainset = jnp.concatenate(sub, axis=0)[:trainset_rows]
    else:
        sub = []
        for i in range(n_slices):
            sl = np.asarray(slice_provider(i), np.float32)
            sub.append(sl[:: max(1, sl.shape[0] * n_slices // trainset_rows)])
        trainset = jnp.asarray(np.concatenate(sub, axis=0)[:trainset_rows])
    del sub
    centers = kmeans_balanced.fit(
        trainset,
        n_lists,
        kmeans_balanced.BalancedParams(
            n_clusters=n_lists, n_iters=kmeans_n_iters,
            trainset_fraction=1.0, seed=seed,
        ),
    )
    del trainset
    cn = _center_norms(centers, metric)

    # ---- pass 1: labels + norms + scale ----
    labels_h, norms_h = [], []
    amax = 0.0
    for i in range(n_slices):
        if device_mode:
            sl = jnp.asarray(slice_provider(i), jnp.float32)
            labels_h.append(np.asarray(kmeans_balanced.predict(sl, centers)))
            norms_h.append(np.asarray(pairwise.row_norms(sl)))
            amax = max(amax, float(jnp.max(jnp.abs(sl))))
        else:
            sl = np.asarray(slice_provider(i), np.float32)
            # upload f32 and cast on device: a host-side ml_dtypes bf16
            # conversion is ~40 s per 2M x 96 slice on one core, the f32
            # upload is ~0.7 s on this tunnel
            up = jax.device_put(sl).astype(jnp.bfloat16)
            labels_h.append(np.asarray(kmeans_balanced.predict(up, centers)))
            norms_h.append(np.einsum("ij,ij->i", sl, sl, dtype=np.float32))
            amax = max(amax, float(np.max(np.abs(sl))))
    labels_all = np.concatenate(labels_h)
    n = labels_all.shape[0]
    q_scale = max(amax, 1e-30) / 127.0

    sizes = np.bincount(labels_all, minlength=n_lists).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    window = ivf.round_window(int(sizes.max()))

    def slice_positions(i, row0, cursor):
        rows = len(labels_h[i])
        lab = labels_all[row0 : row0 + rows]
        order = np.argsort(lab, kind="stable")
        rank = np.empty(rows, np.int64)
        so = lab[order]
        starts = np.concatenate([[0], np.flatnonzero(so[1:] != so[:-1]) + 1])
        grp = np.repeat(np.arange(len(starts)),
                        np.diff(np.concatenate([starts, [rows]])))
        rank[order] = np.arange(rows) - starts[grp]
        pos = offsets[lab] + cursor[lab] + rank
        cursor += np.bincount(lab, minlength=n_lists)
        return lab, pos, rows

    # ---- pass 2: quantize + grouped placement ----
    cursor = np.zeros(n_lists, np.int64)
    row0 = 0
    if device_mode:
        quantize = jax.jit(
            lambda v, sc: jnp.pad(
                jnp.clip(jnp.round(v / sc), -127, 127), ((0, 0), (0, dp - d))
            ).astype(jnp.int8)
        )
        data = jnp.zeros((n + window, dp), jnp.int8)
        norms_a = jnp.zeros((_norm_pad_len(n, window),), jnp.float32)
        labels_a = jnp.full((n + window,), -1, jnp.int32)
        ids_a = jnp.zeros((n + window,), jnp.int32)
        scj = jnp.float32(q_scale)
        for i in range(n_slices):
            sl = jnp.asarray(slice_provider(i), jnp.float32)
            lab, pos, rows = slice_positions(i, row0, cursor)
            posd = jnp.asarray(pos.astype(np.int32))
            data = _scatter_rows(data, quantize(sl, scj), posd)
            norms_a = _scatter_vec(norms_a, jnp.asarray(norms_h[i]), posd)
            labels_a = _scatter_vec(labels_a, jnp.asarray(lab), posd)
            ids_a = _scatter_vec(
                ids_a, jnp.arange(row0, row0 + rows, dtype=jnp.int32), posd)
            row0 += rows
        jax.block_until_ready(data)
        lists = ivf.SortedLists(
            offsets=jnp.asarray(offsets.astype(np.int32)),
            sizes=jnp.asarray(sizes), labels=labels_a, ids=ids_a,
        )
        sorted_data, sorted_norms = data, norms_a
    else:
        data_h = np.zeros((n + window, dp), np.int8)
        norms_h2 = np.zeros((_norm_pad_len(n, window),), np.float32)
        labels_ah = np.full((n + window,), -1, np.int32)
        ids_ah = np.zeros((n + window,), np.int32)
        for i in range(n_slices):
            sl = np.asarray(slice_provider(i), np.float32)
            lab, pos, rows = slice_positions(i, row0, cursor)
            data_h[pos, :d] = np.clip(
                np.round(sl / q_scale), -127, 127).astype(np.int8)
            norms_h2[pos] = norms_h[i]
            labels_ah[pos] = lab
            ids_ah[pos] = np.arange(row0, row0 + rows, dtype=np.int32)
            row0 += rows
        lists = ivf.SortedLists(
            offsets=jax.device_put(offsets.astype(np.int32)),
            sizes=jax.device_put(sizes),
            labels=jax.device_put(labels_ah),
            ids=jax.device_put(ids_ah),
        )
        sorted_data = jax.device_put(data_h)
        sorted_norms = jax.device_put(norms_h2)

    return Index(
        centers=centers,
        center_norms=cn,
        sorted_data=sorted_data,
        sorted_norms=sorted_norms,
        lists=lists,
        q_scale=jnp.float32(q_scale),
        metric=metric,
        window=window,
        n_rows=n,
        adaptive_centers=False,
    )


def extend(index: Index, new_vectors, new_ids=None) -> Index:
    """Append vectors to their nearest lists (ivf_flat extend semantics)."""
    new_norms = pairwise.row_norms(jnp.asarray(new_vectors, jnp.float32))
    if (index.q_scale is None and index.n_rows == 0
            and index.sorted_data.dtype == jnp.int8
            and jnp.asarray(new_vectors).dtype != jnp.int8):
        # first extend of an empty int8 index: pick the scale from the
        # incoming rows (build had no data to calibrate against)
        index = index.replace(q_scale=jnp.maximum(
            jnp.max(jnp.abs(jnp.asarray(new_vectors, jnp.float32))), 1e-30
        ) / 127.0)
    if index.q_scale is not None:
        nf = jnp.asarray(new_vectors, jnp.float32)
        new_vectors = jnp.clip(
            jnp.round(nf / index.q_scale), -127, 127
        ).astype(jnp.int8)
    new_vectors = jnp.asarray(new_vectors, index.sorted_data.dtype)
    n_old = index.n_rows
    n_new = new_vectors.shape[0]
    if new_ids is None:
        new_ids = jnp.arange(n_old, n_old + n_new, dtype=jnp.int32)
    old_data = index.sorted_data[:n_old, : index.dim]  # drop lane padding
    old_ids = index.lists.ids[:n_old]
    old_labels = index.lists.labels[:n_old]
    new_labels = kmeans_balanced.predict(jnp.asarray(new_vectors, jnp.float32), index.centers)
    all_data = jnp.concatenate([old_data, new_vectors], axis=0)
    all_ids = jnp.concatenate([old_ids, jnp.asarray(new_ids, jnp.int32)])
    all_labels = jnp.concatenate([old_labels, new_labels])
    centers = index.centers
    if index.adaptive_centers:
        k = index.n_lists
        all_f32 = jnp.asarray(all_data, jnp.float32)
        if index.q_scale is not None:  # de-quantize for exact center math
            all_f32 = all_f32 * index.q_scale
        sums = jax.ops.segment_sum(all_f32, all_labels, k)
        counts = jax.ops.segment_sum(jnp.ones_like(all_labels, jnp.float32), all_labels, k)
        centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )
    all_norms = jnp.concatenate([index.sorted_norms[:n_old], new_norms])
    idx = _pack(
        all_data, all_ids, all_labels, centers, index.metric, index.n_lists,
        index.adaptive_centers, q_scale=index.q_scale, norms=all_norms,
    )
    return idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_probes", "metric", "window", "n_rows",
                     "compute_dtype", "recall_target"),
)
def _search_impl(
    centers,
    center_norms,
    sorted_data,
    sorted_norms,
    lists,
    queries,
    prefilter,
    k,
    n_probes,
    metric,
    window,
    n_rows,
    compute_dtype,
    recall_target,
    q_scale=None,
):
    nq, d = queries.shape
    qf = jnp.asarray(queries, jnp.float32)
    probe_ids = ivf.coarse_search(qf, centers, center_norms, n_probes, metric, compute_dtype)

    is_udf = callable(metric) and not isinstance(metric, DistanceType)
    min_close = is_udf or metric != DistanceType.InnerProduct
    if is_udf:
        qnorm = jnp.zeros((nq,), jnp.float32)
    elif metric == DistanceType.CosineExpanded:
        qnorm = jnp.sqrt(jnp.sum(qf * qf, axis=1))
    elif metric == DistanceType.InnerProduct:
        qnorm = jnp.zeros((nq,), jnp.float32)
    else:
        qnorm = jnp.sum(qf * qf, axis=1)
    qid = jnp.arange(nq, dtype=jnp.int32)

    dp = sorted_data.shape[1]
    qp_f = jnp.pad(qf, ((0, 0), (0, dp - d))) if dp != d else qf
    if q_scale is not None:  # int8 storage: quantized queries, int8 MXU dots
        qc = jnp.clip(jnp.round(qp_f / q_scale), -127, 127).astype(jnp.int8)
        scale2 = q_scale * q_scale
    else:
        qc = jnp.asarray(qp_f, compute_dtype)
        scale2 = None

    def probe_step(carry, j):
        best_v, best_i = carry
        cluster = probe_ids[:, j]  # [nq]
        starts = lists.offsets[cluster]
        data_w = ivf.window_gather(sorted_data, starts, window)  # [nq, W, d]
        ids_w = ivf.window_gather(lists.ids, starts, window)  # [nq, W]
        lab_w = ivf.window_gather(lists.labels, starts, window)
        norm_w = ivf.window_gather(sorted_norms, starts, window)

        if is_udf:
            # metric UDF: per-query fn(q [1,d], rows [W,d]) -> [1,W],
            # vmapped over the batch; quantized storage is dequantized
            data_f = data_w[..., :d].astype(jnp.float32)
            if q_scale is not None:
                data_f = data_f * q_scale
            dist = jax.vmap(lambda qq, yy: metric(qq[None, :], yy)[0])(
                qf, data_f)
            order = jnp.asarray(dist, jnp.float32)
        elif scale2 is not None:
            dots = lax.dot_general(
                qc[:, None, :], data_w, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )[:, 0, :].astype(jnp.float32) * scale2
        else:
            dots = lax.dot_general(
                qc[:, None, :],
                data_w.astype(compute_dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=pairwise.matmul_precision(compute_dtype),
            )[:, 0, :]  # [nq, W]

        if is_udf:
            pass
        elif metric == DistanceType.InnerProduct:
            dist = dots
            order = -dots
        elif metric == DistanceType.CosineExpanded:
            denom = jnp.maximum(qnorm[:, None] * jnp.sqrt(norm_w), 1e-30)
            dist = 1.0 - dots / denom
            order = dist
        else:
            dist = jnp.maximum(qnorm[:, None] + norm_w - 2.0 * dots, 0.0)
            order = dist

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

    init = (
        jnp.full((nq, k), jnp.inf, jnp.float32),
        jnp.zeros((nq, k), jnp.int32),
    )
    (order_v, best_i), _ = lax.scan(probe_step, init, jnp.arange(n_probes))

    # recover true distances from the order values
    if metric == DistanceType.InnerProduct:
        best_v = -order_v
    else:
        best_v = order_v
    best_v = ivf.postprocess_distances(best_v, metric)
    return best_v, best_i


@traced("ivf_flat::search")
def search(
    index: Index,
    queries,
    k: int,
    params: Optional[SearchParams] = None,
    prefilter: Optional[filt.Prefilter] = None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ANN search. Returns (distances [nq,k], neighbors [nq,k] global ids)."""
    if params is None:
        params = SearchParams(**kw)
    if prefilter is None:
        prefilter = filt.no_filter()
    queries = jnp.asarray(queries)
    n_probes = min(params.n_probes, index.n_lists)

    nq = queries.shape[0]
    algo = params.scan_algo
    metric = index.metric
    if params.metric_udf is not None:
        # search-time metric UDF: traced into the unfused scans; the
        # fused Pallas kernel only supports L2/IP epilogues
        metric = params.metric_udf
        if algo in ("auto", "fused"):
            algo = ("cluster_major"
                    if nq * n_probes >= 4 * index.n_lists
                    else "query_major")
    if algo == "auto":
        # both fused and cluster_major derive their tile geometry
        # statically (group_pairs_tiled, no host occupancy sync), so they
        # stay available under an outer trace — mg shard_map ranks run
        # the SAME fused kernels as single-chip (snmg.cuh:283 parity)
        if nq * n_probes >= 4 * index.n_lists:
            algo = (
                "fused"
                if (
                    jax.default_backend() == "tpu"
                    and metric in (
                        DistanceType.L2Expanded,
                        DistanceType.L2SqrtExpanded,
                        DistanceType.InnerProduct,
                    )
                )
                else "cluster_major"
            )
        else:
            algo = "query_major"
    if algo == "fused" and metric not in (
        DistanceType.L2Expanded,
        DistanceType.L2SqrtExpanded,
        DistanceType.InnerProduct,
    ):
        algo = "cluster_major"  # other metrics: unfused scan
    if algo == "fused":
        from cuvs_tpu.neighbors import ivf_scan

        qf = jnp.asarray(queries, jnp.float32)
        probe_ids = ivf.coarse_search(
            qf, index.centers, index.center_norms, n_probes, metric,
            params.compute_dtype,
        )
        M = int(min(128, max(8, nq)))
        n_tiles = nq * n_probes // M + min(index.n_lists, nq * n_probes) + 1
        # strided lane bins: every window exposes 128 bins, so cap=2
        # covers k <= ~32 with negligible collision loss
        cap = int(min(32, max(2, -(-k // 32))))
        return ivf_scan.cluster_major_scan_fused(
            index.sorted_data,
            index.sorted_norms,
            index.lists,
            qf,
            probe_ids,
            int(k),
            metric,
            index.window,
            M,
            params.compute_dtype,
            int(n_tiles),
            None if params.recall_target is None else float(params.recall_target),
            index.q_scale,
            bin_cap=cap,
            prefilter=prefilter,
            interpret=jax.default_backend() != "tpu",
        )
    if algo == "cluster_major":
        from cuvs_tpu.neighbors import ivf_scan

        qf = jnp.asarray(queries, jnp.float32)
        probe_ids = ivf.coarse_search(
            qf, index.centers, index.center_norms, n_probes, metric,
            params.compute_dtype,
        )
        # fixed-width pair tiles: padding bounded by one partial tile per
        # active cluster, no host-side occupancy sync
        M = int(min(128, max(8, nq)))
        n_tiles = nq * n_probes // M + min(index.n_lists, nq * n_probes) + 1
        budget = 256 * 1024 * 1024 // 4
        chunk = max(1, min(n_tiles, budget // max(M * index.window, 1)))
        return ivf_scan.cluster_major_scan_tiled(
            index.sorted_data,
            index.sorted_norms,
            index.lists,
            qf,
            probe_ids,
            prefilter,
            int(k),
            metric,
            index.window,
            M,
            int(chunk),
            params.compute_dtype,
            None if params.recall_target is None else float(params.recall_target),
            int(n_tiles),
            index.q_scale,
        )
    return _search_impl(
        index.centers,
        index.center_norms,
        index.sorted_data,
        index.sorted_norms,
        index.lists,
        queries,
        prefilter,
        int(k),
        int(n_probes),
        metric,
        index.window,
        index.n_rows,
        params.compute_dtype,
        None if params.recall_target is None else float(params.recall_target),
        index.q_scale,
    )

"""IVF-PQ: inverted file with product-quantized residuals.

Reference: ``cuvs::neighbors::ivf_pq``
(/root/reference/cpp/include/cuvs/neighbors/ivf_pq.hpp; build
cpp/src/neighbors/ivf_pq/ivf_pq_build.cuh — rotation :81-155,
train_per_subset :328; search ivf_pq_search.cuh — select_clusters :61,
ivfpq_search_worker :421 with the fused LUT-scan kernel). Index math:
``code = PQ(rot_mat @ (x - center))`` (ivf_pq_build.cuh:81-155).
Defaults mirror the reference: n_lists=1024, pq_bits=8, pq_dim=0 (auto
heuristic, ivf_pq_index.cu:612-622), codebooks PER_SUBSPACE,
max_train_points_per_pq_code=256.

TPU-native design:
  * rotation + residual + LUT construction are all MXU matmuls.
  * PQ codebook training is ONE vmapped EM over all subspaces (the
    reference launches a kmeans per subspace in a host loop).
  * the scan uses the same dense sorted-list windows as ivf_flat; the ADC
    accumulation Σ_s lut[s, code] is a flat gather per (query, window row)
    that XLA vectorizes on the VPU; codes are stored BIT-PACKED at pq_bits
    into uint32 words (core/bitpack.py — same bytes/vector as the
    reference's ivf_pq_codepacking.cuh layout) and unpacked in-register
    inside the scan with static shifts/masks.
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
from cuvs_tpu.core import bitpack
from cuvs_tpu.utils.tracing import traced
from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric
from cuvs_tpu.neighbors import filters as filt
from cuvs_tpu.neighbors import ivf_common as ivf
from cuvs_tpu.selection.select_k import select_k, topk

# transient-HBM bound for the chunked residual pass in build() (tests
# shrink it to exercise the chunked path at toy sizes)
_RES_CHUNK_BYTES = 256 << 20


def calculate_pq_dim(dim: int) -> int:
    """Auto pq_dim heuristic (ivf_pq_index.cu:612-622)."""
    if dim >= 128:
        dim //= 2
    r = (dim // 32) * 32
    if r > 0:
        return r
    r = 1
    while (r << 1) <= dim:
        r <<= 1
    return r


@dataclasses.dataclass(frozen=True)
class IndexParams:
    """Mirrors ivf_pq::index_params (ivf_pq.hpp:47-132)."""

    n_lists: int = 1024
    metric: DistanceType = DistanceType.L2Expanded
    kmeans_n_iters: int = 20
    kmeans_trainset_fraction: float = 0.5
    pq_bits: int = 8
    pq_dim: int = 0  # 0 = auto
    codebook_gen: str = "per_subspace"  # or "per_cluster" (ivf_pq.hpp:34)
    force_random_rotation: bool = False
    add_data_on_build: bool = True
    max_train_points_per_pq_code: int = 256
    seed: int = 0

    def __post_init__(self):
        object.__setattr__(self, "metric", normalize_metric(self.metric))
        if not (4 <= self.pq_bits <= 8):
            raise ValueError("pq_bits must be in [4, 8]")
        if self.codebook_gen not in ("per_subspace", "per_cluster"):
            raise ValueError("codebook_gen must be per_subspace or per_cluster")


@dataclasses.dataclass(frozen=True)
class SearchParams:
    """Mirrors ivf_pq::search_params (ivf_pq.hpp:160-212)."""

    n_probes: int = 20
    lut_dtype: object = jnp.float32  # accuracy/speed knob for the LUT
    internal_distance_dtype: object = jnp.float32
    coarse_compute_dtype: object = jnp.float32
    max_internal_batch_size: int = 4096
    recall_target: object = None
    compute_dtype: object = jnp.float32
    scan_algo: str = "auto"  # see ivf_flat.SearchParams.scan_algo


@flax.struct.dataclass
class Index:
    centers: jnp.ndarray  # [n_lists, d]
    center_norms: jnp.ndarray  # [n_lists]
    centers_rot: jnp.ndarray  # [n_lists, rot_dim]
    rotation: jnp.ndarray  # [rot_dim, d] (orthonormal columns)
    pq_centers: jnp.ndarray  # PER_SUBSPACE [pq_dim, book, pq_len];
    # PER_CLUSTER [n_lists, book, pq_len] (ivf_pq.hpp:34 codebook_gen)
    sorted_codes: jnp.ndarray  # [n + W, ceil(pq_dim*pq_bits/32)] uint32 packed
    lists: ivf.SortedLists
    metric: DistanceType = flax.struct.field(pytree_node=False, default=DistanceType.L2Expanded)
    window: int = flax.struct.field(pytree_node=False, default=128)
    n_rows: int = flax.struct.field(pytree_node=False, default=0)
    pq_bits: int = flax.struct.field(pytree_node=False, default=8)
    codebook_gen: str = flax.struct.field(pytree_node=False, default="per_subspace")
    pq_dim_static: int = flax.struct.field(pytree_node=False, default=0)
    # fused-scan serving layout (PER_SUBSPACE only): transposed packed
    # code words [ceil(pq_dim/4), n + window] u32 + decoded-residual
    # norms — exactly the raw code bytes, laid out for contiguous
    # per-word-row window DMA (ops/ivf_scan_pallas.py::fused_pq_scan)
    sorted_codes_t: Optional[jnp.ndarray] = None
    sorted_code_norms: Optional[jnp.ndarray] = None

    @property
    def n_lists(self) -> int:
        return self.centers.shape[0]

    @property
    def dim(self) -> int:
        return self.centers.shape[1]

    @property
    def pq_dim(self) -> int:
        if self.codebook_gen == "per_cluster":
            return self.pq_dim_static
        return self.pq_centers.shape[0]

    @property
    def pq_len(self) -> int:
        return self.pq_centers.shape[2]

    @property
    def pq_book_size(self) -> int:
        return self.pq_centers.shape[1]

    @property
    def rot_dim(self) -> int:
        return self.rotation.shape[0]

    @property
    def size(self) -> int:
        return self.n_rows


def _make_rotation(key, dim: int, rot_dim: int, force_random: bool) -> jnp.ndarray:
    """[rot_dim, dim] with orthonormal columns; identity unless needed/forced
    (ivf_pq_build.cuh:81-155 semantics)."""
    if rot_dim == dim and not force_random:
        return jnp.eye(dim, dtype=jnp.float32)
    g = jax.random.normal(key, (max(rot_dim, dim), dim), jnp.float32)
    q, _ = jnp.linalg.qr(g)  # q: [max, dim] orthonormal columns
    return q[:rot_dim] if rot_dim <= q.shape[0] else jnp.pad(q, ((0, rot_dim - q.shape[0]), (0, 0)))


@functools.partial(jax.jit, static_argnames=("book", "n_iters"))
def _train_codebooks(key, res_sub, book, n_iters):
    """vmapped EM over subspaces.

    res_sub: [pq_dim, n_train, pq_len] residual subvectors.
    Returns [pq_dim, book, pq_len].
    """
    pq_dim, n_train, pq_len = res_sub.shape

    def em_one(key_s, xs):
        idx = jax.random.choice(key_s, n_train, (book,), replace=False)
        centers = xs[idx]

        def step(c, _):
            d = (
                jnp.sum(xs * xs, 1)[:, None]
                - 2.0 * xs @ c.T
                + jnp.sum(c * c, 1)[None, :]
            )
            labels = jnp.argmin(d, axis=1)
            sums = jax.ops.segment_sum(xs, labels, num_segments=book)
            counts = jax.ops.segment_sum(jnp.ones((n_train,), jnp.float32), labels, book)
            new = sums / jnp.maximum(counts, 1.0)[:, None]
            return jnp.where(counts[:, None] > 0, new, c), None

        centers, _ = lax.scan(step, centers, None, length=n_iters)
        return centers

    keys = jax.random.split(key, pq_dim)
    return jax.vmap(em_one)(keys, res_sub)


@functools.partial(jax.jit, static_argnames=("book", "n_iters", "train_w", "cluster_chunk"))
def _train_codebooks_per_cluster(
    key, sorted_res, offsets, sizes, book, n_iters, train_w, cluster_chunk=64
):
    """PER_CLUSTER codebooks (train_per_cluster, ivf_pq_build.cuh:410):
    one [book, pq_len] codebook per list, trained on ALL subspace vectors
    of the list's members (up to ``train_w`` rows). Masked EM, vmapped
    over clusters in chunks.

    sorted_res: [n + pad, pq_dim, pq_len] residual subvectors in list order.
    Returns [n_lists, book, pq_len].
    """
    n_lists = offsets.shape[0]
    _, pq_dim, pq_len = sorted_res.shape
    T = train_w * pq_dim  # subvectors per cluster

    def one_cluster(args):
        cid, start, size = args
        key_c = jax.random.fold_in(key, cid)
        rows = lax.dynamic_slice(
            sorted_res, (start, 0, 0), (train_w, pq_dim, pq_len)
        )
        xs = rows.reshape(T, pq_len)
        size_w = jnp.minimum(size, train_w)
        valid = (
            jnp.repeat(jnp.arange(train_w, dtype=jnp.int32), pq_dim) < size_w
        )
        idx = jax.random.randint(key_c, (book,), 0, jnp.maximum(size_w, 1) * pq_dim)
        centers = xs[idx]

        def step(c, _):
            d = (
                jnp.sum(xs * xs, 1)[:, None]
                - 2.0 * xs @ c.T
                + jnp.sum(c * c, 1)[None, :]
            )
            labels = jnp.where(valid, jnp.argmin(d, axis=1), book)
            sums = jax.ops.segment_sum(xs, labels, num_segments=book + 1)[:book]
            counts = jax.ops.segment_sum(
                jnp.ones((T,), jnp.float32), labels, book + 1
            )[:book]
            new = sums / jnp.maximum(counts, 1.0)[:, None]
            return jnp.where(counts[:, None] > 0, new, c), None

        centers, _ = lax.scan(step, centers, None, length=n_iters)
        return centers

    pad = (-n_lists) % cluster_chunk
    cids = jnp.arange(n_lists + pad, dtype=jnp.int32)
    off_p = jnp.pad(offsets, (0, pad))
    siz_p = jnp.pad(sizes, (0, pad))
    out = lax.map(
        lambda a: jax.vmap(one_cluster)(a),
        (
            cids.reshape(-1, cluster_chunk),
            off_p.reshape(-1, cluster_chunk),
            siz_p.reshape(-1, cluster_chunk),
        ),
    )
    return out.reshape(-1, book, pq_len)[:n_lists]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _encode_per_cluster(residuals_rot, labels, pq_centers, chunk=65536):
    """residuals_rot [n, rot_dim], labels [n] -> codes [n, pq_dim] uint8
    against each row's own cluster codebook."""
    n = residuals_rot.shape[0]
    n_lists, book, pq_len = pq_centers.shape
    pq_dim = residuals_rot.shape[1] // pq_len
    r = residuals_rot.reshape(n, pq_dim, pq_len)
    cnorm = jnp.sum(pq_centers * pq_centers, axis=2)  # [n_lists, book]

    pad = (-n) % chunk
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
    lp = jnp.pad(labels, (0, pad))

    def enc(args):
        rc, lc = args  # [chunk, pq_dim, pq_len], [chunk]
        cb = pq_centers[lc]  # [chunk, book, pq_len]
        dots = jnp.einsum(
            "nsl,nbl->nsb", rc, cb, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        d = cnorm[lc][:, None, :] - 2.0 * dots
        return jnp.argmin(d, axis=2).astype(jnp.uint8)

    codes = lax.map(enc, (rp.reshape(-1, chunk, pq_dim, pq_len), lp.reshape(-1, chunk)))
    return codes.reshape(-1, pq_dim)[:n]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _encode(residuals_rot, pq_centers, chunk=65536):
    """residuals_rot [n, rot_dim] -> codes [n, pq_dim] uint8."""
    n = residuals_rot.shape[0]
    pq_dim, book, pq_len = pq_centers.shape
    r = residuals_rot.reshape(n, pq_dim, pq_len)
    cnorm = jnp.sum(pq_centers * pq_centers, axis=2)  # [pq_dim, book]

    pad = (-n) % chunk
    rp = jnp.pad(r, ((0, pad), (0, 0), (0, 0)))

    def enc(rc):  # [chunk, pq_dim, pq_len]
        dots = jnp.einsum(
            "nsl,sbl->nsb", rc, pq_centers, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        d = cnorm[None] - 2.0 * dots  # + ||r||² constant per (n,s): argmin-safe
        return jnp.argmin(d, axis=2).astype(jnp.uint8)

    codes = lax.map(enc, rp.reshape(-1, chunk, pq_dim, pq_len))
    return codes.reshape(-1, pq_dim)[:n]


@traced("ivf_pq::build")
def build(dataset, params: Optional[IndexParams] = None, **kw) -> Index:
    if params is None:
        params = IndexParams(**kw)
    dataset = jnp.asarray(dataset)
    n, dim = dataset.shape
    n_lists = min(params.n_lists, n)
    pq_dim = params.pq_dim or calculate_pq_dim(dim)
    pq_len = -(-dim // pq_dim)
    rot_dim = pq_dim * pq_len
    book = 1 << params.pq_bits
    key = jax.random.PRNGKey(params.seed)
    k_rot, k_book, k_sub = jax.random.split(key, 3)

    xf = jnp.asarray(dataset, jnp.float32)
    centers = kmeans_balanced.fit(
        xf,
        n_lists,
        kmeans_balanced.BalancedParams(
            n_clusters=n_lists,
            n_iters=params.kmeans_n_iters,
            trainset_fraction=params.kmeans_trainset_fraction,
            seed=params.seed,
        ),
    )
    labels = kmeans_balanced.predict(xf, centers)
    rotation = _make_rotation(k_rot, dim, rot_dim, params.force_random_rotation)
    centers_rot = centers @ rotation.T

    # residuals in rotated space, chunked: an unchunked
    # (xf - centers[labels]) @ R.T holds xf + the center gather + res
    # (3x n*dim f32) at once — at 1M x 960 that alone is ~11.5 GB and
    # tips a 16 GB chip over. Eager slice loop (not lax.map: its padded
    # operand copy re-adds a full n*dim f32) and xf freed before the
    # concat so peak is ~2x n*dim f32 + one chunk.
    blk = max(1, min(n, _RES_CHUNK_BYTES // max(4 * dim, 1) // 128 * 128)) or 1
    if n > blk:
        parts = []
        for s in range(0, n, blk):
            parts.append(
                (xf[s : s + blk] - centers[labels[s : s + blk]])
                @ rotation.T
            )
        del xf
        res = jnp.concatenate(parts, axis=0)
        del parts
    else:
        res = (xf - centers[labels]) @ rotation.T  # [n, rot_dim]
        del xf

    window = ivf.round_window(int(jnp.max(jnp.zeros((n_lists,), jnp.int32).at[labels].add(1))))
    order, lists = ivf.sort_by_label(labels, n_lists, pad=window)

    if params.codebook_gen == "per_cluster":
        sorted_res = jnp.concatenate(
            [res[order], jnp.zeros((window, rot_dim), jnp.float32)], axis=0
        ).reshape(-1, pq_dim, pq_len)
        train_w = min(window, max(
            book, params.max_train_points_per_pq_code * book // max(pq_dim, 1)))
        pq_centers = _train_codebooks_per_cluster(
            k_book, sorted_res, lists.offsets, lists.sizes, book, 25, train_w
        )
        codes = _encode_per_cluster(res, labels, pq_centers)
    else:
        # train codebooks on a subsample (max_train_points_per_pq_code * book)
        n_train = min(n, params.max_train_points_per_pq_code * book)
        train_idx = jax.random.choice(k_sub, n, (n_train,), replace=False)
        res_train = res[train_idx].reshape(n_train, pq_dim, pq_len).transpose(1, 0, 2)
        pq_centers = _train_codebooks(k_book, res_train, book, 25)
        codes = _encode(res, pq_centers)

    if not params.add_data_on_build:
        # reference semantics (ivf_pq.hpp add_data_on_build): train the
        # coarse quantizer + codebooks only; rows arrive via extend()
        codes, n = codes[:0], 0
        window = ivf.round_window(0)
        order, lists = ivf.sort_by_label(
            jnp.zeros((0,), jnp.int32), n_lists, pad=window)
    packed = bitpack.pack(codes[order], params.pq_bits)
    sorted_codes = jnp.concatenate(
        [packed, jnp.zeros((window, packed.shape[1]), jnp.uint32)], axis=0
    )
    serving_codes = serving_norms = None
    if params.codebook_gen == "per_subspace" and n > 0:
        from cuvs_tpu.neighbors import ivf_scan

        cs = codes[order]
        serving_codes = ivf_scan.pack_codes_transposed(cs, window)
        serving_norms = ivf_scan.decoded_norms(cs, pq_centers, window,
                                               window + 128)
    return Index(
        centers=centers,
        center_norms=pairwise.row_norms(centers),
        centers_rot=centers_rot,
        rotation=rotation,
        pq_centers=pq_centers,
        sorted_codes=sorted_codes,
        lists=lists,
        metric=params.metric,
        window=window,
        n_rows=int(n),
        pq_bits=params.pq_bits,
        codebook_gen=params.codebook_gen,
        pq_dim_static=int(pq_dim),
        sorted_codes_t=serving_codes,
        sorted_code_norms=serving_norms,
    )


@functools.partial(jax.jit, static_argnames=("window", "chunk"))
def _gather_codes(codes, order, window, chunk=1 << 20):
    """Chunked row gather + window zero-pad: codes[order] at 100M+ rows
    without the full-size reorder transient."""
    n = order.shape[0]
    c = max(1, min(chunk, n))
    op = jnp.pad(order, (0, (-n) % c))
    out = lax.map(lambda o: codes[o], op.reshape(-1, c))
    out = out.reshape(-1, codes.shape[1])[:n]
    return jnp.concatenate(
        [out, jnp.zeros((window, codes.shape[1]), codes.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=("bits", "chunk"))
def _pack_chunked(codes_u8, bits, chunk=1 << 20):
    """bitpack.pack in row chunks (the one-shot u32 cast of the whole
    [n, S] code array is a 4x transient that OOMs at 100M)."""
    n, S = codes_u8.shape
    c = max(1, min(chunk, n))
    cp = jnp.pad(codes_u8, ((0, (-n) % c), (0, 0)))
    out = lax.map(lambda b: bitpack.pack(b, bits), cp.reshape(-1, c, S))
    return out.reshape(-1, out.shape[-1])[:n]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _codes_t_chunked(sorted_u8, chunk=1 << 20):
    """ivf_scan.pack_codes_transposed in row chunks (same 4x-transient
    avoidance); input already carries the window pad rows."""
    Np, S = sorted_u8.shape
    Sw = -(-S // 4)
    c = max(1, min(chunk, Np))
    pad = (-Np) % c
    cp = jnp.pad(sorted_u8, ((0, pad), (0, 0)))

    def step(i, out):
        blk = lax.dynamic_slice(cp, (i * c, 0), (c, S)).astype(jnp.uint32)
        w = jnp.pad(blk, ((0, 0), (0, Sw * 4 - S))).reshape(c, Sw, 4)
        words = (w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16)
                 | (w[:, :, 3] << 24))
        return lax.dynamic_update_slice(out, words.T, (0, i * c))

    # word rows pad to a sublane multiple of 8 (the fused kernel's dim-0
    # window DMA alignment — same contract as pack_codes_transposed)
    out = jnp.zeros((-(-Sw // 8) * 8, Np + pad), jnp.uint32)
    return lax.fori_loop(0, (Np + pad) // c, step, out)[:, :Np]


def build_streaming(
    slice_provider,
    n_slices: int,
    n_lists: int = 16384,
    pq_dim: Optional[int] = None,
    pq_bits: int = 8,
    metric: DistanceType = DistanceType.L2Expanded,
    trainset_rows: int = 2_000_000,
    kmeans_n_iters: int = 10,
    seed: int = 0,
    serving_layout: bool = True,
) -> Index:
    """Out-of-HBM-source IVF-PQ build (the bigann-1B / deep-1B regime:
    the reference builds these from host-memory datasets — datasets.yaml
    1B rows; here the f32 source never exists on device OR in host RAM
    beyond one slice).

    ``slice_provider(i) -> [rows, d]`` host numpy array, called up to 3x
    per slice. Quantizer + PER_SUBSPACE codebooks train on a subsample;
    each slice uploads once for labeling + residual encoding, and only
    the uint8 codes (pq_dim bytes/row) stay on device. Final device
    memory: packed codes ~= n * pq_dim * pq_bits / 8 bytes (+ the same
    again for the fused serving layout when ``serving_layout=True`` —
    disable it past ~150M x 48 on a 16 GB chip and serve through the
    unfused scan).
    """
    import numpy as np

    metric = normalize_metric(metric)
    if metric not in (DistanceType.L2Expanded, DistanceType.L2SqrtExpanded,
                      DistanceType.InnerProduct):
        raise ValueError("build_streaming supports L2/IP metrics")

    first = np.asarray(slice_provider(0))
    d = int(first.shape[1])
    del first
    pq_dim = pq_dim or calculate_pq_dim(d)
    pq_len = -(-d // pq_dim)
    rot_dim = pq_dim * pq_len
    book = 1 << pq_bits
    key = jax.random.PRNGKey(seed)
    k_rot, k_book, k_sub = jax.random.split(key, 3)

    # ---- pass 0: subsample -> coarse centers + rotation + codebooks ----
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
    rotation = _make_rotation(k_rot, d, rot_dim, False)
    centers_rot = centers @ rotation.T
    lab_t = kmeans_balanced.predict(trainset, centers)
    res_t = (trainset - centers[lab_t]) @ rotation.T
    n_train = min(res_t.shape[0], 256 * book)
    idx_t = jax.random.choice(k_sub, res_t.shape[0], (n_train,), replace=False)
    res_train = res_t[idx_t].reshape(n_train, pq_dim, pq_len).transpose(1, 0, 2)
    pq_centers = _train_codebooks(k_book, res_train, book, 25)
    del trainset, res_t, res_train

    # ---- pass 1: per-slice label + encode; codes stay on device ----
    labels_h, codes_dev = [], []
    for i in range(n_slices):
        sl = jnp.asarray(np.asarray(slice_provider(i), np.float32))
        lab = kmeans_balanced.predict(sl, centers)
        res = (sl - centers[lab]) @ rotation.T
        codes_dev.append(jax.block_until_ready(_encode(res, pq_centers)))
        labels_h.append(np.asarray(lab))  # 4 B/row crosses to the host
        del sl, res
    labels_all = np.concatenate(labels_h)
    n = int(labels_all.shape[0])
    sizes = np.bincount(labels_all, minlength=n_lists).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    window = ivf.round_window(int(sizes.max()))
    order = np.argsort(labels_all, kind="stable")

    # ---- assembly: chunked gather into list order, pack bits ----
    codes = jnp.concatenate(codes_dev, axis=0)
    del codes_dev
    order_d = jnp.asarray(order.astype(np.int32))
    sorted_u8 = jax.block_until_ready(_gather_codes(codes, order_d, window))
    del codes
    sorted_codes = _pack_chunked(sorted_u8, pq_bits)
    serving_codes = serving_norms = None
    if serving_layout:
        from cuvs_tpu.neighbors import ivf_scan

        serving_codes = _codes_t_chunked(sorted_u8)
        serving_norms = ivf_scan.decoded_norms(
            sorted_u8[:n], pq_centers, window, window + 128)
    del sorted_u8

    lists = ivf.SortedLists(
        offsets=jnp.asarray(offsets.astype(np.int32)),
        sizes=jnp.asarray(sizes.astype(np.int32)),
        labels=jnp.asarray(np.pad(labels_all[order], (0, window),
                                  constant_values=-1)),
        ids=jnp.asarray(np.pad(order.astype(np.int32), (0, window))),
    )
    return Index(
        centers=centers,
        center_norms=pairwise.row_norms(centers),
        centers_rot=centers_rot,
        rotation=rotation,
        pq_centers=pq_centers,
        sorted_codes=sorted_codes,
        lists=lists,
        metric=metric,
        window=window,
        n_rows=n,
        pq_bits=pq_bits,
        codebook_gen="per_subspace",
        pq_dim_static=int(pq_dim),
        sorted_codes_t=serving_codes,
        sorted_code_norms=serving_norms,
    )


def extend(index: Index, new_vectors, new_ids=None) -> Index:
    """Append vectors: assign to lists, encode residuals, re-sort."""
    xf = jnp.asarray(new_vectors, jnp.float32)
    n_old, n_new = index.n_rows, xf.shape[0]
    if new_ids is None:
        new_ids = jnp.arange(n_old, n_old + n_new, dtype=jnp.int32)
    labels_new = kmeans_balanced.predict(xf, index.centers)
    res = (xf - index.centers[labels_new]) @ index.rotation.T
    if index.codebook_gen == "per_cluster":
        codes_new = _encode_per_cluster(res, labels_new, index.pq_centers)
    else:
        codes_new = _encode(res, index.pq_centers)

    old_codes = bitpack.unpack(
        index.sorted_codes[:n_old], index.pq_bits, index.pq_dim
    ).astype(jnp.uint8)
    old_ids = index.lists.ids[:n_old]
    old_labels = index.lists.labels[:n_old]
    all_codes = jnp.concatenate([old_codes, codes_new], axis=0)
    all_ids = jnp.concatenate([old_ids, jnp.asarray(new_ids, jnp.int32)])
    all_labels = jnp.concatenate([old_labels, labels_new])

    n = n_old + n_new
    window = ivf.round_window(
        int(jnp.max(jnp.zeros((index.n_lists,), jnp.int32).at[all_labels].add(1)))
    )
    order, lists = ivf.sort_by_label(all_labels, index.n_lists, pad=window)
    lists = lists._replace(
        ids=jnp.pad(all_ids[order], (0, window), constant_values=0)
    )
    packed = bitpack.pack(all_codes[order], index.pq_bits)
    sorted_codes = jnp.concatenate(
        [packed, jnp.zeros((window, packed.shape[1]), jnp.uint32)], axis=0
    )
    serving_codes = serving_norms = None
    if index.codebook_gen == "per_subspace":
        from cuvs_tpu.neighbors import ivf_scan

        cs = all_codes[order]
        serving_codes = ivf_scan.pack_codes_transposed(cs, window)
        serving_norms = ivf_scan.decoded_norms(cs, index.pq_centers, window,
                                               window + 128)
    return Index(
        centers=index.centers,
        center_norms=index.center_norms,
        centers_rot=index.centers_rot,
        rotation=index.rotation,
        pq_centers=index.pq_centers,
        sorted_codes=sorted_codes,
        lists=lists,
        metric=index.metric,
        window=window,
        n_rows=n,
        pq_bits=index.pq_bits,
        codebook_gen=index.codebook_gen,
        pq_dim_static=index.pq_dim_static,
        sorted_codes_t=serving_codes,
        sorted_code_norms=serving_norms,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "n_probes", "metric", "window", "lut_dtype", "qchunk", "recall_target",
        "pq_bits", "codebook_gen", "pq_dim",
    ),
)
def _search_impl(
    index_arrays,
    queries,
    prefilter,
    k,
    n_probes,
    metric,
    window,
    lut_dtype,
    qchunk,
    recall_target,
    pq_bits,
    codebook_gen="per_subspace",
    pq_dim=0,
):
    (centers, center_norms, centers_rot, rotation, pq_centers, sorted_codes, lists) = index_arrays
    nq_all, dim = queries.shape
    per_cluster = codebook_gen == "per_cluster"
    if per_cluster:
        _, book, pq_len = pq_centers.shape
    else:
        pq_dim, book, pq_len = pq_centers.shape
    cbook_norms = jnp.sum(pq_centers * pq_centers, axis=2)  # [pq_dim | n_lists, book]

    qf = jnp.asarray(queries, jnp.float32)
    probe_all = ivf.coarse_search(qf, centers, center_norms, n_probes, metric)
    qrot_all = qf @ rotation.T  # [nq, rot_dim]
    qid_all = jnp.arange(nq_all, dtype=jnp.int32)

    ip = metric == DistanceType.InnerProduct
    sub_arange = jnp.arange(pq_dim, dtype=jnp.int32) * book  # LUT flattening

    pad = (-nq_all) % qchunk
    qrot_p = jnp.pad(qrot_all, ((0, pad), (0, 0)))
    probe_p = jnp.pad(probe_all, ((0, pad), (0, 0)))
    qid_p = jnp.pad(qid_all, (0, pad))
    qf_p = jnp.pad(qf, ((0, pad), (0, 0)))

    def chunk_fn(args):
        qrot, probes, qid, q = args
        nq = qrot.shape[0]
        qsub = qrot.reshape(nq, pq_dim, pq_len)

        def probe_step(carry, j):
            best_v, best_i = carry
            cluster = probes[:, j]
            if per_cluster:
                cb = pq_centers[cluster]  # [nq, book, pq_len]
                cb_spec, cb_norm = "nbl", cbook_norms[cluster][:, None, :]
            else:
                cb, cb_spec, cb_norm = pq_centers, "sbl", cbook_norms[None]
            if ip:
                # score = q.center + sum_s rot_q_s . c_code  (maximize)
                base = jnp.sum(q * centers[cluster], axis=1)
                qdots = jnp.einsum(
                    f"nsl,{cb_spec}->nsb", qsub, cb,
                    preferred_element_type=jnp.float32,
                    precision=pairwise.matmul_precision(jnp.float32),
                )
                lut = -qdots  # min-space
                base_order = -base
            else:
                # per-query LUT in rotated residual space:
                # ||res_s - c||^2 with the constant ||res_s||^2 term added
                # back via base_order for true squared distances
                res = qsub - centers_rot[cluster].reshape(nq, pq_dim, pq_len)
                dots = jnp.einsum(
                    f"nsl,{cb_spec}->nsb", res, cb,
                    preferred_element_type=jnp.float32,
                    precision=pairwise.matmul_precision(jnp.float32),
                )
                lut = cb_norm - 2.0 * dots  # [nq, pq_dim, book]
                base_order = jnp.sum(res * res, axis=(1, 2))
            if jnp.dtype(lut_dtype) == jnp.int8:
                # scaled 8-bit LUT (reference lut_dtype=CUDA_R_8U): one
                # dynamic scale per query, restored after the gather-sum
                lut_scale = jnp.maximum(
                    jnp.max(jnp.abs(lut), axis=(1, 2), keepdims=True), 1e-30
                ) / 127.0
                lut = jnp.round(lut / lut_scale).astype(jnp.int8)
            else:
                lut_scale = None
                lut = lut.astype(lut_dtype)
            lut_flat = lut.reshape(nq, pq_dim * book)

            starts = lists.offsets[cluster]
            words_w = ivf.window_gather(sorted_codes, starts, window)  # [nq, W, words] u32
            ids_w = ivf.window_gather(lists.ids, starts, window)
            lab_w = ivf.window_gather(lists.labels, starts, window)

            codes_i = bitpack.unpack(words_w, pq_bits, pq_dim)  # [nq, W, pq_dim]
            flat_idx = codes_i + sub_arange[None, None, :]
            scores = jax.vmap(lambda lt, ix: jnp.sum(lt[ix], axis=-1))(
                lut_flat.astype(jnp.float32), flat_idx
            )  # [nq, W]
            if lut_scale is not None:
                scores = scores * lut_scale[:, 0, 0, None]
            order = scores + base_order[:, None]

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
        (bv, bi), _ = lax.scan(probe_step, init, jnp.arange(n_probes))
        return bv, bi

    bv, bi = lax.map(
        chunk_fn,
        (
            qrot_p.reshape(-1, qchunk, qrot_p.shape[1]),
            probe_p.reshape(-1, qchunk, n_probes),
            qid_p.reshape(-1, qchunk),
            qf_p.reshape(-1, qchunk, dim),
        ),
    )
    bv = bv.reshape(-1, k)[:nq_all]
    bi = bi.reshape(-1, k)[:nq_all]
    if ip:
        bv = -bv
    bv = ivf.postprocess_distances(bv, metric)
    return bv, bi


@traced("ivf_pq::search")
def search(
    index: Index,
    queries,
    k: int,
    params: Optional[SearchParams] = None,
    prefilter: Optional[filt.Prefilter] = None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ANN search over PQ codes (approximate distances).

    Use neighbors.refine for exact re-ranking (ivf_pq + refine pipeline,
    SURVEY.md §3.4).
    """
    if params is None:
        params = SearchParams(**kw)
    if prefilter is None:
        prefilter = filt.no_filter()
    queries = jnp.asarray(queries)
    nq = queries.shape[0]
    n_probes = min(params.n_probes, index.n_lists)

    algo = params.scan_algo
    traced_ctx = isinstance(queries, jax.core.Tracer)
    fused_ok = (
        index.sorted_codes_t is not None
        and index.codebook_gen == "per_subspace"
        and index.metric in (
            DistanceType.L2Expanded,
            DistanceType.L2SqrtExpanded,
            DistanceType.InnerProduct,
        )
    )
    if algo == "auto":
        # the fused kernel's geometry is static (group_pairs_tiled), so
        # it stays available under an outer trace (mg shard_map —
        # snmg.cuh:283 parity: ranks run the same fused kernels as
        # single-chip). The unfused cluster-major path sizes its slot
        # axis with a host-side occupancy sync and needs concrete queries.
        if nq * n_probes >= 4 * index.n_lists:
            if fused_ok and jax.default_backend() == "tpu":
                algo = "fused"
            elif not traced_ctx:
                algo = "cluster_major"
            else:
                algo = "query_major"
        else:
            algo = "query_major"
    if algo == "fused" and not fused_ok:
        algo = "cluster_major" if not traced_ctx else "query_major"
    if algo == "cluster_major" and traced_ctx:
        algo = "query_major"  # needs the host occupancy sync
    if algo == "fused":
        from cuvs_tpu.neighbors import ivf_scan

        qf = jnp.asarray(queries, jnp.float32)
        probe_ids = ivf.coarse_search(
            qf, index.centers, index.center_norms, n_probes, index.metric,
            params.compute_dtype,
        )
        M = int(min(128, max(8, nq)))
        n_tiles = nq * n_probes // M + min(index.n_lists, nq * n_probes) + 1
        cap = int(min(32, max(2, -(-k // 32))))
        return ivf_scan.cluster_major_scan_pq_fused(
            index.sorted_codes_t,
            index.sorted_code_norms,
            index.centers_rot,
            index.pq_centers,
            index.rotation,
            index.lists,
            qf,
            probe_ids,
            int(k),
            index.metric,
            index.window,
            M,
            int(n_tiles),
            None if params.recall_target is None else float(params.recall_target),
            bin_cap=cap,
            book=int(index.pq_book_size),
            prefilter=prefilter,
            # lut_dtype=int8 quantizes the kernel's per-tile ADC LUT and
            # runs the scoring matmul at the doubled int8 rate (the
            # reference's LUT-precision knob, ivf_pq.hpp
            # search_params::lut_dtype = CUDA_R_8U)
            fused_dtype=("int8" if jnp.dtype(params.lut_dtype) == jnp.int8
                         else "bf16"),
            interpret=jax.default_backend() != "tpu",
        )
    if algo == "cluster_major":
        from cuvs_tpu.neighbors import ivf_scan

        qf = jnp.asarray(queries, jnp.float32)
        probe_ids = ivf.coarse_search(
            qf, index.centers, index.center_norms, n_probes, index.metric,
            params.compute_dtype,
        )
        # size slots to the ACTUAL max occupancy so no pair is dropped
        M = min(nq, -(-int(ivf_scan.max_occupancy(probe_ids, index.n_lists)) // 8) * 8)
        budget = 64 * 1024 * 1024 // 4
        chunk = max(1, min(index.n_lists, budget // max(M * index.window, 1)))
        # per-128-bin selection (fused-kernel semantics): kills the
        # [C, M, W] order tensor + per-row sorts; cap sized so
        # per-cluster capacity clears ~2k (exact when lists are tiny) —
        # PQ candidates feed refine() anyway, and filtered rows carry
        # inf so the masked-max rounds skip them like the exact sort did
        eff = max(1, index.n_rows // index.n_lists // 128)
        bin_cap = int(min(k, 32, max(2, -(-2 * k // eff))))
        return ivf_scan.cluster_major_scan_pq(
            index.sorted_codes,
            index.centers,
            index.centers_rot,
            index.pq_centers,
            index.rotation,
            index.lists,
            qf,
            probe_ids,
            prefilter,
            int(k),
            index.metric,
            index.window,
            int(M),
            int(chunk),
            params.compute_dtype,
            None if params.recall_target is None else float(params.recall_target),
            int(index.pq_bits),
            index.codebook_gen,
            int(index.pq_dim),
            bin_cap,
        )

    qchunk = int(min(params.max_internal_batch_size, max(64, nq)))
    arrays = (
        index.centers,
        index.center_norms,
        index.centers_rot,
        index.rotation,
        index.pq_centers,
        index.sorted_codes,
        index.lists,
    )
    return _search_impl(
        arrays,
        queries,
        prefilter,
        int(k),
        int(n_probes),
        index.metric,
        index.window,
        params.lut_dtype,
        qchunk,
        None if params.recall_target is None else float(params.recall_target),
        int(index.pq_bits),
        index.codebook_gen,
        int(index.pq_dim),
    )

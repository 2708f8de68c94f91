"""Multi-chip (SNMG) sharded / replicated indexes over a device mesh.

Reference: ``cuvs::neighbors::mg_index``
(/root/reference/cpp/include/cuvs/neighbors/common.hpp:948-1026; impl
cpp/src/neighbors/mg/snmg.cuh): REPLICATED mode copies the index per GPU
and splits query batches; SHARDED mode builds per-GPU dataset shards,
broadcasts queries, searches locally and merges top-k via NCCL
(MERGE_ON_ROOT_RANK send/recv :298-345 or TREE_MERGE :378-460), driven by
one OpenMP host thread per rank.

TPU-native: one process drives the whole ``jax.sharding.Mesh``.
  * SHARDED: per-shard index pytrees are stacked on a leading axis laid
    out over the mesh; search is a ``shard_map`` that runs the local
    jitted search per shard and merges partial top-k with one
    ``all_gather`` over ICI + a local k-way merge (the tree-merge
    collective is XLA's problem, which lowers all_gather to ring steps).
  * REPLICATED: the index is replicated; the query batch is sharded on the
    mesh axis — plain pjit data parallelism, no code beyond shardings.
No NCCL, no host threads, no per-rank mutexes.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuvs_tpu.neighbors import brute_force, cagra, filters as filt, ivf_flat, ivf_pq

_ALGOS = {
    "brute_force": brute_force,
    "ivf_flat": ivf_flat,
    "ivf_pq": ivf_pq,
    "cagra": cagra,
}


@flax.struct.dataclass
class MGIndex:
    """Stacked per-shard indexes + global id offsets."""

    shards: Any  # index pytree with leading [n_shards] axis on every leaf
    row_offsets: jnp.ndarray  # [n_shards] global id base per shard
    algo: str = flax.struct.field(pytree_node=False, default="cagra")
    mode: str = flax.struct.field(pytree_node=False, default="sharded")
    n_rows: int = flax.struct.field(pytree_node=False, default=0)


def default_mesh(axis: str = "shards") -> Mesh:
    devs = jax.devices()
    return Mesh(devs, (axis,))


def _unify_windows(module, indexes):
    """IVF shard indexes may pick different scan windows; re-pad the sorted
    arrays so every shard shares the max window and leaves stack."""
    if not hasattr(indexes[0], "window"):
        return indexes
    w = max(ix.window for ix in indexes)
    out = []
    for ix in indexes:
        extra = w - ix.window
        if extra == 0:
            out.append(ix)
            continue
        lists = ix.lists
        pad1 = lambda a: jnp.pad(a, [(0, extra)] + [(0, 0)] * (a.ndim - 1))
        lists = lists._replace(
            labels=jnp.pad(lists.labels, (0, extra), constant_values=-1),
            ids=pad1(lists.ids),
        )
        kw = dict(window=w, lists=lists)
        if hasattr(ix, "sorted_data"):
            kw["sorted_data"] = pad1(ix.sorted_data)
            kw["sorted_norms"] = pad1(ix.sorted_norms)
        if hasattr(ix, "sorted_codes"):
            kw["sorted_codes"] = pad1(ix.sorted_codes)
        if getattr(ix, "sorted_codes_t", None) is not None:
            # fused serving layout: rows live on AXIS 1 ([words, n+W])
            kw["sorted_codes_t"] = jnp.pad(ix.sorted_codes_t, ((0, 0), (0, extra)))
            kw["sorted_code_norms"] = pad1(ix.sorted_code_norms)
        out.append(ix.replace(**kw))
    return out


def build(
    dataset,
    algo: str = "cagra",
    mode: str = "sharded",
    mesh: Optional[Mesh] = None,
    index_params=None,
    distributed_build: str = "auto",
    **kw,
) -> MGIndex:
    """Build a multi-chip index.

    SHARDED: rows are split contiguously across shards (snmg.cuh:127-166);
    REPLICATED: every shard holds the full index (:97-126), placed with a
    replicated sharding so each device owns a physical copy.

    ``distributed_build``: "auto"/"on" builds IVF shards concurrently as
    ONE pjit program over the mesh (coarse centers trained once on a
    replicated subsample, per-shard assignment/sort under shard_map) — the
    analog of the reference's per-rank OpenMP builds (snmg.cuh:111); "off"
    falls back to the sequential per-shard host loop.
    """
    if mesh is None:
        mesh = default_mesh()
    module = _ALGOS[algo]
    dataset = jnp.asarray(dataset)
    n = dataset.shape[0]
    n_shards = mesh.devices.size
    # multi-slice meshes: a >1-axis mesh (e.g. ('dcn', 'ici')) shards
    # over the FLATTENED axes — XLA routes the intra-slice legs of the
    # merge all_gather over ICI and the cross-slice legs over DCN; lay
    # the ICI axis innermost (kmeans_mg.cuh multi-node analog)
    axis = mesh.axis_names[0] if len(mesh.axis_names) == 1 else tuple(mesh.axis_names)

    if mode == "replicated":
        if index_params is not None:
            index = module.build(dataset, index_params, **kw)
        else:
            index = module.build(dataset, **kw)
        # one physical copy per device (true replicas, not a host-side view)
        index = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), index
        )
        shards = jax.tree.map(lambda a: a[None], index)
        return MGIndex(
            shards=shards,
            row_offsets=jnp.zeros((1,), jnp.int32),
            algo=algo,
            mode="replicated",
            n_rows=n,
        )

    # sharded: equal contiguous row blocks (dataset zero-padded to S*B rows;
    # padded rows are masked out at merge time by their global id >= n)
    block = -(-n // n_shards)
    pad_rows = n_shards * block - n
    if pad_rows:
        dataset = jnp.concatenate(
            [dataset, jnp.zeros((pad_rows, dataset.shape[1]), dataset.dtype)], axis=0
        )

    if algo == "ivf_flat" and distributed_build in ("auto", "on"):
        return _build_ivf_flat_sharded(dataset, n, mesh, axis, index_params, kw)

    sub_indexes = []
    offsets = []
    for s in range(n_shards):
        lo, hi = s * block, (s + 1) * block
        if index_params is not None:
            sub = module.build(dataset[lo:hi], index_params, **kw)
        else:
            sub = module.build(dataset[lo:hi], **kw)
        sub_indexes.append(sub)
        offsets.append(lo)
    sub_indexes = _unify_windows(module, sub_indexes)
    # pad shard data to equal leaf shapes before stacking (row counts differ
    # by at most 1; CAGRA/BF leaves depend on shard row count)
    sub_indexes = _pad_to_common(sub_indexes)
    shards = jax.tree.map(lambda *xs: jnp.stack(xs), *sub_indexes)
    return MGIndex(
        shards=shards,
        row_offsets=jnp.asarray(offsets, jnp.int32),
        algo=algo,
        mode="sharded",
        n_rows=n,
    )


def _build_ivf_flat_sharded(dataset, n_rows, mesh, axis, index_params, kw) -> MGIndex:
    """Concurrent sharded IVF-Flat build as one mesh program.

    Coarse centers are trained ONCE on a subsample and shared by every
    shard (each shard still owns an independent inverted file over its own
    rows, so search/merge semantics match the per-rank independent builds
    of snmg.cuh:127-166). The per-shard assignment + sort runs under
    shard_map, so all devices build concurrently instead of the host loop's
    n_shards x latency.
    """
    from cuvs_tpu.cluster import kmeans_balanced
    from cuvs_tpu.distance import pairwise as pw
    from cuvs_tpu.neighbors import ivf_common as ivf
    from cuvs_tpu.neighbors.ivf_flat import Index as FlatIndex, _center_norms

    params = index_params or ivf_flat.IndexParams(**kw)
    n_shards = mesh.devices.size
    block = dataset.shape[0] // n_shards
    n_lists = min(params.n_lists, block)

    xs = jax.device_put(dataset, NamedSharding(mesh, P(axis, None)))
    xf = jnp.asarray(xs, jnp.float32)
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
    labels = kmeans_balanced.predict(xf, centers)  # [S*B] sharded by rows

    # one host sync: the static scan window = max per-(shard, list) size
    def occupancy(lab):
        return jnp.zeros((1, n_lists), jnp.int32).at[0, lab].add(1)

    occ = jax.shard_map(
        occupancy, mesh=mesh, in_specs=P(axis), out_specs=P(axis, None),
        check_vma=False,
    )(labels)
    window = ivf.round_window(int(jnp.max(occ)))

    # honor IndexParams.storage_dtype: int8 shards quantize with ONE global
    # scale (norms stay exact f32), other dtypes cast — matching the
    # sequential loop path so distributed_build='auto' never changes the
    # index dtype silently
    storage = params.storage_dtype
    q_scale = None
    if storage is not None and jnp.dtype(storage) == jnp.int8 \
            and dataset.dtype != jnp.int8:
        q_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-30) / 127.0

    def shard_build(x_blk, lab_blk):
        order, lists = ivf.sort_by_label(lab_blk, n_lists, pad=window)
        norms = pw.row_norms(jnp.asarray(x_blk, jnp.float32))
        rows = x_blk[order]
        if q_scale is not None:
            rows = jnp.clip(
                jnp.round(jnp.asarray(rows, jnp.float32) / q_scale), -127, 127
            ).astype(jnp.int8)
        elif storage is not None:
            rows = rows.astype(storage)
        sorted_data = jnp.concatenate(
            [rows, jnp.zeros((window, rows.shape[1]), rows.dtype)], axis=0
        )
        sorted_norms = jnp.pad(norms[order], (0, window))
        leaves = (sorted_data, sorted_norms) + tuple(lists)
        return tuple(l[None] for l in leaves)

    out = jax.shard_map(
        shard_build,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=tuple([P(axis)] + [P(axis)] * 5),
        check_vma=False,
    )(xs, labels)
    sorted_data, sorted_norms, offsets_l, sizes, labs, ids = out

    cnorms = _center_norms(centers, params.metric)
    sub = FlatIndex(
        centers=jnp.broadcast_to(centers[None], (n_shards,) + centers.shape),
        center_norms=jnp.broadcast_to(cnorms[None], (n_shards,) + cnorms.shape),
        sorted_data=sorted_data,
        sorted_norms=sorted_norms,
        lists=ivf.SortedLists(offsets=offsets_l, sizes=sizes, labels=labs, ids=ids),
        q_scale=(None if q_scale is None
                 else jnp.broadcast_to(q_scale[None], (n_shards,))),
        metric=params.metric,
        window=window,
        n_rows=block,
        adaptive_centers=params.adaptive_centers,
    )
    return MGIndex(
        shards=sub,
        row_offsets=jnp.arange(n_shards, dtype=jnp.int32) * block,
        algo="ivf_flat",
        mode="sharded",
        n_rows=n_rows,
    )


def build_streaming(
    slice_provider,
    n_slices: int,
    mesh: Optional[Mesh] = None,
    n_lists: int = 16384,
    metric=None,
    trainset_rows: int = 2_000_000,
    kmeans_n_iters: int = 10,
    seed: int = 0,
    algo: str = "ivf_flat",
    **algo_kw,
) -> MGIndex:
    """Sharded streaming IVF build for datasets exceeding
    n_chips x HBM (the tier-4 scale story in docs/scale.md).

    Contiguous groups of host slices are assigned per shard; each shard
    index is built with ``<algo>.build_streaming`` (ivf_flat: int8
    lane-aligned rows; ivf_pq: packed PQ codes — mg_ivf_pq.h analog) and
    committed to its owning device as soon as it finishes, so the build
    device only ever holds ONE shard's index (~total/n_chips) at a time —
    the full dataset is never gathered on one device or materialized on
    the host beyond one slice.
    Reference analog: per-rank independent builds, snmg.cuh:127-166,
    composed with the streaming/out-of-core pipelines (each shard trains
    its own coarse quantizer over its rows, like the per-rank builds).

    ``slice_provider(i) -> [rows, d]`` host numpy array, i in
    [0, n_slices); may be called up to 3x per slice. ``trainset_rows``
    and ``n_lists`` apply PER SHARD. ``algo_kw`` passes through to the
    per-shard builder (e.g. pq_dim/pq_bits for ivf_pq).
    """
    from cuvs_tpu.distance.pairwise import DistanceType

    if metric is None:
        metric = DistanceType.L2Expanded
    if mesh is None:
        mesh = default_mesh()
    if algo not in ("ivf_flat", "ivf_pq"):
        raise ValueError(f"build_streaming supports ivf_flat/ivf_pq, got {algo}")
    module = _ALGOS[algo]
    n_shards = mesh.devices.size
    if n_slices < n_shards:
        raise ValueError(
            f"need >= 1 slice per shard ({n_slices} slices, {n_shards} shards)"
        )
    axis = mesh.axis_names[0] if len(mesh.axis_names) == 1 else tuple(mesh.axis_names)
    devs = list(mesh.devices.flat)
    per = -(-n_slices // n_shards)

    subs, counts = [], []
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n_slices)
        sub = module.build_streaming(
            lambda i, lo=lo: slice_provider(lo + i),
            hi - lo,
            n_lists=n_lists,
            metric=metric,
            trainset_rows=trainset_rows,
            kmeans_n_iters=kmeans_n_iters,
            seed=seed,
            **algo_kw,
        )
        # commit the shard to its device NOW so the build device only ever
        # holds the shard under construction (cached jit executables pin
        # to the build device; an explicit put moves + frees the original)
        sub = jax.tree.map(
            lambda a, d=devs[s]: jax.block_until_ready(jax.device_put(a, d)),
            sub,
        )
        subs.append(sub)
        counts.append(sub.n_rows)
    subs = _unify_windows(module, subs)
    subs = _unify_rows(subs)
    # re-commit after padding (pads on shards that needed them ran where
    # XLA placed them; stacking requires exact per-device placement)
    subs = [
        jax.tree.map(lambda a, d=devs[s]: jax.device_put(a, d), sub)
        for s, sub in enumerate(subs)
    ]

    # assemble the [S, ...] mesh-sharded index WITHOUT gathering: each
    # shard's leaves are already committed to their device
    leaves_list = [jax.tree_util.tree_flatten(ix) for ix in subs]
    treedef = leaves_list[0][1]
    stacked = []
    for i in range(len(leaves_list[0][0])):
        parts = [leaves_list[s][0][i][None] for s in range(n_shards)]
        shape = (n_shards,) + tuple(parts[0].shape[1:])
        sharding = NamedSharding(mesh, P(axis))
        stacked.append(
            jax.make_array_from_single_device_arrays(shape, sharding, parts)
        )
    shards = jax.tree_util.tree_unflatten(treedef, stacked)
    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)
    return MGIndex(
        shards=shards,
        row_offsets=jnp.asarray(offsets, jnp.int32),
        algo=algo,
        mode="sharded",
        n_rows=int(sum(counts)),
    )


def _unify_rows(indexes):
    """Pad IVF shard indexes (Flat or PQ) to a common row count so their
    pytree structures (static ``n_rows``) match for stacking. Padded tail
    rows live past every list's window and are never scanned or returned."""
    n_max = max(ix.n_rows for ix in indexes)
    rows_of = (lambda ix: ix.sorted_data.shape[0]) \
        if hasattr(indexes[0], "sorted_data") \
        else (lambda ix: ix.sorted_codes.shape[0])
    data_len = max(rows_of(ix) for ix in indexes)
    data_len = max(data_len, n_max + indexes[0].window)
    out = []
    for ix in indexes:
        kw = dict(
            n_rows=n_max,
            lists=ix.lists._replace(
                labels=jnp.pad(
                    ix.lists.labels,
                    (0, data_len - ix.lists.labels.shape[0]),
                    constant_values=-1),
                ids=jnp.pad(
                    ix.lists.ids, (0, data_len - ix.lists.ids.shape[0])),
            ),
        )
        if hasattr(ix, "sorted_data"):
            from cuvs_tpu.neighbors.ivf_flat import _norm_pad_len

            norm_len = max(
                max(j.sorted_norms.shape[0] for j in indexes),
                _norm_pad_len(n_max, indexes[0].window))
            kw["sorted_data"] = jnp.pad(
                ix.sorted_data,
                ((0, data_len - ix.sorted_data.shape[0]), (0, 0)))
            kw["sorted_norms"] = jnp.pad(
                ix.sorted_norms, (0, norm_len - ix.sorted_norms.shape[0]))
        if hasattr(ix, "sorted_codes"):
            kw["sorted_codes"] = jnp.pad(
                ix.sorted_codes,
                ((0, data_len - ix.sorted_codes.shape[0]), (0, 0)))
        if getattr(ix, "sorted_codes_t", None) is not None:
            kw["sorted_codes_t"] = jnp.pad(
                ix.sorted_codes_t,
                ((0, 0), (0, data_len - ix.sorted_codes_t.shape[1])))
            kw["sorted_code_norms"] = jnp.pad(
                ix.sorted_code_norms,
                (0, data_len - ix.sorted_code_norms.shape[0]))
        out.append(ix.replace(**kw))
    return out


def _pad_to_common(indexes):
    """Zero-pad every leaf to the max shape across shards so leaves stack."""
    leaves_list = [jax.tree_util.tree_flatten(ix)[0] for ix in indexes]
    treedef = jax.tree_util.tree_structure(indexes[0])
    n_leaves = len(leaves_list[0])
    maxshape = [
        tuple(
            max(leaves_list[s][i].shape[d] for s in range(len(indexes)))
            for d in range(leaves_list[s][i].ndim)
        )
        for s, i in [(0, i) for i in range(n_leaves)]
    ]
    padded = []
    for s in range(len(indexes)):
        leaves = []
        for i in range(n_leaves):
            a = leaves_list[s][i]
            cfg = [(0, m - sz) for sz, m in zip(a.shape, maxshape[i])]
            leaves.append(jnp.pad(a, cfg) if any(p for _, p in cfg) else a)
        padded.append(jax.tree_util.tree_unflatten(treedef, leaves))
    return padded


def _local_search(module, index, queries, k, prefilter, search_kw):
    d, i = module.search(index, queries, k, prefilter=prefilter, **search_kw)
    return d, i


_rr_counter = [0]  # ROUND_ROBIN batch counter (snmg.cuh:639 atomic counter)
_rr_lock = threading.Lock()  # concurrent searchers tick it atomically


def search(
    mg: MGIndex,
    queries,
    k: int,
    mesh: Optional[Mesh] = None,
    prefilter: Optional[filt.Prefilter] = None,
    routing: str = "load_balancer",
    **search_kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-chip search with top-k merge over ICI (snmg.cuh:561-650).

    ``routing`` applies to REPLICATED indexes (common.hpp:948-976):
    "load_balancer" splits each query batch evenly over devices;
    "round_robin" sends the whole batch to one device, cycling per call.
    """
    if mesh is None:
        mesh = default_mesh()
    # multi-slice meshes: a >1-axis mesh (e.g. ('dcn', 'ici')) shards
    # over the FLATTENED axes — XLA routes the intra-slice legs of the
    # merge all_gather over ICI and the cross-slice legs over DCN; lay
    # the ICI axis innermost (kmeans_mg.cuh multi-node analog)
    axis = mesh.axis_names[0] if len(mesh.axis_names) == 1 else tuple(mesh.axis_names)
    module = _ALGOS[mg.algo]
    queries = jnp.asarray(queries)
    nq = queries.shape[0]

    if mg.mode == "replicated":
        index = jax.tree.map(lambda a: a[0], mg.shards)
        n_dev = mesh.devices.size
        if routing == "round_robin":
            # whole batch to one device per call (snmg.cuh:633-650); the
            # replica is already resident there, so device_put is local
            with _rr_lock:
                tick = _rr_counter[0]
                _rr_counter[0] += 1
            dev = mesh.devices.reshape(-1)[tick % n_dev]
            index_local = jax.tree.map(lambda a: jax.device_put(a, dev), index)
            q_local = jax.device_put(queries, dev)
            return _local_search(module, index_local, q_local, k, prefilter, search_kw)
        # LOAD_BALANCER: shard the query batch over the mesh
        pad = (-nq) % n_dev
        qp = jnp.pad(queries, ((0, pad), (0, 0)))
        qs = jax.device_put(qp, NamedSharding(mesh, P(axis, None)))
        d, i = _local_search(module, index, qs, k, prefilter, search_kw)
        return d[:nq], i[:nq]

    # sharded: every device searches its shard with the full query batch,
    # then one all_gather + local merge
    n_rows = mg.n_rows

    def shard_fn(shards, offsets, q):
        index = jax.tree.map(lambda a: a[0], shards)
        # filters are defined over GLOBAL row ids; the local index sees
        # shard-local ids, so shift them by the shard's offset when testing
        if prefilter is None or prefilter.is_none:
            local_flt = prefilter
        else:
            local_flt = filt.udf_filter(
                lambda qid, sid: filt.passes(prefilter, qid, sid + offsets[0])
            )
        d, i = _local_search(module, index, q, k, local_flt, search_kw)
        from cuvs_tpu.distance.pairwise import DistanceType, is_min_close

        metric = getattr(index, "metric", DistanceType.L2Expanded)
        bad = jnp.inf if is_min_close(metric) else -jnp.inf
        i = i + offsets[0]  # local -> global ids
        # mask padded rows (dataset was padded to equal shard blocks)
        pad_hit = i >= n_rows
        d = jnp.where(pad_hit, bad, d)
        i = jnp.where(pad_hit, 0, i)
        # merge across shards: gather [n_shards, nq, k] and k-way select
        all_d = lax.all_gather(d, axis)  # [S, nq, k]
        all_i = lax.all_gather(i, axis)
        S = all_d.shape[0]
        md = jnp.moveaxis(all_d, 0, 1).reshape(q.shape[0], S * k)
        mi = jnp.moveaxis(all_i, 0, 1).reshape(q.shape[0], S * k)
        if metric == DistanceType.InnerProduct:
            tv, ti = lax.top_k(md, k)
        else:
            tv, ti = lax.top_k(-md, k)
            tv = -tv
        return tv, jnp.take_along_axis(mi, ti, axis=1)

    shard_fn_mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return shard_fn_mapped(mg.shards, mg.row_offsets, queries)


def save(path: str, mg_index: MGIndex) -> None:
    """Serialize a multi-chip index: per-shard sub-indexes + distribution
    header (snmg.cuh:46-90 serializes per-rank sub-indexes the same way)."""
    import json

    import numpy as np

    from cuvs_tpu.utils import serialize as ser

    module = _ALGOS[mg_index.algo]
    n_shards = int(jax.tree_util.tree_leaves(mg_index.shards)[0].shape[0])
    header = {
        "magic": "cuvs_tpu.mg_index",
        "version": 1,
        "algo": mg_index.algo,
        "mode": mg_index.mode,
        "n_rows": mg_index.n_rows,
        "n_shards": n_shards,
        "row_offsets": np.asarray(mg_index.row_offsets).tolist(),
    }
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "mg_header.json"), "w") as f:
        json.dump(header, f)
    for s in range(n_shards):
        shard = jax.tree.map(lambda a: a[s], mg_index.shards)
        ser.save(os.path.join(path, f"shard_{s}.npz"), shard)


def load(path: str) -> MGIndex:
    """Deserialize a multi-chip index (validates the distribution header)."""
    import json
    import os

    import jax.numpy as jnp

    from cuvs_tpu.utils import serialize as ser

    with open(os.path.join(path, "mg_header.json")) as f:
        header = json.load(f)
    if header.get("magic") != "cuvs_tpu.mg_index":
        raise ValueError("not a cuvs_tpu mg index directory")
    if header.get("version", -1) > 1:
        raise ValueError("mg index version too new")
    shards = [
        ser.load(os.path.join(path, f"shard_{s}.npz"), expected_kind=header["algo"])
        for s in range(header["n_shards"])
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *shards)
    return MGIndex(
        shards=stacked,
        row_offsets=jnp.asarray(header["row_offsets"], jnp.int32),
        algo=header["algo"],
        mode=header["mode"],
        n_rows=header["n_rows"],
    )

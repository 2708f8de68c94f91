"""Shared IVF machinery: coarse search, list storage, postprocessing.

Reference: cpp/src/neighbors/ivf_common.cuh (calc_chunk_indices,
postprocess_neighbors/postprocess_distances) and the interleaved list
layout of ivf_flat_build.cuh:80-143.

TPU-native list storage: instead of CUDA's 32-row interleaved groups, the
dataset is **sorted by list label** into one dense [n, ...] array with
per-list offsets. A probe reads a static-width window
``dynamic_slice(sorted, offsets[c], (W, ...))`` where W = max list size
rounded to the lane width — dense storage (zero padding waste in HBM),
static shapes for XLA, and validity masks derived from the sorted labels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.distance import pairwise
from cuvs_tpu.distance.pairwise import DistanceType
from cuvs_tpu.selection.select_k import select_k


class SortedLists(NamedTuple):
    """Dense sorted list storage shared by IVF-Flat/PQ/SQ."""

    offsets: jnp.ndarray  # [n_lists] int32 start of each list
    sizes: jnp.ndarray  # [n_lists] int32
    labels: jnp.ndarray  # [n + W] int32 list id per sorted row (-1 pad)
    ids: jnp.ndarray  # [n + W] int32 global row id (0 pad)


# The chunked counting sort below was built to replace flat argsorts at
# 10M+ rows, but on the current remote-compile toolchain its program
# (batched row sorts + flat scatters) compiles pathologically slowly,
# while the flat argsort is measured fine at 10M (ivf_pq build: 188 s
# total). Disabled by default; CUVS_TPU_COUNTING_SORT=<min_n> opts in.
# The 100M streaming build (ivf_flat.build_streaming) needs neither — it
# computes grouped positions host-side per slice.
import os as _os

_COUNTING_SORT_MIN_N = int(_os.environ.get("CUVS_TPU_COUNTING_SORT", 1 << 62))


@functools.partial(jax.jit, static_argnames=("n_lists", "chunk"))
def _grouping_order(labels: jnp.ndarray, n_lists: int, chunk: int = 1 << 13):
    """Stable grouping permutation by label WITHOUT a flat argsort.

    XLA lowers a flat n-element sort to one giant bitonic program — slow to
    compile and run at 10M+ rows on TPU. Counting sort decomposes into
    TPU-shaped pieces: per-chunk histograms (scatter-add), cumsum bases,
    BATCHED row sorts of [n_chunks, chunk] (fast: sorts run along lanes;
    8k-wide rows keep the bitonic program small enough for the compiler),
    and one scatter. Exactly equivalent to jnp.argsort(labels, stable).
    """
    n = labels.shape[0]
    nch = -(-n // chunk)
    P = nch * chunk - n
    L1 = n_lists + 1
    labp = jnp.pad(labels, (0, P), constant_values=n_lists)  # sentinel bucket
    lab2 = labp.reshape(nch, chunk)
    chunk_ids = jax.lax.broadcasted_iota(jnp.int32, (nch, chunk), 0)
    # per-chunk histogram as ONE flat scatter-add keyed by chunk*L1+label
    # (a vmapped per-row scatter lowers to a program the compiler chokes on)
    keys = (chunk_ids * L1 + lab2).reshape(-1)
    hist = jnp.zeros((nch * L1,), jnp.int32).at[keys].add(1).reshape(nch, L1)
    total = jnp.sum(hist, axis=0)
    label_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(total)[:-1].astype(jnp.int32)]
    )
    chunk_base = jnp.concatenate(
        [jnp.zeros((1, L1), jnp.int32),
         jnp.cumsum(hist, axis=0)[:-1].astype(jnp.int32)], axis=0
    )
    base = (label_base[None, :] + chunk_base).reshape(-1)  # flat [nch*L1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (nch, chunk), 1)
    sl, sp = lax.sort((lab2, pos), dimension=1, num_keys=1)  # stable row sorts
    first = jnp.concatenate(
        [jnp.ones((nch, 1), bool), sl[:, 1:] != sl[:, :-1]], axis=1
    )
    gs = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0), axis=1)
    rank = pos - gs
    dest = base[(chunk_ids * L1 + sl).reshape(-1)] + rank.reshape(-1)  # flat gather
    orig = (sp + chunk_ids * chunk).reshape(-1)
    order = jnp.zeros((n,), jnp.int32).at[dest].set(
        orig, mode="drop"  # sentinel rows land at >= n
    )
    return order


def sort_by_label(labels: jnp.ndarray, n_lists: int, pad: int):
    """Group rows by label. Returns (order [n], SortedLists with +pad rows)."""
    labels = jnp.asarray(labels, jnp.int32)
    n = labels.shape[0]
    if n >= _COUNTING_SORT_MIN_N:
        order = _grouping_order(labels, n_lists)
    else:
        order = jnp.argsort(labels, stable=True)
    sorted_labels = labels[order]
    sizes = jnp.zeros((n_lists,), jnp.int32).at[labels].add(1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)[:-1].astype(jnp.int32)]
    )
    lab_p = jnp.pad(sorted_labels, (0, pad), constant_values=-1)
    ids_p = jnp.pad(order.astype(jnp.int32), (0, pad), constant_values=0)
    return order, SortedLists(offsets=offsets, sizes=sizes, labels=lab_p, ids=ids_p)


def round_window(max_size: int, multiple: int = 128) -> int:
    return max(multiple, -(-int(max_size) // multiple) * multiple)


def coarse_search(
    queries_f32: jnp.ndarray,
    centers: jnp.ndarray,
    center_norms: jnp.ndarray,
    n_probes: int,
    metric: DistanceType,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Top-n_probes closest lists per query -> [nq, n_probes] int32.

    GEMM + select_k, mirroring ivf_flat_search.cuh:148-187. For the L2
    family the ranking only needs center norms (query norm is constant per
    row); cosine ranks by normalized dot. A callable ``metric`` (the
    metric-UDF analog of ivf_flat.hpp:80) scores queries vs centers
    directly and selects min.
    """
    if callable(metric) and not isinstance(metric, DistanceType):
        score = jnp.asarray(metric(queries_f32, centers), jnp.float32)
        _, probe_ids = select_k(score, n_probes, select_min=True)
        return probe_ids
    dots = pairwise._gemm(queries_f32, centers, compute_dtype)
    if metric == DistanceType.InnerProduct:
        score = dots
        select_min = False
    elif metric == DistanceType.CosineExpanded:
        score = dots / jnp.maximum(center_norms[None, :], 1e-30)
        select_min = False
    else:  # L2 family: ||c||^2 - 2 q.c ranks equally to full L2
        score = center_norms[None, :] - 2.0 * dots
        select_min = True
    _, probe_ids = select_k(score, n_probes, select_min=select_min)
    return probe_ids


def window_gather(sorted_arr: jnp.ndarray, starts: jnp.ndarray, window: int):
    """vmapped dynamic_slice: rows [start_i : start_i+window] per i.

    sorted_arr: [n+pad, ...]; starts: [b] int32. Returns [b, window, ...].
    """

    def one(start):
        idx = (start,) + (0,) * (sorted_arr.ndim - 1)
        return lax.dynamic_slice(sorted_arr, idx, (window,) + sorted_arr.shape[1:])

    return jax.vmap(one)(starts)


def postprocess_distances(dists: jnp.ndarray, metric: DistanceType) -> jnp.ndarray:
    """Final metric transform (ivf_common.cuh:176 postprocess_distances)."""
    if metric == DistanceType.L2SqrtExpanded:
        return jnp.where(jnp.isfinite(dists), jnp.sqrt(jnp.maximum(dists, 0.0)), dists)
    return dists

"""Batched top-k selection — the most load-bearing primitive in the stack.

Reference surface: ``cuvs::selection::select_k``
(/root/reference/cpp/include/cuvs/selection/select_k.hpp:70-80) with radix /
warp-sort kernel families picked by heuristic, per-row valid lengths
``len_i``, optional index payload, and sorted output. ``knn_merge_parts``
(/root/reference/cpp/src/neighbors/knn_merge_parts.cu) merges several sorted
k-NN parts.

TPU-native design: warp-sort/radix decompositions don't map to the VPU.
Instead we use an exact **tiled hierarchical top-k**: reshape [b, len] into
[b, n_tiles, tile] (sentinel-padded), take per-tile top-k' (k'=min(k,tile))
with ``lax.top_k``, then select over the [b, n_tiles*k'] candidate pool,
recursing while the pool is large. Each level is a dense, static-shape sort
over lanes — exactly what XLA's TopK lowering tiles well — and the candidate
pool shrinks by ~tile/k per level, so huge rows (len=1M) cost ~2 levels.
Exactness: the global top-k is contained in the union of per-tile top-k's
since every tile contributes min(k, tile_len) elements.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# plain float so importing the library never initializes a JAX backend
_NEG = float("-inf")


def _pad_to(x, size, axis, fill):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=fill)


def _tiled_topk(vals: jnp.ndarray, idx: jnp.ndarray, k: int, tile: int):
    """One reduction level: per-tile top-k over the last axis (max-select)."""
    b, n = vals.shape
    n_tiles = -(-n // tile)
    vals = _pad_to(vals, n_tiles * tile, 1, _NEG)
    idx = _pad_to(idx, n_tiles * tile, 1, 0)
    kk = min(k, tile)
    v = vals.reshape(b * n_tiles, tile)
    i = idx.reshape(b * n_tiles, tile)
    tv, ti = lax.top_k(v, kk)
    gi = jnp.take_along_axis(i, ti, axis=1)
    return tv.reshape(b, n_tiles * kk), gi.reshape(b, n_tiles * kk)


@functools.partial(jax.jit, static_argnames=("k", "select_min", "tile"))
def _select_k_max(vals, idx, k, select_min, tile):
    # Work in "max" space: negate for min-selection.
    v = -vals if select_min else vals
    while v.shape[1] > max(4 * k, tile):
        v, idx = _tiled_topk(v, idx, k, tile)
    kk = min(k, v.shape[1])
    tv, ti = lax.top_k(v, kk)
    gi = jnp.take_along_axis(idx, ti, axis=1)
    tv = _pad_to(tv, k, 1, _NEG)
    gi = _pad_to(gi, k, 1, 0)
    out_v = -tv if select_min else tv
    return out_v, gi


def select_k(
    values,
    k: int,
    select_min: bool = True,
    indices: Optional[jnp.ndarray] = None,
    len_i: Optional[jnp.ndarray] = None,
    tile: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select the k smallest (or largest) values per row.

    Args:
      values: [batch, len] float array.
      k: number of elements to select (static).
      select_min: True = k smallest (distances), False = k largest (IP).
      indices: optional [batch, len] payload ids; defaults to arange(len).
      len_i: optional [batch] valid lengths; elements beyond are ignored.
      tile: reduction tile width.

    Returns:
      (values [batch, k] sorted best-first, indices [batch, k]).
      Rows shorter than k are padded with +inf/-inf and index 0.
    """
    values = jnp.asarray(values)
    if values.ndim == 1:
        values = values[None]
        squeeze = True
    else:
        squeeze = False
    b, n = values.shape
    values = values.astype(jnp.float32)
    if indices is None:
        indices = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    else:
        indices = jnp.asarray(indices)
    if len_i is not None:
        valid = jnp.arange(n)[None, :] < jnp.asarray(len_i)[:, None]
        sentinel = float("inf") if select_min else _NEG
        values = jnp.where(valid, values, sentinel)
    v, i = _select_k_max(values, indices, int(k), bool(select_min), int(tile))
    if squeeze:
        return v[0], i[0]
    return v, i


def merge_parts(
    values_parts,
    indices_parts,
    k: int,
    select_min: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge per-part top-k results into a single top-k.

    Parity with knn_merge_parts: parts may be a list of [batch, k_i] arrays
    or stacked [n_parts, batch, k_i]. Ids must already be global.
    """
    if isinstance(values_parts, (list, tuple)):
        vals = jnp.concatenate([jnp.asarray(v) for v in values_parts], axis=-1)
        idxs = jnp.concatenate([jnp.asarray(i) for i in indices_parts], axis=-1)
    else:
        vp = jnp.asarray(values_parts)
        ip = jnp.asarray(indices_parts)
        vals = jnp.moveaxis(vp, 0, -2).reshape(*vp.shape[1:-1], -1)
        idxs = jnp.moveaxis(ip, 0, -2).reshape(*ip.shape[1:-1], -1)
    return select_k(vals, k, select_min=select_min, indices=idxs)

"""Python side of the C API (capi/cuvs_tpu_c.cpp).

Receives raw host pointers + shapes from C, wraps them zero-copy with
ctypes/numpy, and dispatches into the package. The reference's analog is
the DLPack-dtype dispatch in /root/reference/c/src/neighbors/*.cpp.
"""

from __future__ import annotations

import ctypes
import json

import numpy as np

_ALGOS = None


def _algos():
    global _ALGOS
    if _ALGOS is None:
        from cuvs_tpu.neighbors import (
            brute_force, cagra, ivf_flat, ivf_pq, ivf_rabitq, ivf_sq,
        )

        from cuvs_tpu.neighbors import hnsw, tiered_index, vamana

        _ALGOS = {
            "brute_force": brute_force,
            "ivf_flat": ivf_flat,
            "ivf_pq": ivf_pq,
            "ivf_sq": ivf_sq,
            "ivf_rabitq": ivf_rabitq,
            "cagra": cagra,
            "vamana": vamana,
            "tiered": tiered_index,
            "hnsw": hnsw,
        }
    return _ALGOS


def _wrap(ptr: int, shape, dtype):
    size = int(np.prod(shape))
    dt = np.dtype(dtype) if dtype != "bfloat16" else None
    if dt is None:  # bf16 has no ctypes type: wrap the bits, view as bf16
        import ml_dtypes

        buf = (ctypes.c_uint16 * size).from_address(ptr)
        return (
            np.frombuffer(buf, dtype=np.uint16)
            .view(ml_dtypes.bfloat16)
            .reshape(shape)
        )
    ctype = np.ctypeslib.as_ctypes_type(dt)
    buf = (ctype * size).from_address(ptr)
    return np.frombuffer(buf, dtype=dt).reshape(shape)


def sync():
    """Drain all in-flight device work (cuvsStreamSync analog)."""
    import jax

    (jax.device_put(0.0) + 0).block_until_ready()
    return True


def init(platform: str):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    return True


def build(algo: str, metric: str, params_json: str, data_ptr: int, n_rows: int, dim: int):
    module = _algos()[algo]
    data = _wrap(data_ptr, (n_rows, dim), np.float32).copy()
    params = json.loads(params_json or "{}")
    if algo == "brute_force":
        index = module.build(data, metric=metric, **params)
    else:
        index = module.build(data, metric=metric, **params)
    return (algo, index)


def search(handle, params_json: str, q_ptr: int, n_queries: int, dim: int, k: int,
           out_d_ptr: int, out_i_ptr: int):
    algo, index = handle
    module = _algos()[algo]
    q = _wrap(q_ptr, (n_queries, dim), np.float32).copy()
    params = json.loads(params_json or "{}")
    d, i = module.search(index, q, int(k), **params)
    out_d = _wrap(out_d_ptr, (n_queries, k), np.float32)
    out_i = _wrap(out_i_ptr, (n_queries, k), np.int32)
    out_d[:] = np.asarray(d, np.float32)
    out_i[:] = np.asarray(i, np.int32)
    return True


def serialize(handle, path: str):
    from cuvs_tpu.utils import serialize as ser

    _, index = handle
    ser.save(path, index)
    return True


def deserialize(path: str):
    from cuvs_tpu.utils import serialize as ser

    index = ser.load(path)
    return (ser.kind_of(index), index)


# ---- typed (DLPack-analog) entry points: runtime dtype dispatch ----

def build_typed(algo: str, metric: str, params_json: str, data_ptr: int,
                n_rows: int, dim: int, dtype: str):
    module = _algos()[algo]
    data = _wrap(data_ptr, (n_rows, dim), dtype).copy()
    params = json.loads(params_json or "{}")
    index = module.build(data, metric=metric, **params)
    return (algo, index)


def search_typed(handle, params_json: str, q_ptr: int, n_queries: int,
                 dim: int, dtype: str, k: int, out_d_ptr: int, out_i_ptr: int):
    algo, index = handle
    module = _algos()[algo]
    q = _wrap(q_ptr, (n_queries, dim), dtype).copy()
    params = json.loads(params_json or "{}")
    d, i = module.search(index, q, int(k), **params)
    _wrap(out_d_ptr, (n_queries, k), np.float32)[:] = np.asarray(d, np.float32)
    _wrap(out_i_ptr, (n_queries, k), np.int32)[:] = np.asarray(i, np.int32)
    return True


def extend(handle, ptr: int, n_rows: int, dim: int, dtype: str):
    algo, index = handle
    module = _algos()[algo]
    if not hasattr(module, "extend"):
        raise ValueError(f"{algo} does not support extend")
    rows = _wrap(ptr, (n_rows, dim), dtype).copy()
    return (algo, module.extend(index, rows))


# ---- filtered search (reference cuvsFilter on every *Search endpoint) ----

def search_filtered(handle, params_json: str, q_ptr: int, n_queries: int,
                    dim: int, dtype: str, k: int, filter_type: int,
                    words_ptr: int, n_words: int, out_d_ptr: int,
                    out_i_ptr: int):
    from cuvs_tpu.neighbors import filters

    algo, index = handle
    module = _algos()[algo]
    q = _wrap(q_ptr, (n_queries, dim), dtype).copy()
    params = json.loads(params_json or "{}")
    words = _wrap(words_ptr, (int(n_words),), np.uint32).copy()
    if int(filter_type) == 1:  # bitset: one shared row mask
        flt = filters.bitset_filter(words)
    else:  # bitmap: [n_queries, words_per_row]
        flt = filters.bitmap_filter(words.reshape(n_queries, -1))
    d, i = module.search(index, q, int(k), prefilter=flt, **params)
    _wrap(out_d_ptr, (n_queries, k), np.float32)[:] = np.asarray(d, np.float32)
    _wrap(out_i_ptr, (n_queries, k), np.int32)[:] = np.asarray(i, np.int32)
    return True


# ---- vamana / k-NN graph / refine / tiered / hnsw endpoints ----

def vamana_serialize(handle, path: str):
    from cuvs_tpu.neighbors import vamana

    _, index = handle
    vamana.serialize(index, path)
    return True


def knn_graph(kind: str, metric: str, params_json: str, x_ptr: int,
              n_rows: int, dim: int, dtype: str, k: int, out_g_ptr: int,
              out_d_ptr: int):
    """Shared entry for cuvsTpuNnDescentBuild / cuvsTpuAllNeighborsBuild."""
    data = _wrap(x_ptr, (n_rows, dim), dtype).copy()
    p = json.loads(params_json or "{}")
    p.pop("graph_degree", None)  # out_graph's column count wins
    if kind == "nn_descent":
        from cuvs_tpu.neighbors import nn_descent

        g, gd = nn_descent.build(
            data, nn_descent.IndexParams(graph_degree=int(k), metric=metric, **p)
        )
    elif kind == "all_neighbors":
        from cuvs_tpu.neighbors import all_neighbors

        g, gd = all_neighbors.build(
            data, int(k), all_neighbors.AllNeighborsParams(metric=metric, **p)
        )
    else:
        raise ValueError(f"unknown knn_graph kind {kind!r}")
    _wrap(out_g_ptr, (n_rows, k), np.int32)[:] = np.asarray(g, np.int32)
    if out_d_ptr:
        _wrap(out_d_ptr, (n_rows, k), np.float32)[:] = np.asarray(gd, np.float32)
    return True


def refine(metric: str, x_ptr: int, xr: int, xc: int, xt: str, q_ptr: int,
           qr: int, qc: int, qt: str, c_ptr: int, cr: int, cc: int, k: int,
           out_d_ptr: int, out_i_ptr: int):
    from cuvs_tpu.neighbors import refine as refine_mod

    x = _wrap(x_ptr, (xr, xc), xt).copy()
    q = _wrap(q_ptr, (qr, qc), qt).copy()
    cand = _wrap(c_ptr, (cr, cc), np.int32).copy()
    d, i = refine_mod.refine(x, q, cand, int(k), metric=metric)
    _wrap(out_d_ptr, (qr, k), np.float32)[:] = np.asarray(d, np.float32)
    _wrap(out_i_ptr, (qr, k), np.int32)[:] = np.asarray(i, np.int32)
    return True


def tiered_build(upstream_algo: str, metric: str, upstream_params_json: str,
                 min_ann_rows: int, data_ptr: int, n_rows: int, dim: int,
                 dtype: str):
    from cuvs_tpu.neighbors import tiered_index

    module = _algos()[upstream_algo]
    data = _wrap(data_ptr, (n_rows, dim), dtype).copy()
    pj = json.loads(upstream_params_json or "{}")
    ann_params = module.IndexParams(metric=metric, **pj) if pj else None
    t = tiered_index.build(module, data, ann_params=ann_params,
                           min_ann_rows=int(min_ann_rows), metric=metric)
    return ("tiered", t)


def tiered_compact(handle):
    from cuvs_tpu.neighbors import tiered_index

    _, t = handle
    return ("tiered", tiered_index.compact(t))


def hnsw_from_cagra(handle, path: str, hierarchy: str, ef_construction: int):
    from cuvs_tpu.neighbors import hnsw

    _, index = handle
    hnsw.from_cagra(index, path, hnsw.HnswParams(
        hierarchy=hierarchy, ef_construction=int(ef_construction)))
    return True


def hnsw_load(path: str, metric: str):
    from cuvs_tpu.neighbors import hnsw

    return ("hnsw", hnsw.load(path, metric=metric))


# ---- multi-chip API (reference mg_cagra.h / mg_ivf_flat.h analogs) ----

def mg_build(algo: str, mode: str, metric: str, params_json: str,
             data_ptr: int, n_rows: int, dim: int, dtype: str):
    from cuvs_tpu import mg

    data = _wrap(data_ptr, (n_rows, dim), dtype).copy()
    params = json.loads(params_json or "{}")
    return mg.build(data, algo=algo, mode=mode, metric=metric, **params)


def mg_search(index, params_json: str, q_ptr: int, n_queries: int, dim: int,
              dtype: str, k: int, out_d_ptr: int, out_i_ptr: int):
    from cuvs_tpu import mg

    q = _wrap(q_ptr, (n_queries, dim), dtype).copy()
    params = json.loads(params_json or "{}")
    d, i = mg.search(index, q, int(k), **params)
    _wrap(out_d_ptr, (n_queries, k), np.float32)[:] = np.asarray(d, np.float32)
    _wrap(out_i_ptr, (n_queries, k), np.int32)[:] = np.asarray(i, np.int32)
    return True


def mg_serialize(index, path: str):
    from cuvs_tpu.mg import snmg

    snmg.save(path, index)
    return True


def mg_deserialize(path: str):
    from cuvs_tpu.mg import snmg

    return snmg.load(path)

"""HNSW interop: export CAGRA graphs to the hnswlib on-disk format.

Reference: ``cuvs::neighbors::hnsw``
(/root/reference/cpp/include/cuvs/neighbors/hnsw.hpp:43-61;
cpp/src/neighbors/detail/hnsw.hpp — layout notes at :975-996, header write
order :483-509, element records :1040+). A CAGRA fixed-degree graph is the
base layer of an HNSW index; hierarchy NONE writes a base-layer-only file
that hnswlib (with cuVS's base_layer_only patch) and other readers accept.

Byte layout per element (hnsw.hpp:993-996):
    [uint32 link_count][maxM0 x uint32 links][dim x T data][size_t label]
Header fields in order (hnsw.hpp:483-509): offsetLevel0, max_elements,
cur_element_count, size_data_per_element, label_offset, offset_data,
maxlevel (int), enterpoint (int), maxM, maxM0, M, mult (double),
ef_construction.

This module also reads the format back and searches it with the CAGRA
beam search, so round-trips are verifiable without hnswlib.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Optional, Tuple

import numpy as np

from cuvs_tpu.distance.pairwise import DistanceType, normalize_metric


@dataclasses.dataclass(frozen=True)
class HnswParams:
    """Mirrors hnsw::index_params (hnsw.hpp:43-61)."""

    # "none" = base-layer-only | "cpu" = host-built levels |
    # "tpu" = device-built levels (reference default GPU, hnsw.hpp:51)
    hierarchy: str = "none"
    ef_construction: int = 200
    seed: int = 0


def _level_knn_host(sub: np.ndarray, kk: int) -> np.ndarray:
    """Row-blocked exact kNN on the host (hierarchy="cpu")."""
    nl = sub.shape[0]
    sn = (sub * sub).sum(1)
    block = max(1, (64 << 20) // max(nl * 4, 1))  # ~64 MB per block
    links_local = np.empty((nl, kk), np.int64)
    for r0 in range(0, nl, block):
        r1 = min(r0 + block, nl)
        d2 = sn[r0:r1, None] + sn[None, :] - 2.0 * (sub[r0:r1] @ sub.T)
        d2[np.arange(r0, r1) - r0, np.arange(r0, r1)] = np.inf
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        ord_ = np.argsort(np.take_along_axis(d2, part, axis=1), axis=1)
        links_local[r0:r1] = np.take_along_axis(part, ord_, axis=1)
    return links_local


def _level_knn_device(sub: np.ndarray, kk: int, metric) -> np.ndarray:
    """Exact per-level kNN on the accelerator (hierarchy="tpu" — the
    analog of the reference's default HnswHierarchy::GPU,
    hnsw.hpp:46,51: upper-layer links computed on-device, serialized on
    the host). One MXU scan per level; k+1 then drop self."""
    from cuvs_tpu.neighbors import brute_force

    ix = brute_force.build(sub, metric=metric)
    _, ids = brute_force.search(ix, sub, kk + 1)
    ids = np.asarray(ids, np.int64)
    self_col = ids == np.arange(ids.shape[0])[:, None]
    # drop the self hit wherever it appears; keep first kk of the rest
    keep = np.argsort(self_col, axis=1, kind="stable")[:, :kk]
    return np.take_along_axis(ids, keep, axis=1)


def _build_hierarchy(data: np.ndarray, m: int, mult: float, seed: int,
                     device: bool = False, metric="sqeuclidean"):
    """Assign HNSW levels and build upper-layer graphs (hnsw.hpp:43-61
    hierarchy CPU/GPU modes; level draw matches hnswlib's
    floor(-ln(U)*mult)).

    Returns (levels [n] int32, {level: (node_ids, links [len, m] int32
    local-to-global)}). Upper layers are tiny (n/M^l nodes), so exact
    per-level k-NN graphs are cheap and strictly better than hnswlib's
    greedy inserts.
    """
    n = data.shape[0]
    rng = np.random.default_rng(seed)
    levels = np.floor(-np.log(rng.random(n)) * mult).astype(np.int32)
    layers = {}
    for l in range(1, int(levels.max()) + 1):
        nodes = np.where(levels >= l)[0]
        if len(nodes) == 0:
            break
        if len(nodes) == 1:
            layers[l] = (nodes, np.full((1, 0), 0, np.int32))
            continue
        sub = data[nodes]
        kk = min(m, len(nodes) - 1)
        if device:
            links_local = _level_knn_device(sub, kk, metric)
        else:
            links_local = _level_knn_host(sub, kk)
        layers[l] = (nodes, nodes[links_local].astype(np.int32))
    return levels, layers


def from_cagra(cagra_index, path: str, params: HnswParams = HnswParams()) -> None:
    """Serialize a CAGRA index as an hnswlib file (hnsw::from_cagra).

    hierarchy="none" writes a base-layer-only file (readable by cuVS's
    patched hnswlib); hierarchy="cpu"/"tpu" additionally assign
    hnswlib-style levels and write exact upper-layer link lists,
    producing a file vanilla hnswlib loads and searches with its normal
    descent. "tpu" computes the per-level kNN on the accelerator (the
    reference's default HnswHierarchy::GPU, hnsw.hpp:46,51).
    """
    graph = np.asarray(cagra_index.graph, np.uint32)
    data = np.asarray(cagra_index.dataset, np.float32)
    n, deg = graph.shape
    dim = data.shape[1]
    m = (deg + 1) // 2
    max_m0 = 2 * m  # deg rounded up to even
    size_links0 = max_m0 * 4 + 4
    data_size = dim * 4
    size_per_elem = size_links0 + data_size + 8
    label_offset = size_links0 + data_size
    offset_data = size_links0
    mult = 1.0 / np.log(max(m, 2))
    size_links_upper = m * 4 + 4  # size_links_per_element_ in hnswlib

    if params.hierarchy in ("cpu", "tpu", "gpu"):
        levels, layers = _build_hierarchy(
            data, m, mult, params.seed,
            device=params.hierarchy != "cpu",
            metric=getattr(cagra_index, "metric", "sqeuclidean"),
        )
        maxlevel = int(levels.max()) if n else 0
        enterpoint = int(np.argmax(levels))
    elif params.hierarchy == "none":
        levels = np.zeros(n, np.int32)
        layers = {}
        maxlevel = 1  # base-only convention (hnsw.hpp:468)
        enterpoint = n // 2  # (hnsw.hpp:467)
    else:
        raise NotImplementedError(f"hierarchy {params.hierarchy!r}")

    # per-level link lookup: node -> links per level
    links_at = {}
    for l, (nodes, links) in layers.items():
        for row, node in enumerate(nodes):
            links_at[(int(node), l)] = links[row]

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 0))  # offsetLevel0
        f.write(struct.pack("<Q", n))  # max_elements
        f.write(struct.pack("<Q", n))  # cur_element_count
        f.write(struct.pack("<Q", size_per_elem))
        f.write(struct.pack("<Q", label_offset))
        f.write(struct.pack("<Q", offset_data))
        f.write(struct.pack("<i", maxlevel))
        f.write(struct.pack("<i", enterpoint))
        f.write(struct.pack("<Q", m))  # maxM
        f.write(struct.pack("<Q", max_m0))  # maxM0
        f.write(struct.pack("<Q", m))  # M
        f.write(struct.pack("<d", mult))
        f.write(struct.pack("<Q", params.ef_construction))

        pad = max_m0 - deg
        for i in range(n):
            f.write(struct.pack("<i", deg))
            f.write(graph[i].tobytes())
            if pad:
                f.write(b"\x00" * (4 * pad))
            f.write(data[i].tobytes())
            f.write(struct.pack("<Q", i))
        # per-element upper-level link lists (hnswlib linkLists_ layout:
        # one [count][maxM links] record per level 1..level(i))
        for i in range(n):
            li = int(levels[i])
            if li == 0:
                f.write(struct.pack("<I", 0))
                continue
            f.write(struct.pack("<I", size_links_upper * li))
            for l in range(1, li + 1):
                ln = links_at.get((i, l), np.zeros(0, np.int32))
                f.write(struct.pack("<i", len(ln)))
                buf = np.zeros(m, np.uint32)
                buf[: len(ln)] = ln.astype(np.uint32)
                f.write(buf.tobytes())


def load(path: str, metric="sqeuclidean"):
    """Read an hnswlib file's base layer back into a CAGRA index."""
    from cuvs_tpu.neighbors import cagra as cagra_mod

    with open(path, "rb") as f:
        head = f.read(8 * 6)
        offset0, max_el, n, size_per_elem, label_offset, offset_data = struct.unpack(
            "<6Q", head
        )
        maxlevel, enterpoint = struct.unpack("<2i", f.read(8))
        max_m, max_m0, m = struct.unpack("<3Q", f.read(24))
        (mult,) = struct.unpack("<d", f.read(8))
        (efc,) = struct.unpack("<Q", f.read(8))
        dim = (label_offset - offset_data) // 4
        blob = f.read(n * size_per_elem)
    arr = np.frombuffer(blob, np.uint8).reshape(n, size_per_elem)
    counts = arr[:, :4].copy().view(np.int32)[:, 0]
    links = arr[:, 4 : 4 + max_m0 * 4].copy().view(np.uint32).reshape(n, max_m0)
    deg = int(counts.max()) if n else 0
    graph = links[:, :deg].astype(np.int32)
    # rows with fewer links: pad with own first link
    col = np.arange(deg)[None, :]
    graph = np.where(col < counts[:, None], graph, graph[:, :1])
    data = arr[:, offset_data : offset_data + dim * 4].copy().view(np.float32)
    return cagra_mod.from_graph(data.reshape(n, dim), graph, metric=metric)


def read_hierarchy(path: str):
    """Parse the upper-level structure of an hnswlib file (verification
    helper): returns (levels [n], maxlevel, enterpoint, {(node, level):
    links}). Layout per hnswlib's loadIndex."""
    with open(path, "rb") as f:
        head = f.read(8 * 6)
        _, _, n, size_per_elem, label_offset, offset_data = struct.unpack("<6Q", head)
        maxlevel, enterpoint = struct.unpack("<2i", f.read(8))
        max_m, max_m0, m = struct.unpack("<3Q", f.read(24))
        f.read(8 + 8)  # mult, ef_construction
        f.seek(n * size_per_elem, 1)
        size_links_upper = m * 4 + 4
        levels = np.zeros(n, np.int32)
        links = {}
        for i in range(n):
            (sz,) = struct.unpack("<I", f.read(4))
            if sz == 0:
                continue
            li = sz // size_links_upper
            levels[i] = li
            for l in range(1, li + 1):
                (cnt,) = struct.unpack("<i", f.read(4))
                arr = np.frombuffer(f.read(4 * m), np.uint32)[:cnt]
                links[(i, l)] = arr.astype(np.int64)
    return levels, maxlevel, enterpoint, links


def search(index, queries, k: int, ef: int = 64, **kw) -> Tuple[np.ndarray, np.ndarray]:
    """Search an (loaded) HNSW/CAGRA index (hnsw::search analog)."""
    from cuvs_tpu.neighbors import cagra as cagra_mod

    return cagra_mod.search(index, queries, k, itopk_size=max(ef, k), **kw)

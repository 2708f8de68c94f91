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

    hierarchy: str = "none"  # "none" = base-layer-only (CPU/GPU later)
    ef_construction: int = 200


def from_cagra(cagra_index, path: str, params: HnswParams = HnswParams()) -> None:
    """Serialize a CAGRA index as an hnswlib file (hnsw::from_cagra)."""
    if params.hierarchy != "none":
        raise NotImplementedError("only base-layer-only export is implemented")
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

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 0))  # offsetLevel0
        f.write(struct.pack("<Q", n))  # max_elements
        f.write(struct.pack("<Q", n))  # cur_element_count
        f.write(struct.pack("<Q", size_per_elem))
        f.write(struct.pack("<Q", label_offset))
        f.write(struct.pack("<Q", offset_data))
        f.write(struct.pack("<i", 1))  # maxlevel (base-only: 1, hnsw.hpp:468)
        f.write(struct.pack("<i", n // 2))  # enterpoint (hnsw.hpp:467)
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
        # per-element upper-level link lists: all empty
        f.write(struct.pack("<I", 0) * n)


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


def search(index, queries, k: int, ef: int = 64, **kw) -> Tuple[np.ndarray, np.ndarray]:
    """Search an (loaded) HNSW/CAGRA index (hnsw::search analog)."""
    from cuvs_tpu.neighbors import cagra as cagra_mod

    return cagra_mod.search(index, queries, k, itopk_size=max(ef, k), **kw)

"""Index serialization with version-checked headers.

Reference: per-index ``serialize``/``deserialize`` with magic/version
validation (/root/reference/cpp/src/util/serialize_validation.hpp —
CHANGELOG "Fix vulnerable index deserialization"; numpy-format tensors via
the raft serializer).

Format: a single ``.npz`` holding every array leaf keyed by its pytree
path plus a JSON header (magic, version, kind, static fields). No pickle
anywhere — deserialization validates the header before touching payload
and rebuilds the index through an explicit per-kind constructor.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = "cuvs_tpu.index"
VERSION = 1


def _statics_of(index) -> Dict[str, Any]:
    import dataclasses

    out = {}
    for f in dataclasses.fields(index):
        if f.metadata.get("pytree_node", True):
            continue
        v = getattr(index, f.name)
        if hasattr(v, "value"):  # IntEnum
            v = int(v)
        out[f.name] = v
    return out


def _arrays_of(index) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(index)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def kind_of(index) -> str:
    mod = type(index).__module__
    kind = mod.rsplit(".", 1)[-1]
    cls = type(index).__name__
    if cls not in ("Index",):  # e.g. cagra.CompressedIndex
        kind = f"{kind}.{cls}"
    return kind


def save(path: str, index: Any) -> None:
    """Serialize an index pytree to ``path`` (npz container)."""
    kind = kind_of(index)
    arrays = _arrays_of(index)
    header = {
        "magic": MAGIC,
        "version": VERSION,
        "kind": kind,
        "statics": _statics_of(index),
        "arrays": sorted(arrays),
    }
    payload = {f"a{i}": arr for i, (k, arr) in enumerate(sorted(arrays.items()))}
    with open(path, "wb") as f:
        np.savez(
            f,
            __header__=np.frombuffer(json.dumps(header).encode(), np.uint8),
            **payload,
        )


def _build_ivf_lists(a, prefix):
    from cuvs_tpu.neighbors.ivf_common import SortedLists

    return SortedLists(
        offsets=a[f"{prefix}.offsets"],
        sizes=a[f"{prefix}.sizes"],
        labels=a[f"{prefix}.labels"],
        ids=a[f"{prefix}.ids"],
    )


def _builders():
    from cuvs_tpu.distance.pairwise import DistanceType
    from cuvs_tpu.neighbors import (
        brute_force, cagra, ivf_flat, ivf_pq, ivf_rabitq, ivf_sq,
    )

    def build_bf(a, s):
        return brute_force.Index(
            dataset=a[".dataset"],
            norms=a.get(".norms"),
            q_scale=a.get(".q_scale"),
            metric=DistanceType(s["metric"]),
            metric_arg=s["metric_arg"],
        )

    def build_ivf_flat(a, s):
        return ivf_flat.Index(
            centers=a[".centers"],
            center_norms=a[".center_norms"],
            sorted_data=a[".sorted_data"],
            sorted_norms=a[".sorted_norms"],
            lists=_build_ivf_lists(a, ".lists"),
            q_scale=a.get(".q_scale"),
            metric=DistanceType(s["metric"]),
            window=s["window"],
            n_rows=s["n_rows"],
            adaptive_centers=s["adaptive_centers"],
        )

    def build_ivf_pq(a, s):
        return ivf_pq.Index(
            centers=a[".centers"],
            center_norms=a[".center_norms"],
            centers_rot=a[".centers_rot"],
            rotation=a[".rotation"],
            pq_centers=a[".pq_centers"],
            sorted_codes=a[".sorted_codes"],
            lists=_build_ivf_lists(a, ".lists"),
            metric=DistanceType(s["metric"]),
            window=s["window"],
            n_rows=s["n_rows"],
            pq_bits=s["pq_bits"],
            codebook_gen=s.get("codebook_gen", "per_subspace"),
            pq_dim_static=s.get("pq_dim_static", 0),
            sorted_codes_t=a.get(".sorted_codes_t"),
            sorted_code_norms=a.get(".sorted_code_norms"),
        )

    def build_cagra(a, s):
        return cagra.Index(
            dataset=a[".dataset"],
            dataset_norms=a[".dataset_norms"],
            graph=a[".graph"],
            metric=DistanceType(s["metric"]),
        )

    def build_cagra_packed(a, s):
        # child_vecs is a tuple of deg-axis pieces → keys .child_vecs[i];
        # a plain .child_vecs key is the pre-split single-array format
        if ".child_vecs" in a:
            cv = (a[".child_vecs"],)
        else:
            keys = sorted((k for k in a if k.startswith(".child_vecs[")),
                          key=lambda k: int(k[len(".child_vecs["):-1]))
            cv = tuple(a[k] for k in keys)
        return cagra.PackedIndex(
            graph=a[".graph"],
            child_vecs=cv,
            child_norms=a[".child_norms"],
            dataset_int8=a[".dataset_int8"],
            dataset_norms=a[".dataset_norms"],
            scale=a[".scale"],
            metric=DistanceType(s["metric"]),
        )

    def build_cagra_compressed(a, s):
        return cagra.CompressedIndex(
            vq_centers=a[".vq_centers"],
            vq_codes=a[".vq_codes"],
            pq_codes=a[".pq_codes"],
            pq_codebooks=a[".pq_codebooks"],
            dataset_norms=a[".dataset_norms"],
            graph=a[".graph"],
            metric=DistanceType(s["metric"]),
        )

    def build_ivf_sq(a, s):
        return ivf_sq.Index(
            centers=a[".centers"],
            center_norms=a[".center_norms"],
            sorted_codes=a[".sorted_codes"],
            sorted_norms=a[".sorted_norms"],
            q_min=a[".q_min"],
            q_max=a[".q_max"],
            lists=_build_ivf_lists(a, ".lists"),
            metric=DistanceType(s["metric"]),
            window=s["window"],
            n_rows=s["n_rows"],
        )

    def build_ivf_rabitq(a, s):
        return ivf_rabitq.Index(
            centers=a[".centers"],
            center_norms=a[".center_norms"],
            rotation=a[".rotation"],
            centers_rot=a[".centers_rot"],
            sorted_codes=a[".sorted_codes"],
            sorted_fadd=a[".sorted_fadd"],
            sorted_frescale=a[".sorted_frescale"],
            lists=_build_ivf_lists(a, ".lists"),
            metric=DistanceType(s["metric"]),
            window=s["window"],
            n_rows=s["n_rows"],
            bits_per_dim=s["bits_per_dim"],
            sorted_codes_t=a.get(".sorted_codes_t"),
        )

    return {
        "brute_force": build_bf,
        "ivf_flat": build_ivf_flat,
        "ivf_pq": build_ivf_pq,
        "ivf_sq": build_ivf_sq,
        "ivf_rabitq": build_ivf_rabitq,
        "cagra": build_cagra,
        "cagra.CompressedIndex": build_cagra_compressed,
        "cagra.PackedIndex": build_cagra_packed,
    }


def load(path: str, expected_kind: str = None) -> Any:
    """Deserialize an index; validates magic/version/kind first."""
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(bytes(z["__header__"].tobytes()).decode())
        if header.get("magic") != MAGIC:
            raise ValueError("not a cuvs_tpu index file (bad magic)")
        if header.get("version", -1) > VERSION:
            raise ValueError(
                f"index file version {header['version']} newer than supported {VERSION}"
            )
        kind = header["kind"]
        if expected_kind is not None and kind != expected_kind:
            raise ValueError(f"expected {expected_kind} index, file holds {kind}")
        builders = _builders()
        if kind not in builders:
            raise ValueError(f"unknown index kind {kind!r}")
        names = header["arrays"]
        arrays = {name: jnp.asarray(z[f"a{i}"]) for i, name in enumerate(names)}
    return builders[kind](arrays, header["statics"])

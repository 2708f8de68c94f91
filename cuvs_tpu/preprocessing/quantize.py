"""Standalone quantizers: scalar (int8), binary (1-bit), product (PQ).

Reference surfaces:
  * scalar: train min/max at quantile=0.99, transform fp -> int8, inverse
    (/root/reference/cpp/include/cuvs/preprocessing/quantize/scalar.hpp:35).
  * binary: 1 bit/dim with threshold zero / mean / sampling_median
    (/root/reference/cpp/include/cuvs/preprocessing/quantize/binary.hpp:31-55);
    pairs with the BitwiseHamming metric.
  * pq: standalone product-quantizer train/encode/decode
    (/root/reference/cpp/include/cuvs/preprocessing/quantize/pq.hpp:34).

All transforms are elementwise jnp (VPU) or vmapped EM (MXU) — nothing
here needs a kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from cuvs_tpu.core import bitset as _bitset


# ----------------------------------------------------------------------------
# scalar int8
# ----------------------------------------------------------------------------

@flax.struct.dataclass
class ScalarQuantizer:
    min_: jnp.ndarray  # scalar
    max_: jnp.ndarray  # scalar


def scalar_train(dataset, quantile: float = 0.99) -> ScalarQuantizer:
    """Robust min/max over the central ``quantile`` mass (scalar.hpp:35)."""
    x = jnp.asarray(dataset, jnp.float32).reshape(-1)
    lo = (1.0 - quantile) / 2.0
    qmin = jnp.quantile(x, lo)
    qmax = jnp.quantile(x, 1.0 - lo)
    return ScalarQuantizer(min_=qmin, max_=qmax)


def scalar_transform(q: ScalarQuantizer, dataset) -> jnp.ndarray:
    x = jnp.asarray(dataset, jnp.float32)
    scale = 255.0 / jnp.maximum(q.max_ - q.min_, 1e-30)
    v = jnp.clip(jnp.round((x - q.min_) * scale) - 128.0, -128, 127)
    return v.astype(jnp.int8)


def scalar_inverse_transform(q: ScalarQuantizer, codes) -> jnp.ndarray:
    scale = jnp.maximum(q.max_ - q.min_, 1e-30) / 255.0
    return (jnp.asarray(codes, jnp.float32) + 128.0) * scale + q.min_


# ----------------------------------------------------------------------------
# binary 1-bit
# ----------------------------------------------------------------------------

@flax.struct.dataclass
class BinaryQuantizer:
    threshold: jnp.ndarray  # [dim]


def binary_train(dataset, threshold: str = "zero", sampling_ratio: float = 0.1,
                 seed: int = 0) -> BinaryQuantizer:
    """threshold in {"zero", "mean", "sampling_median"} (binary.hpp:31-41)."""
    x = jnp.asarray(dataset, jnp.float32)
    d = x.shape[1]
    if threshold == "zero":
        t = jnp.zeros((d,), jnp.float32)
    elif threshold == "mean":
        t = jnp.mean(x, axis=0)
    elif threshold == "sampling_median":
        n = x.shape[0]
        m = max(1, int(n * sampling_ratio))
        idx = jax.random.choice(jax.random.PRNGKey(seed), n, (m,), replace=False)
        t = jnp.median(x[idx], axis=0)
    else:
        raise ValueError(threshold)
    return BinaryQuantizer(threshold=t)


def binary_transform(q: BinaryQuantizer, dataset) -> jnp.ndarray:
    """-> packed uint8 bits [n, ceil(dim/8)] (BitwiseHamming-ready)."""
    x = jnp.asarray(dataset, jnp.float32)
    bits = x > q.threshold[None, :]
    n, d = bits.shape
    pad = (-d) % 8
    b = jnp.pad(bits, ((0, 0), (0, pad)))
    b = b.reshape(n, -1, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(b.astype(jnp.uint8) * weights, axis=-1, dtype=jnp.uint8)


# ----------------------------------------------------------------------------
# product quantizer (standalone)
# ----------------------------------------------------------------------------

@flax.struct.dataclass
class PQQuantizer:
    codebooks: jnp.ndarray  # [pq_dim, book, pq_len]
    dim: int = flax.struct.field(pytree_node=False, default=0)


def pq_train(
    dataset, pq_dim: int, pq_bits: int = 8, n_iters: int = 25, seed: int = 0
) -> PQQuantizer:
    from cuvs_tpu.neighbors.ivf_pq import _train_codebooks

    x = jnp.asarray(dataset, jnp.float32)
    n, dim = x.shape
    pq_len = -(-dim // pq_dim)
    pad = pq_dim * pq_len - dim
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    sub = xp.reshape(n, pq_dim, pq_len).transpose(1, 0, 2)
    books = _train_codebooks(jax.random.PRNGKey(seed), sub, 1 << pq_bits, n_iters)
    return PQQuantizer(codebooks=books, dim=dim)


def pq_transform(q: PQQuantizer, dataset) -> jnp.ndarray:
    from cuvs_tpu.neighbors.ivf_pq import _encode

    x = jnp.asarray(dataset, jnp.float32)
    pq_dim, _, pq_len = q.codebooks.shape
    pad = pq_dim * pq_len - x.shape[1]
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    return _encode(xp, q.codebooks)


def pq_inverse_transform(q: PQQuantizer, codes) -> jnp.ndarray:
    pq_dim, book, pq_len = q.codebooks.shape
    c = jnp.asarray(codes, jnp.int32)
    rec = q.codebooks[jnp.arange(pq_dim)[None, :], c, :]  # [n, pq_dim, pq_len]
    return rec.reshape(c.shape[0], -1)[:, : q.dim]


# ----------------------------------------------------------------------------
# VPQ: vector quantization (coarse) + product quantization (residual)
# ----------------------------------------------------------------------------

@flax.struct.dataclass
class VPQQuantizer:
    """VQ+PQ compressed dataset codec (cuVS ``vpq_params``/``vpq_dataset``,
    /root/reference/cpp/include/cuvs/neighbors/common.hpp:46-101, :411;
    built by vpq_build, consumed by CAGRA compression)."""

    vq_centers: jnp.ndarray  # [vq_n_centers, dim]
    pq: PQQuantizer  # residual codebooks


def vpq_train(
    dataset,
    vq_n_centers: int = 256,
    pq_dim: int = 0,
    pq_bits: int = 8,
    kmeans_n_iters: int = 25,
    seed: int = 0,
) -> VPQQuantizer:
    from cuvs_tpu.cluster import kmeans_balanced

    x = jnp.asarray(dataset, jnp.float32)
    n, dim = x.shape
    pq_dim = pq_dim or max(1, dim // 4)
    vq = kmeans_balanced.fit(
        x, min(vq_n_centers, n),
        kmeans_balanced.BalancedParams(
            n_clusters=min(vq_n_centers, n), n_iters=kmeans_n_iters, seed=seed
        ),
    )
    labels = kmeans_balanced.predict(x, vq)
    res = x - vq[labels]
    pqq = pq_train(res, pq_dim, pq_bits, n_iters=kmeans_n_iters, seed=seed)
    return VPQQuantizer(vq_centers=vq, pq=pqq)


def vpq_encode(q: VPQQuantizer, dataset):
    """-> (vq_codes [n] int32, pq_codes [n, pq_dim] uint8)."""
    from cuvs_tpu.cluster import kmeans_balanced

    x = jnp.asarray(dataset, jnp.float32)
    labels = kmeans_balanced.predict(x, q.vq_centers)
    res = x - q.vq_centers[labels]
    return labels.astype(jnp.int32), pq_transform(q.pq, res)


def vpq_decode(q: VPQQuantizer, vq_codes, pq_codes):
    return q.vq_centers[jnp.asarray(vq_codes)] + pq_inverse_transform(q.pq, pq_codes)

"""PCA: fit / transform / inverse_transform.

Reference: /root/reference/cpp/include/cuvs/preprocessing/pca.hpp:23-178
(params{n_components}; eigendecomposition via RAFT).

TPU-native: covariance is one MXU matmul; the eigensolve runs through
XLA's eigh on the [d, d] covariance (d is small relative to n).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
from jax import lax

from cuvs_tpu.distance.pairwise import matmul_precision


@flax.struct.dataclass
class PCA:
    mean: jnp.ndarray  # [d]
    components: jnp.ndarray  # [n_components, d] (rows = principal axes)
    explained_variance: jnp.ndarray  # [n_components]


def fit(dataset, n_components: int) -> PCA:
    x = jnp.asarray(dataset, jnp.float32)
    n, d = x.shape
    if not (1 <= n_components <= d):
        raise ValueError(f"n_components must be in [1, {d}]")
    mean = jnp.mean(x, axis=0)
    xc = x - mean[None, :]
    cov = lax.dot_general(
        xc, xc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(jnp.float32),
    ) / jnp.maximum(n - 1, 1)
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    order = jnp.argsort(-evals)[:n_components]
    return PCA(
        mean=mean,
        components=evecs[:, order].T,
        explained_variance=evals[order],
    )


def transform(p: PCA, dataset) -> jnp.ndarray:
    x = jnp.asarray(dataset, jnp.float32)
    return (x - p.mean[None, :]) @ p.components.T


def inverse_transform(p: PCA, projected) -> jnp.ndarray:
    z = jnp.asarray(projected, jnp.float32)
    return z @ p.components + p.mean[None, :]

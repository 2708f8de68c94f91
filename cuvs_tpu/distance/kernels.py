"""Dot-product kernel (gram) matrices and kernel density estimation.

Reference: ``cuvs::distance::kernels`` — LINEAR/POLYNOMIAL/RBF/TANH gram
matrices (/root/reference/cpp/include/cuvs/distance/grammian.hpp:256-344,
KernelType distance.hpp:103) and ``kde()`` with 6 density kernels
(DensityKernelType distance.hpp:93-99; include/cuvs/distance/kde.hpp:48).
"""

from __future__ import annotations

import enum
import math
from typing import Optional

import jax.numpy as jnp

from cuvs_tpu.distance.pairwise import (
    DistanceType,
    pairwise_distance,
    _gemm,
)


class KernelType(enum.IntEnum):
    LINEAR = 0
    POLYNOMIAL = 1
    RBF = 2
    TANH = 3


def gram_matrix(
    x,
    y=None,
    kernel: KernelType = KernelType.LINEAR,
    gamma: float = 1.0,
    coef0: float = 0.0,
    degree: int = 3,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """K(x_i, y_j) for the four grammian kernels (grammian.hpp:103-127)."""
    x = jnp.asarray(x, jnp.float32)
    y = x if y is None else jnp.asarray(y, jnp.float32)
    if kernel == KernelType.RBF:
        d2 = pairwise_distance(x, y, metric=DistanceType.L2Expanded,
                               compute_dtype=compute_dtype)
        return jnp.exp(-gamma * d2)
    dots = _gemm(x, y, compute_dtype)
    if kernel == KernelType.LINEAR:
        return dots
    if kernel == KernelType.POLYNOMIAL:
        return jnp.power(gamma * dots + coef0, degree)
    if kernel == KernelType.TANH:
        return jnp.tanh(gamma * dots + coef0)
    raise ValueError(kernel)


class DensityKernelType(enum.IntEnum):
    """Mirrors cuvs DensityKernelType (distance.hpp:93-99)."""

    Gaussian = 0
    Tophat = 1
    Epanechnikov = 2
    Exponential = 3
    Linear = 4
    Cosine = 5


def kde(
    x,
    samples,
    bandwidth: float = 1.0,
    kernel: DensityKernelType = DensityKernelType.Gaussian,
    metric="euclidean",
) -> jnp.ndarray:
    """Kernel density estimate of ``x`` rows over ``samples`` (kde.hpp:48).

    Returns unnormalized density sums per query row (matching the
    reference, which leaves normalization to the caller).
    """
    d = pairwise_distance(x, samples, metric=metric) / bandwidth
    k = DensityKernelType(kernel)
    if k == DensityKernelType.Gaussian:
        w = jnp.exp(-0.5 * d * d)
    elif k == DensityKernelType.Tophat:
        w = (d < 1.0).astype(jnp.float32)
    elif k == DensityKernelType.Epanechnikov:
        w = jnp.maximum(1.0 - d * d, 0.0)
    elif k == DensityKernelType.Exponential:
        w = jnp.exp(-d)
    elif k == DensityKernelType.Linear:
        w = jnp.maximum(1.0 - d, 0.0)
    elif k == DensityKernelType.Cosine:
        w = jnp.where(d < 1.0, jnp.cos(0.5 * math.pi * d), 0.0)
    else:
        raise ValueError(kernel)
    return jnp.sum(w, axis=1)

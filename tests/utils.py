"""Shared test utilities: naive k-NN ground truth + recall evaluation.

Mirrors the reference test strategy (SURVEY.md §4): every ANN test compares
against exact k-NN (/root/reference/cpp/tests/neighbors/naive_knn.cuh:95)
and asserts recall >= min_recall with tie-tolerant matching
(/root/reference/cpp/tests/neighbors/ann_utils.cuh:130-290).
"""

from __future__ import annotations

import numpy as np


def naive_knn(queries, dataset, k, metric="sqeuclidean", p=2.0):
    """Exact k-NN in numpy. Returns (dists [nq,k], ids [nq,k])."""
    q = np.asarray(queries, np.float64)
    x = np.asarray(dataset, np.float64)
    if metric in ("sqeuclidean", "euclidean", "l2"):
        d = (
            (q * q).sum(1)[:, None]
            + (x * x).sum(1)[None, :]
            - 2.0 * q @ x.T
        )
        d = np.maximum(d, 0)
        if metric in ("euclidean", "l2"):
            d = np.sqrt(d)
        order_min = True
    elif metric in ("inner_product", "dot"):
        d = q @ x.T
        order_min = False
    elif metric == "cosine":
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        xn = np.linalg.norm(x, axis=1, keepdims=True)
        d = 1.0 - (q @ x.T) / np.maximum(qn * xn.T, 1e-30)
        order_min = True
    else:
        raise ValueError(metric)
    if order_min:
        ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    else:
        ids = np.argsort(-d, axis=1, kind="stable")[:, :k]
    dists = np.take_along_axis(d, ids, axis=1)
    return dists.astype(np.float32), ids.astype(np.int64)


def calc_recall(found_ids, gt_ids, found_dists=None, gt_dists=None, eps=1e-3):
    """Fraction of ground-truth neighbors recovered, tie-tolerant.

    A found id counts if it appears in the gt row, OR if its distance ties
    the k-th gt distance within eps (distance-epsilon forgiveness,
    ann_utils.cuh:219).
    """
    found_ids = np.asarray(found_ids)
    gt_ids = np.asarray(gt_ids)
    nq, k = gt_ids.shape
    hits = 0
    for i in range(nq):
        row_gt = set(int(g) for g in gt_ids[i])
        for j in range(k):
            f = int(found_ids[i, j])
            if f in row_gt:
                hits += 1
            elif found_dists is not None and gt_dists is not None:
                if abs(float(found_dists[i, j]) - float(gt_dists[i, -1])) <= eps * max(
                    1.0, abs(float(gt_dists[i, -1]))
                ):
                    hits += 1
    return hits / float(nq * k)


def make_blobs(rng, n, dim, n_centers=10, scale=1.0, dtype=np.float32):
    """Gaussian blob dataset (the reference tests use uniform/blob data)."""
    centers = rng.standard_normal((n_centers, dim)) * 5.0
    labels = rng.integers(0, n_centers, n)
    x = centers[labels] + rng.standard_normal((n, dim)) * scale
    return x.astype(dtype)

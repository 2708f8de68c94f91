"""Exact ground-truth generation with an unfused cross-check.

The reference's discipline: every recall figure is measured against an
EXACT brute-force ground truth (naive_knn.cuh:95; cuvs_bench
generate_groundtruth). The fused exact kernel (k masked-max rounds per
tile, f32 HIGHEST matmul) is mathematically exact and ~50x cheaper than
the unfused distance-matrix path; a small unfused cross-check guards
against kernel regressions — disagreement beyond distance ties falls
back to the unfused result, so a soft GT can never soften a recall claim.
"""

from __future__ import annotations

import sys

import numpy as np


def _id_recall(found, gt):
    return float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / gt.shape[1]
        for a, b in zip(found, gt)
    ]))


def exact_ground_truth(bf_index, queries, k: int, ncheck: int = 256,
                       verbose: bool = True):
    """Exact top-k ids for ``queries`` against a brute_force index.

    Runs the fused exact f32 kernel over the full batch, then cross-checks
    ``ncheck`` queries against the unfused path: ids must agree to >=99.5%
    and the sorted k-th distances to rtol 1e-3 (tie-level id discrepancies
    are fine — the reference's eval_neighbours applies the same
    distance-epsilon forgiveness, ann_utils.cuh:219). On disagreement the
    FULL batch falls back to the unfused exact path.
    """
    import jax.numpy as jnp

    from cuvs_tpu.neighbors import brute_force

    try:
        gtd, gti = brute_force.search(bf_index, queries, k, fused=True,
                                      compute_dtype=jnp.float32)
        gti, gtd = np.asarray(gti), np.asarray(gtd)
        nc = min(ncheck, queries.shape[0])
        refd, ref = brute_force.search(bf_index, queries[:nc], k)
        agree = _id_recall(gti[:nc], np.asarray(ref))
        dist_ok = np.allclose(np.sort(gtd[:nc], 1),
                              np.sort(np.asarray(refd), 1),
                              rtol=1e-3, atol=1e-4)
        if agree >= 0.995 and dist_ok:
            return gti
        if verbose:
            print(f"# fused GT disagrees with unfused (ids {agree:.4f}, "
                  f"dist_ok={dist_ok}); falling back", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        if verbose:
            print(f"# fused GT failed ({type(e).__name__}: {e}); unfused",
                  file=sys.stderr)
    _, gti = brute_force.search(bf_index, queries, k)
    return np.asarray(gti)

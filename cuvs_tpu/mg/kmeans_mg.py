"""Multi-chip k-means: per-shard partial sums + mesh psum.

Reference: MG k-means (/root/reference/cpp/src/cluster/detail/kmeans_mg.cuh
— per-rank partial sums with NCCL allreduce of weights/centroids/cost at
:262,310,394,474,622,629,718).

TPU-native: the Lloyd loop runs inside ``shard_map``; each shard assigns
its rows with the fused MXU argmin, computes local segment sums, and the
allreduce is one ``lax.psum`` over the ICI mesh axis. Identical math to
single-chip kmeans, so centers are bitwise-comparable modulo reduction
order.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuvs_tpu.distance.pairwise import matmul_precision


def fit(
    x,
    n_clusters: int,
    mesh: Optional[Mesh] = None,
    max_iter: int = 50,
    tol: float = 1e-4,
    seed: int = 0,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed Lloyd k-means over the mesh. Returns (centers, inertia)."""
    if mesh is None:
        from cuvs_tpu.mg.snmg import default_mesh

        mesh = default_mesh()
    # multi-slice meshes: a >1-axis mesh (e.g. ('dcn', 'ici')) shards
    # over the FLATTENED axes — XLA routes the intra-slice legs of the
    # merge all_gather over ICI and the cross-slice legs over DCN; lay
    # the ICI axis innermost (kmeans_mg.cuh multi-node analog)
    axis = mesh.axis_names[0] if len(mesh.axis_names) == 1 else tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape

    # pad rows to a multiple of the mesh, with zero weight for padding
    pad = (-n) % n_dev
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    wp = jnp.pad(jnp.ones((n,), jnp.float32), ((0, pad),))

    # kmeans++ seeding on a host-local subsample (cheap), then distributed EM
    from cuvs_tpu.cluster.kmeans import _kmeans_pp_init

    key = jax.random.PRNGKey(seed)
    k_sub, k_init = jax.random.split(key)
    m = min(n, max(n_clusters * 32, 4096))
    sub = x[jax.random.choice(k_sub, n, (m,), replace=False)]
    centers0 = _kmeans_pp_init(k_init, sub, n_clusters)

    xs = jax.device_put(xp, NamedSharding(mesh, P(axis, None)))
    ws = jax.device_put(wp, NamedSharding(mesh, P(axis)))

    @jax.jit
    def run(xs, ws, centers0):
        def shard_fit(xl, wl, c0):
            def body(state):
                centers, _, inertia, it = state
                dots = lax.dot_general(
                    xl.astype(compute_dtype),
                    centers.astype(compute_dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=matmul_precision(compute_dtype),
                )
                cn = jnp.sum(centers * centers, axis=1)
                dist = cn[None, :] - 2.0 * dots
                labels = jnp.argmin(dist, axis=1)
                xn = jnp.sum(xl * xl, axis=1)
                mind = jnp.maximum(xn + jnp.min(dist, axis=1), 0.0)
                # local partials -> psum over the mesh (== NCCL allreduce)
                sums = lax.psum(
                    jax.ops.segment_sum(xl * wl[:, None], labels, n_clusters), axis
                )
                counts = lax.psum(jax.ops.segment_sum(wl, labels, n_clusters), axis)
                cost = lax.psum(jnp.sum(mind * wl), axis)
                new = sums / jnp.maximum(counts, 1e-12)[:, None]
                new = jnp.where(counts[:, None] > 0, new, centers)
                return new, inertia, cost, it + 1

            def cond(state):
                _, prev, cur, it = state
                rel = jnp.abs(prev - cur) / jnp.maximum(prev, 1e-30)
                return jnp.logical_and(
                    it < max_iter, jnp.logical_or(it < 2, rel > tol)
                )

            centers, _, inertia, _ = lax.while_loop(
                cond, body, (c0, jnp.float32(jnp.inf), jnp.float32(jnp.inf), 0)
            )
            return centers, inertia

        return jax.shard_map(
            shard_fit,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(xs, ws, centers0)

    return run(xs, ws, centers0)

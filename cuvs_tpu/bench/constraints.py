"""Constraint hooks for YAML param sweeps.

Reference: python/cuvs_bench/cuvs_bench/config/algos/constraints/__init__.py
— callables named in each algo YAML under ``constraints:``, invoked per
parameter combination to drop invalid ones before running. Signatures
match the reference: build hooks get (params, dims); search hooks get
(params, build_params, k, batch_size).
"""

from __future__ import annotations


def ivf_pq_build(params, dims):
    if params.get("pq_dim", 0) and params["pq_dim"] > dims:
        return False
    if "pq_bits" in params and not (4 <= params["pq_bits"] <= 8):
        return False
    return True


def ivf_pq_search(params, build_params, k, batch_size):
    # refine needs enough PQ candidates to re-rank
    ratio = params.get("refine_ratio", 1.0)
    return ratio >= 1.0


def cagra_build(params, dims):
    g = params.get("graph_degree")
    ig = params.get("intermediate_graph_degree")
    if g is not None and ig is not None:
        return g <= ig
    return True


def cagra_search(params, build_params, k, batch_size):
    itopk = params.get("itopk_size", 64)
    return itopk >= k


def ivf_flat_build(params, dims):
    return params.get("n_lists", 1) >= 1


def ivf_rabitq_build(params, dims):
    return 1 <= params.get("bits_per_dim", 3) <= 9


def resolve(path: str):
    """Dotted-name lookup (``cuvs_tpu.bench.constraints.cagra_build``)."""
    import importlib

    mod_name, fn_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(mod_name), fn_name)

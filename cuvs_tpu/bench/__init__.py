from cuvs_tpu.bench import datasets, runner

__all__ = ["datasets", "runner"]

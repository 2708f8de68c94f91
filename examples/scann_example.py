"""ScaNN build + asset export example (examples/cpp/src/scann_example.cu
analog).

Build a ScaNN-style index (AVQ partitioning + SOAR spilling + PQ
residuals) and export the reference's asset-directory layout
(scann_serialize.cuh byte format) for consumption by CPU ScaNN tooling.
Run: PYTHONPATH=. python examples/scann_example.py
"""

import os
import tempfile

import numpy as np

from cuvs_tpu.neighbors import scann


def main():
    rng = np.random.default_rng(0)
    dataset = rng.standard_normal((30_000, 64)).astype(np.float32)

    index = scann.build(
        dataset,
        n_lists=64,          # partitions
        pq_dim=16,           # PQ subspaces for the residual codes
        soar_lambda=1.5,     # SOAR secondary-assignment spilling
        reordering_bf16=True,  # keep a bf16 copy for exact re-ranking
        seed=0,
    )
    spilled = int(np.sum(np.asarray(index.soar_labels) != np.asarray(index.labels)))
    print(f"built: {index.size} rows, {index.centers.shape[0]} partitions, "
          f"{spilled} SOAR spills")

    with tempfile.TemporaryDirectory() as d:
        scann.serialize(index, d)
        print("assets:", sorted(os.listdir(d)))
        index2 = scann.deserialize(d)
    assert np.array_equal(index.labels, index2.labels)
    print("asset directory round-trips")


if __name__ == "__main__":
    main()

from cuvs_tpu.io.native import (
    BinDataset,
    load_bin,
    write_bin,
    native_available,
)

__all__ = ["BinDataset", "load_bin", "write_bin", "native_available"]

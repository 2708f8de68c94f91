import numpy as np
import pytest

from cuvs_tpu import io as cio


def test_native_built():
    assert cio.native_available(), "libcuvs_tpu_native.so missing — run make -C native"


@pytest.mark.parametrize("ext,dtype", [(".fbin", np.float32), (".u8bin", np.uint8),
                                       (".ibin", np.int32), (".i8bin", np.int8)])
def test_roundtrip(tmp_path, ext, dtype):
    rng = np.random.default_rng(0)
    if dtype == np.float32:
        x = rng.standard_normal((1000, 17)).astype(dtype)
    else:
        x = rng.integers(0, 100, (1000, 17)).astype(dtype)
    p = str(tmp_path / f"data{ext}")
    cio.write_bin(p, x)
    with cio.BinDataset(p) as d:
        assert d.shape == (1000, 17)
        np.testing.assert_array_equal(d.read(), x)
        np.testing.assert_array_equal(d.read(100, 50), x[100:150])
        # threaded path
        np.testing.assert_array_equal(d.read(0, 1000, n_threads=4), x)


def test_batches(tmp_path):
    x = np.arange(100 * 4, dtype=np.float32).reshape(100, 4)
    p = str(tmp_path / "b.fbin")
    cio.write_bin(p, x)
    with cio.BinDataset(p) as d:
        got = np.concatenate(list(d.batches(33)), axis=0)
    np.testing.assert_array_equal(got, x)


def test_out_of_bounds(tmp_path):
    x = np.zeros((10, 4), np.float32)
    p = str(tmp_path / "o.fbin")
    cio.write_bin(p, x)
    with cio.BinDataset(p) as d:
        with pytest.raises(IndexError):
            d.read(5, 10)


def test_corrupt_header_rejected(tmp_path):
    p = tmp_path / "bad.fbin"
    # header claims 1M rows but file is tiny
    with open(p, "wb") as f:
        np.asarray([1_000_000, 128], np.int32).tofile(f)
        np.zeros(10, np.float32).tofile(f)
    with pytest.raises(OSError):
        cio.BinDataset(str(p))


def test_batch_queue_native():
    import ctypes
    from cuvs_tpu.io.native import _load_lib

    lib = _load_lib()
    assert lib
    lib.cuvs_tpu_queue_create.restype = ctypes.c_void_p
    lib.cuvs_tpu_queue_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.cuvs_tpu_queue_push.restype = ctypes.c_int64
    lib.cuvs_tpu_queue_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int64, ctypes.c_int64]
    lib.cuvs_tpu_queue_pop_batch.restype = ctypes.c_int64
    lib.cuvs_tpu_queue_pop_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                             ctypes.c_void_p, ctypes.c_int64,
                                             ctypes.c_int64]
    lib.cuvs_tpu_queue_destroy.argtypes = [ctypes.c_void_p]

    q = lib.cuvs_tpu_queue_create(64, 4)
    rows = np.arange(12, dtype=np.float32).reshape(3, 4)
    n = lib.cuvs_tpu_queue_push(q, rows.ctypes.data_as(ctypes.c_void_p), 3, 7)
    assert n == 3
    out = np.zeros((8, 4), np.float32)
    tickets = np.zeros(8, np.int64)
    got = lib.cuvs_tpu_queue_pop_batch(
        q, out.ctypes.data_as(ctypes.c_void_p),
        tickets.ctypes.data_as(ctypes.c_void_p), 8, 1000,
    )
    assert got == 3
    np.testing.assert_array_equal(out[:3], rows)
    assert (tickets[:3] == 7).all()
    # empty pop times out quickly with 0
    got = lib.cuvs_tpu_queue_pop_batch(
        q, out.ctypes.data_as(ctypes.c_void_p),
        tickets.ctypes.data_as(ctypes.c_void_p), 8, 1000,
    )
    assert got == 0
    lib.cuvs_tpu_queue_destroy(q)

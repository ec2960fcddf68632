"""Native C++ npy loader tests (builds with g++ on first use)."""

import numpy as np
import pytest

from deepfepe_tpu.data.native_loader import (
    BatchPrefetcher,
    load_npy,
    native_available,
)


@pytest.fixture
def npy_files(tmp_path, rng):
    arrays = {
        "f32": rng.rand(100, 5).astype(np.float32),
        "f64": rng.rand(7,).astype(np.float64),
        "i32": rng.randint(0, 100, (3, 4, 5)).astype(np.int32),
        "i64": rng.randint(0, 100, (6,)).astype(np.int64),
    }
    paths = {}
    for name, a in arrays.items():
        p = tmp_path / f"{name}.npy"
        np.save(p, a)
        paths[name] = str(p)
    return paths, arrays


def test_native_build():
    assert native_available(), "g++ build of npy_loader.cpp failed"


def test_load_npy_all_dtypes(npy_files):
    paths, arrays = npy_files
    for name in arrays:
        got = load_npy(paths[name])
        np.testing.assert_array_equal(got, arrays[name])
        assert got.dtype == arrays[name].dtype


def test_batch_prefetcher(npy_files):
    paths, arrays = npy_files
    pf = BatchPrefetcher()
    names = list(arrays)
    token = pf.submit([paths[n] for n in names])
    outs = pf.get(token)
    for n, got in zip(names, outs):
        np.testing.assert_array_equal(got, arrays[n])


def test_batch_prefetcher_many(tmp_path, rng):
    # Stress: 64 files through the pool.
    paths, refs = [], []
    for i in range(64):
        a = rng.rand(50, 4).astype(np.float32)
        p = tmp_path / f"m{i}.npy"
        np.save(p, a)
        paths.append(str(p))
        refs.append(a)
    pf = BatchPrefetcher()
    token = pf.submit(paths)
    outs = pf.get(token)
    for a, b in zip(refs, outs):
        np.testing.assert_array_equal(a, b)


def test_prefetch_batches_order_and_errors():
    from deepfepe_tpu.data.prefetch import prefetch_batches

    assert list(prefetch_batches(iter(range(20)), depth=3)) == list(range(20))

    def bad():
        yield 1
        yield 2
        raise ValueError("boom")

    out = []
    try:
        for x in prefetch_batches(bad(), depth=2):
            out.append(x)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "boom" in str(e)
    assert out == [1, 2]


def test_kitti_load_arr_uses_native(tmp_path):
    """_load_arr round-trips through the C++ parser when available."""
    import numpy as np

    from deepfepe_tpu.data.kitti import KittiCorrDataset
    from deepfepe_tpu.data.native_loader import native_available

    a = np.arange(24, dtype=np.float32).reshape(4, 6)
    np.save(tmp_path / "x.npy", a)
    ds = KittiCorrDataset.__new__(KittiCorrDataset)  # no crawl needed
    ds.use_h5 = False
    ds.cache_in_memory = False
    out = ds._load_arr(tmp_path / "x")
    np.testing.assert_array_equal(out, a)
    assert native_available() in (True, False)  # builds or falls back


def test_kitti_cache_in_memory_memoizes(tmp_path):
    """data.cache_in_memory (kitti_odo_corr.py:40): payload reads are
    memoized after first touch — same object back, no re-read."""
    import numpy as np

    from deepfepe_tpu.data.kitti import KittiCorrDataset

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.save(tmp_path / "y.npy", a)
    ds = KittiCorrDataset.__new__(KittiCorrDataset)
    ds.use_h5 = False
    ds.cache_in_memory = True
    ds._arr_cache = {}
    out1 = ds._load_arr(tmp_path / "y")
    np.testing.assert_array_equal(out1, a)
    # Mutate the file on disk: the cached array must still be served.
    np.save(tmp_path / "y.npy", a * 0)
    out2 = ds._load_arr(tmp_path / "y")
    assert out2 is out1
    np.testing.assert_array_equal(out2, a)

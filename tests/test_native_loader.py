"""Native C++ frame-loader tests (runtime/libframe_loader.so via ctypes)."""

import numpy as np
import pytest

from memory_augmented_vlm_tpu.data.native_loader import (
    NativeFrameLoader,
    native_available,
)


@pytest.fixture()
def npy_files(tmp_path):
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(6):
        arr = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        p = tmp_path / f"f{i}.npy"
        np.save(p, arr)
        paths.append(str(p))
        arrays.append(arr)
    return paths, arrays


def test_native_library_builds():
    assert native_available(), "runtime/libframe_loader.so failed to build"


def test_loads_all_files_correctly(npy_files):
    paths, arrays = npy_files
    with NativeFrameLoader(paths, num_threads=3, queue_cap=2) as loader:
        got = dict(iter(loader))
    assert sorted(got.keys()) == list(range(6))
    for i, arr in enumerate(arrays):
        np.testing.assert_allclose(got[i], arr, rtol=1e-6)


def test_uint8_and_f8_dtypes(tmp_path):
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 255, (3, 4, 4, 3), dtype=np.uint8)
    f8 = rng.standard_normal((2, 5)).astype(np.float64)
    np.save(tmp_path / "u8.npy", u8)
    np.save(tmp_path / "f8.npy", f8)
    with NativeFrameLoader([str(tmp_path / "u8.npy"), str(tmp_path / "f8.npy")],
                           num_threads=1) as loader:
        got = dict(iter(loader))
    np.testing.assert_allclose(got[0], u8.astype(np.float32))
    np.testing.assert_allclose(got[1], f8.astype(np.float32), rtol=1e-6)


def test_skips_unreadable_files(tmp_path, npy_files):
    paths, arrays = npy_files
    bad = tmp_path / "bad.npy"
    bad.write_bytes(b"not a npy")
    with NativeFrameLoader([paths[0], str(bad), paths[1]], num_threads=1) as loader:
        got = dict(iter(loader))
    assert set(got.keys()) == {0, 2}


def test_python_fallback(npy_files, monkeypatch):
    import memory_augmented_vlm_tpu.data.native_loader as nl

    paths, arrays = npy_files
    loader = NativeFrameLoader(paths[:2])
    loader._handle = None  # force fallback
    got = dict(iter(loader))
    np.testing.assert_allclose(got[0], arrays[0])

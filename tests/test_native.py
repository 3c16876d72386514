"""Native hostops tests: C++ and numpy paths must agree exactly."""

import numpy as np
import pytest

from contrast_gan_3d_tpu import native
from contrast_gan_3d_tpu.utils.geometry import trilinear_interpolate


def _crop_numpy_reference(volume, start, patch):
    out = np.zeros((*patch, volume.shape[3]), np.int16)
    W, H, D = volume.shape[:3]
    src, dst = [], []
    for s, p, dim in zip(start, patch, (W, H, D)):
        lo, hi = max(0, s), min(dim, s + p)
        src.append(slice(lo, hi))
        dst.append(slice(lo - s, lo - s + max(0, hi - lo)))
    if all(sl.stop > sl.start for sl in src):
        out[tuple(dst)] = volume[tuple(src)]
    return out


CASES = [
    ((0, 0, 0), (8, 8, 8)),        # interior
    ((-3, -2, -5), (8, 8, 8)),     # negative overhang
    ((15, 10, 9), (8, 8, 8)),      # right overhang
    ((-2, 5, 3), (30, 4, 4)),      # patch wider than volume
    ((100, 0, 0), (4, 4, 4)),      # fully outside
]


@pytest.mark.parametrize("start,patch", CASES)
def test_crop_pad_matches_reference(rng, start, patch):
    vol = rng.integers(-1024, 1500, (20, 16, 12, 2), dtype=np.int16)
    got = native.crop_pad_int16(vol, start, patch)
    np.testing.assert_array_equal(got, _crop_numpy_reference(vol, start, patch))


def test_crop_pad_from_memmap(tmp_path, rng):
    vol = rng.integers(-100, 100, (10, 10, 10, 2), dtype=np.int16)
    np.save(tmp_path / "v.npy", vol)
    mm = np.load(tmp_path / "v.npy", mmap_mode="r")
    got = native.crop_pad_int16(mm, (-1, 2, 3), (6, 6, 6))
    np.testing.assert_array_equal(got, _crop_numpy_reference(vol, (-1, 2, 3), (6, 6, 6)))


def test_trilinear_matches_numpy(rng):
    vol = rng.normal(size=(9, 8, 7)).astype(np.float32)
    xs = rng.uniform(-1, 9, 200)
    ys = rng.uniform(-1, 8, 200)
    zs = rng.uniform(-1, 7, 200)
    got = native.trilinear_f32(vol, xs, ys, zs)
    ref = trilinear_interpolate(vol, xs, ys, zs)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_native_builds_here():
    """The image ships g++ — the native path should actually be active."""
    assert native.has_native()


def test_crop_pad_rejects_bad_out_buffer(rng):
    vol = rng.integers(-1000, 1000, size=(12, 12, 12, 2), dtype=np.int16)
    with pytest.raises(AssertionError):
        native.crop_pad_int16(vol, (0, 0, 0), (8, 8, 8), out=np.empty((4, 4, 4, 2), np.int16))
    with pytest.raises(AssertionError):
        native.crop_pad_int16(vol, (0, 0, 0), (8, 8, 8), out=np.empty((8, 8, 8, 2), np.int32))
    with pytest.raises(AssertionError):
        native.crop_pad_int16(
            vol, (0, 0, 0), (8, 8, 8),
            out=np.empty((8, 8, 16, 2), np.int16)[:, :, ::2],
        )
    ok = np.empty((8, 8, 8, 2), np.int16)
    got = native.crop_pad_int16(vol, (0, 0, 0), (8, 8, 8), out=ok)
    assert got is ok
    np.testing.assert_array_equal(got, vol[:8, :8, :8])


def test_build_fast_path_waits_for_inflight_build(monkeypatch):
    """The unlocked fast path must not hand None to threads racing an
    in-flight build (native/__init__.py: _TRIED is only meaningful under
    the lock)."""
    import threading
    import time

    sentinel = object()
    entered = threading.Event()

    def slow_locked_build():
        # simulates the g++ window: _TRIED set, _LIB not yet published
        native._TRIED = True
        entered.set()
        time.sleep(0.2)
        native._LIB = sentinel
        return sentinel

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_build_and_load_locked", slow_locked_build)

    results = {}
    t_a = threading.Thread(target=lambda: results.setdefault("a", native._build_and_load()))
    t_a.start()
    entered.wait(timeout=5)
    # B arrives while A is mid-build: it must block on the lock and get the
    # library, not short-circuit on _TRIED and return None
    results["b"] = native._build_and_load()
    t_a.join(timeout=5)
    assert results["a"] is sentinel and results["b"] is sentinel

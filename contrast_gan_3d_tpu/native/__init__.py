"""Native (C++) host-side data ops with transparent numpy fallback.

Build-on-first-use: ``csrc/hostops.cpp`` compiles with ``g++ -O3 -shared``
into a per-user cache; loaded via ctypes (the image has no pybind11). If a
toolchain is unavailable the numpy implementations are used — same results,
same API. See ``csrc/hostops.cpp`` for why this exists (SURVEY.md §2: the
reference's host data path rides native wheels; this is our equivalent)."""

import ctypes
import hashlib
import os
import stat
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)

_SRC = Path(__file__).parent / "csrc" / "hostops.cpp"
_LIB = None
_TRIED = False
_BUILD_LOCK = threading.Lock()


def _build_and_load() -> Optional[ctypes.CDLL]:
    # the unlocked fast path may only short-circuit on a PUBLISHED library:
    # checking _TRIED here would hand None to threads racing an in-flight
    # build (worker B sees _TRIED=True while worker A is still in g++)
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        return _build_and_load_locked()


def _build_and_load_locked() -> Optional[ctypes.CDLL]:
    """Under _BUILD_LOCK: first native use comes from N concurrent prefetch
    worker threads — without the lock they all raced the same build."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CGAN3D_NO_NATIVE"):
        return None
    try:
        src = _SRC.read_bytes()
        # the cache key must include the host ISA: the build uses
        # -march=native, so a .so built on an AVX-512 node and loaded from a
        # shared $HOME on a non-AVX-512 node would SIGILL the whole process
        tag = hashlib.sha1(src + cpu_isa_tag().encode()).hexdigest()[:12]
        # per-user cache (0700): a world-writable shared dir such as
        # /tmp/cgan3d_native would let another local user pre-plant a
        # hostops_<tag>.so that CDLL then executes in our process
        default_cache = Path.home() / ".cache" / "cgan3d_native"
        cache = Path(os.environ.get("CGAN3D_NATIVE_CACHE", default_cache))
        cache.mkdir(parents=True, exist_ok=True)
        os.chmod(cache, 0o700)
        st = cache.stat()
        if st.st_uid != os.getuid() or (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
            raise RuntimeError(
                f"refusing native cache '{cache}': not owned by us or group/other-writable"
            )
        so_path = cache / f"hostops_{tag}.so"
        if not so_path.exists():
            # unique tmp per builder + atomic replace: concurrent PROCESSES
            # (parallel experiments, pytest workers) may build simultaneously
            # — a shared tmp name would let one rename the other's
            # half-written object into place and CDLL a corrupt library
            fd, tmp_name = tempfile.mkstemp(
                dir=cache, prefix=f"hostops_{tag}.", suffix=".tmp.so"
            )
            os.close(fd)
            tmp = Path(tmp_name)
            base = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                    str(_SRC), "-o", str(tmp)]
            try:
                try:  # OpenMP: the warp slab-splits one patch across cores
                    subprocess.run(base[:1] + ["-fopenmp"] + base[1:],
                                   check=True, capture_output=True)
                except subprocess.CalledProcessError:
                    subprocess.run(base, check=True, capture_output=True)
                os.replace(tmp, so_path)
            finally:
                tmp.unlink(missing_ok=True)
            logger.info("Built native hostops -> %s", so_path)
        so_st = so_path.stat()
        if so_st.st_uid != os.getuid() or (so_st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
            raise RuntimeError(f"refusing to load '{so_path}': not ours or writable by others")
        lib = ctypes.CDLL(str(so_path))
        lib.crop_pad_int16.restype = ctypes.c_long
        lib.crop_pad_int16.argtypes = [
            ctypes.c_void_p, *([ctypes.c_long] * 10), ctypes.c_void_p,
        ]
        lib.trilinear_f32.restype = None
        lib.trilinear_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_void_p,
        ]
        lib.warp_num_threads.restype = ctypes.c_long
        lib.warp_num_threads.argtypes = []
        lib.warp_augment_int16.restype = None
        lib.warp_augment_int16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.warp_augment2d_int16.restype = None
        lib.warp_augment2d_int16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception as e:  # no toolchain / build failure -> numpy fallback
        logger.warning("Native hostops unavailable (%s); using numpy fallback", e)
    return _LIB


def cpu_isa_tag() -> str:
    """Host CPU feature fingerprint (the 'flags' line on linux; platform
    string elsewhere) — part of the build-cache key because of -march=native."""
    try:
        with open("/proc/cpuinfo") as fd:
            for line in fd:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(
                        " ".join(sorted(line.split(":", 1)[1].split())).encode()
                    ).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return f"{platform.machine()}-{platform.processor()}"


def has_native() -> bool:
    return _build_and_load() is not None


def warp_num_threads() -> int:
    """Host cores one warp call slab-splits across (OpenMP; respects
    OMP_NUM_THREADS). 1 when the library was built without OpenMP."""
    lib = _build_and_load()
    return int(lib.warp_num_threads()) if lib is not None else 1


def crop_pad_int16(
    volume: np.ndarray, start, patch_size, out: Optional[np.ndarray] = None
) -> np.ndarray:
    """Crop a zero-padded (px, py, pz, C) int16 window whose ``start`` may be
    negative / overhang the (W, H, D, C) ``volume``. ``volume`` may be any
    sliceable array-like (np memmap, h5py dataset) — only contiguous ndarrays
    take the native path; everything else gets the windowed-read fallback."""
    assert volume.ndim == 4 and volume.dtype == np.int16
    px, py, pz = (int(p) for p in patch_size)
    C = volume.shape[3]
    if out is None:
        out = np.empty((px, py, pz, C), np.int16)
    else:
        # the native path memsets+writes px*py*pz*C int16s through out's raw
        # pointer — a wrong-shape/dtype/non-contiguous buffer is heap
        # corruption, not a python error, so validate it like `volume`
        assert (
            out.shape == (px, py, pz, C)
            and out.dtype == np.int16
            and out.flags["C_CONTIGUOUS"]
        ), f"out must be C-contiguous int16 {(px, py, pz, C)}"
    lib = _build_and_load()
    if (
        lib is not None
        and isinstance(volume, np.ndarray)
        and volume.flags["C_CONTIGUOUS"]
    ):
        lib.crop_pad_int16(
            volume.ctypes.data,
            *(int(d) for d in volume.shape),
            int(start[0]), int(start[1]), int(start[2]),
            px, py, pz,
            out.ctypes.data,
        )
        return out
    # numpy fallback
    out[:] = 0
    W, H, D = volume.shape[:3]
    src_sl, dst_sl = [], []
    for s, p, dim in zip(start, (px, py, pz), (W, H, D)):
        lo, hi = max(0, int(s)), min(dim, int(s) + p)
        src_sl.append(slice(lo, hi))
        dst_sl.append(slice(lo - int(s), lo - int(s) + max(0, hi - lo)))
    if all(sl.stop > sl.start for sl in src_sl):
        out[tuple(dst_sl)] = volume[tuple(src_sl)]
    return out


def warp_augment_int16(
    scan: np.ndarray,
    seg: np.ndarray,
    affine: np.ndarray,
    coarse_field: Optional[np.ndarray] = None,
    amplitude: Optional[np.ndarray] = None,
):
    """Fused spatial-augmentation warp of one (W, H, D) int16 scan + mask
    pair: ``src = affine @ (dst - center) + center + amp * elastic(dst)``,
    trilinear for the scan, nearest for the mask (see csrc/hostops.cpp).
    Requires the native library (call :func:`has_native` first)."""
    lib = _build_and_load()
    assert lib is not None, "native hostops unavailable"
    scan = np.ascontiguousarray(scan, np.int16)
    seg = np.ascontiguousarray(seg, np.int16)
    affine = np.ascontiguousarray(affine, np.float32)
    assert affine.shape == (3, 3)
    out_scan = np.empty_like(scan)
    out_seg = np.empty_like(seg)
    if coarse_field is not None:
        coarse_field = np.ascontiguousarray(coarse_field, np.float32)
        G = coarse_field.shape[0]
        assert coarse_field.shape == (G, G, G, 3)
        amp = np.ascontiguousarray(amplitude, np.float32)
        cf_ptr, amp_ptr = coarse_field.ctypes.data, amp.ctypes.data
    else:
        G, cf_ptr, amp_ptr = 0, None, None
    lib.warp_augment_int16(
        scan.ctypes.data, seg.ctypes.data,
        *(int(d) for d in scan.shape),
        affine.ctypes.data, cf_ptr, G, amp_ptr,
        out_scan.ctypes.data, out_seg.ctypes.data,
    )
    return out_scan, out_seg


def warp_augment2d_int16(scan: np.ndarray, seg: np.ndarray, affine: np.ndarray):
    """2D spatial-augmentation warp of one (W, H) int16 slice + mask pair:
    ``src = affine @ (dst - center) + center`` (rotation with mirror folded
    into the 2x2), bilinear scan / nearest mask with the device 2D sampling
    conventions (ops/resample.py). Requires the native library."""
    lib = _build_and_load()
    assert lib is not None, "native hostops unavailable"
    scan = np.ascontiguousarray(scan, np.int16)
    seg = np.ascontiguousarray(seg, np.int16)
    affine = np.ascontiguousarray(affine, np.float32)
    assert affine.shape == (2, 2) and scan.ndim == 2
    out_scan = np.empty_like(scan)
    out_seg = np.empty_like(seg)
    lib.warp_augment2d_int16(
        scan.ctypes.data, seg.ctypes.data,
        *(int(d) for d in scan.shape),
        affine.ctypes.data,
        out_scan.ctypes.data, out_seg.ctypes.data,
    )
    return out_scan, out_seg


def trilinear_f32(
    volume: np.ndarray, xs: np.ndarray, ys: np.ndarray, zs: np.ndarray
) -> np.ndarray:
    """Native trilinear interpolation; falls back to the numpy geometry
    engine when the library is unavailable."""
    lib = _build_and_load()
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    xs = np.ascontiguousarray(xs, dtype=np.float32).ravel()
    ys = np.ascontiguousarray(ys, dtype=np.float32).ravel()
    zs = np.ascontiguousarray(zs, dtype=np.float32).ravel()
    if lib is None:
        from contrast_gan_3d_tpu.utils.geometry import trilinear_interpolate

        return trilinear_interpolate(vol, xs, ys, zs).astype(np.float32)
    out = np.empty(xs.shape, np.float32)
    lib.trilinear_f32(
        vol.ctypes.data, *(int(d) for d in vol.shape),
        xs.ctypes.data, ys.ctypes.data, zs.ctypes.data,
        len(xs), out.ctypes.data,
    )
    return out

"""Offline preprocessing: one packed, memory-mappable array per patient.

Capability parity with reference ``contrast_gan_3D/data/utils.py:20-54``
(``create_patient`` / ``load_patient``): load the scan, rasterize its
centerlines into a binary mask, stack scan+mask into one (W, H, D, 2) int16
array saved as ``.npy`` plus a metadata pickle (spacing, offset, ostia,
centerlines, name). Training then random-crops patches straight out of the
memory-mapped file — only the cropped pages are read from disk.

Design departure from the reference: the packed array is int16 (scan) /
0-1 int16 (mask) rather than implicit float; HU scaling happens ON DEVICE in
the jitted train step, so host->HBM transfers ship int16 (half the bytes of
float32).
"""

import pickle
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from contrast_gan_3d_tpu.utils import geometry as geom
from contrast_gan_3d_tpu.utils import io_utils
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


def create_patient(
    ccta_path,
    centerlines_dir,
    ostia_path,
    out_dir,
    out_spacing=None,
    fmt: str = "npy",
    h5_chunks=None,
):
    """Preprocess one patient into ``<out_dir>/<name>.npy`` + ``<name>_meta.pkl``.

    ``out_spacing`` (scalar or per-axis mm, optional) resamples the scan onto
    an isotropic/uniform grid first (separable matmul resampler,
    ``ops/resample.py`` — BASELINE.json's "isotropic resampling" stage; the
    reference trains at native spacing, so the default keeps that). The
    centerline mask is rasterized on the FINAL grid from world coordinates —
    no mask interpolation artifacts.

    ``fmt="h5"`` writes HDF5 instead (``data/hdf5.py``); an ``out_dir``
    ending in ``.h5`` appends to that corpus file regardless of ``fmt`` and
    the returned path is the addressable ``corpus.h5::<name>`` member;
    ``h5_chunks`` overrides the HDF5 chunk shape (z-thin for 2D-slice
    corpora — ``hdf5.write_patient_h5``)."""
    logger.info("Preprocessing '%s'...", str(ccta_path))
    volume, meta = io_utils.load_scan(ccta_path)  # (W, H, D) int16
    ostia_world, _ = io_utils.load_mevis_coords(ostia_path)  # (2, 3)
    centerlines_world = io_utils.load_centerlines(centerlines_dir)  # (N, 4)

    if out_spacing is not None:
        from contrast_gan_3d_tpu.ops.resample import resample_volume

        out_spacing = np.broadcast_to(
            np.asarray(out_spacing, np.float64), (3,)
        ).copy()
        volume = resample_volume(volume, meta["spacing"], out_spacing)
        meta = dict(meta) | {"spacing": out_spacing}

    centerlines_mask = geom.world_to_grid_coords(
        centerlines_world[..., :3], meta["offset"], meta["spacing"], volume.shape
    )
    name = io_utils.stem(ccta_path)
    meta = dict(meta) | {
        "ostia_world": ostia_world,
        "centerlines_world": centerlines_world,
    }
    out_path = write_patient(
        volume, centerlines_mask, meta, name, out_dir, fmt=fmt, h5_chunks=h5_chunks
    )
    logger.info("Created patient '%s'", str(out_path))
    return out_path


def write_patient(
    volume: np.ndarray,
    centerlines_mask: np.ndarray,
    meta: Dict,
    name: str,
    out_dir,
    fmt: str = "npy",
    h5_chunks=None,
):
    """Lower-level variant of :func:`create_patient` for already-loaded data
    (used by tests and synthetic-data generation). ``fmt="h5"`` (or an
    ``out_dir`` that IS a ``.h5`` corpus file) stores HDF5; returns the
    addressable patient path either way. ``h5_chunks`` overrides the HDF5
    chunk shape (z-thin chunks for 2D-slice corpora — see
    ``hdf5.write_patient_h5``)."""
    out_dir = Path(out_dir)
    if fmt == "h5" or out_dir.suffix.lower() in (".h5", ".hdf5"):
        from contrast_gan_3d_tpu.data.hdf5 import write_patient_h5

        return write_patient_h5(
            volume, centerlines_mask, meta, name, out_dir, chunks=h5_chunks
        )
    assert fmt == "npy", f"unknown patient format {fmt!r}"
    out_dir = out_dir.resolve()
    out_dir.mkdir(parents=True, exist_ok=True)
    scan_and_mask = np.stack(
        [volume.astype(np.int16), centerlines_mask.astype(np.int16)], axis=-1
    )
    out_path = out_dir / f"{name}.npy"
    np.save(out_path, scan_and_mask)
    with open(out_dir / f"{name}_meta.pkl", "wb") as fd:
        pickle.dump(dict(meta) | {"name": name}, fd)
    return out_path


def load_patient(patient_path, h5_file_cache=None) -> Tuple[np.ndarray, Dict]:
    """mmap-load a preprocessed patient: ((W, H, D, 2) memmap, meta dict).
    ``patient_path`` may or may not carry the .npy suffix (reference
    ``load_patient``, data/utils.py:50-54). HDF5 patients (``*.h5`` files or
    ``corpus.h5::name`` members, ``data/hdf5.py``) return the windowed-read
    h5py dataset in place of the memmap — same slicing, same consumers;
    ``h5_file_cache`` shares one fd across a corpus file's members."""
    from contrast_gan_3d_tpu.data import hdf5

    if hdf5.is_hdf5_path(patient_path):
        return hdf5.open_patient_h5(patient_path, file_cache=h5_file_cache)
    path = str(patient_path)
    if path.endswith(".npy"):
        path = path[: -len(".npy")]
    data = np.load(path + ".npy", mmap_mode="r")
    with open(path + "_meta.pkl", "rb") as fd:
        meta = pickle.load(fd)
    return data, meta

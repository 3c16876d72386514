"""HU-distribution-shift evaluation.

Capability parity with reference ``eval/HU_distribution_shift.py``: for each
evaluation scan, gather the CCTA voxel intensities under three anatomical
masks — coronary centerlines, coronary ostia and (optionally) a myocardium
segmentation — then aggregate per ScanType. Comparing the distributions of
original vs corrected vs genuinely-optimal scans (KDE figure,
``utils/visualization.hu_distribution_shift_plot``) quantifies how far the
correction moves contrast toward the optimal 350-450 HU corridor. Host-side
numpy (masked gathers over full volumes are I/O-bound, not compute-bound);
patient fan-out uses a thread pool — the loads release the GIL, replacing the
reference's process pool."""

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from contrast_gan_3d_tpu.alias import PathLike, ScanType
from contrast_gan_3d_tpu.utils import geometry as geom
from contrast_gan_3d_tpu.utils import io_utils
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


def _point_mask_voxels(ccta, points_world, offset, spacing) -> np.ndarray:
    """HU values a ``world_to_grid_coords``-rasterized mask would gather,
    WITHOUT materializing the full-resolution grid (the rasterize-then-
    boolean-index route allocates two ~100 MB temporaries per mask per
    512x512x400 patient just to read a few thousand samples). Identical
    multiset AND order: boolean indexing scans the mask in C order = the
    lexicographic row order np.unique returns; coords that clip onto the
    same voxel dedupe exactly like the grid's idempotent writes."""
    img = np.unique(geom.world_to_image_coords(points_world, offset, spacing), axis=0)
    clipped = np.stack(
        [np.clip(img[:, i], 0, ccta.shape[i] - 1) for i in range(3)], axis=-1
    )
    clipped = np.unique(clipped, axis=0)
    return ccta[tuple(clipped.T)]


def collect_patient_voxels(
    scan_path: PathLike,
    centerline_path: PathLike,
    myocardium_path: Optional[PathLike] = None,
) -> Dict[str, np.ndarray]:
    """HU values under centerline / ostia / myocardium masks for one scan
    (reference ``collect_patient_voxels``, HU_distribution_shift.py:14-34)."""
    ccta, meta = io_utils.load_scan(scan_path)
    offset, spacing = meta["offset"], meta["spacing"]

    centerlines_world = io_utils.load_centerlines(centerline_path)[..., :3]
    ostia_world, _ = io_utils.load_mevis_coords(Path(centerline_path) / "ostia.xml")

    out = {
        "centerlines": _point_mask_voxels(ccta, centerlines_world, offset, spacing),
        "ostia": _point_mask_voxels(ccta, ostia_world, offset, spacing),
    }
    if myocardium_path is not None:
        myo, _ = io_utils.load_scan(myocardium_path, segmentation=True)
        out["myocardium"] = ccta[myo.astype(bool)]
    return out


def collect_voxels_intensity(
    evaluation_paths: Sequence[Tuple[Sequence[PathLike], int]],
    workers: int = 8,
) -> Dict[ScanType, Dict[str, np.ndarray]]:
    """Gather masked voxels for every (paths, label) pair and aggregate per
    ScanType (reference ``collect_voxels_intensity``, :54-74)."""
    labels = [label for _, label in evaluation_paths]
    logger.info(
        "Scans by label: %s",
        {ScanType(k).name: labels.count(k) for k in set(labels)},
    )
    def _one(a):
        # one unreadable patient must not abort the whole cohort sweep
        try:
            return a[1], collect_patient_voxels(*a[0])
        except Exception as e:
            logger.error("FAILED %r: %s", str(a[0][0]), e)
            return None

    with ThreadPoolExecutor(max_workers=workers) as pool:
        results = [r for r in pool.map(_one, evaluation_paths) if r is not None]
    if len(results) < len(evaluation_paths):
        logger.warning(
            "%d/%d patients failed and were skipped",
            len(evaluation_paths) - len(results), len(evaluation_paths),
        )

    grouped: Dict[ScanType, Dict[str, List[np.ndarray]]] = defaultdict(
        lambda: defaultdict(list)
    )
    for label, by_region in results:
        for region, vals in by_region.items():
            grouped[ScanType(label)][region].append(vals)
    out = {
        st: {region: np.concatenate(vs) for region, vs in d.items()}
        for st, d in grouped.items()
    }
    for st, d in out.items():
        for region, vals in d.items():
            logger.info("%s: %d voxels under %r", st.name, len(vals), region)
    return out


def summarize_hu_shift(
    voxels: Dict[ScanType, Dict[str, np.ndarray]]
) -> Dict[str, Dict[str, float]]:
    """Per-(ScanType, region) mean/std/median HU — the quantitative companion
    to the reference's KDE figure."""
    out: Dict[str, Dict[str, float]] = {}
    for st, by_region in voxels.items():
        for region, vals in by_region.items():
            vals = np.asarray(vals, np.float64)
            # None (JSON null) for empty regions: float('nan') serializes as
            # bare NaN, which is not valid JSON to strict parsers
            out[f"{st.name}/{region}"] = {
                "mean": float(vals.mean()) if vals.size else None,
                "std": float(vals.std()) if vals.size else None,
                "median": float(np.median(vals)) if vals.size else None,
                "n": int(vals.size),
            }
    return out

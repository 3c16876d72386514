#!/usr/bin/env python
"""Intensity-threshold centerline "tracker" — the SYNTHETIC-COHORT stand-in
for the external CNN coronary tracker the reference wraps in
``centerlines_autoextract.sh`` (reference centerlines_autoextract.sh:1-9;
that separate "AllInOne.py" project is unavailable in this environment).

The stand-in is deliberately SCAN-DEPENDENT, so the marker-recall metric it
feeds (reference ``eval/marker_recall_rate.py:111-140``) measures the same
causal chain the reference's study does — *does contrast correction make
vessels trackable?* On the synthetic cohort (``scripts/validate_learning.py
--eval-cohort``) vessels sit on a ~50 HU background: under-enhanced LOW
vessels (~250 HU) fall BELOW the default 300 HU track threshold, so the
tracker finds nothing on original LOW scans (recall 0); genuinely-optimal
and successfully-corrected vessels (~350-450 HU, the target corridor) rise
above it and track. No ground truth leaks into the extraction: points come
from the voxel intensities of the scan being tracked, exactly like the real
tracker's output would.

Input: a cohort list JSON in ``scripts/eval_hu_shift.py``'s format
(``[[scan_path, centerline_dir, myocardium|null], label]`` — the
``original_list.json`` / ``corrected_list.json`` files validate_learning
emits). For each scan it writes ``<out_root>/<name>/vessel0.txt`` (rows
``x y z radius`` in world mm — the format ``io_utils.load_centerlines``
parses, same as the real tracker).

``--annotations-out``: additionally derive IDR_CADRADS-style marker
annotations (``<name>/{LAD,LCX,RCA}.txt``, 4 markers each — reference
``eval/marker_recall_rate.py:18-30``) from each patient's GROUND-TRUTH
centerline file (the ``vessel0.txt`` next to the raw scan), plus a
``labels.csv`` (ID,label) sheet — the other two inputs
``scripts/eval_marker_recall.py`` needs. Annotations derive from ground
truth (they play the role of the human annotator); the TRACKED centerlines
never do.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import csv
import json

import numpy as np

from contrast_gan_3d_tpu.utils import geometry as geom
from contrast_gan_3d_tpu.utils import io_utils
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name="synthetic_tracker")


def track_scan(
    scan_path, threshold: float, max_points: int, rng
) -> np.ndarray:
    """(N, 4) world-space ``x y z radius`` points: every voxel above
    ``threshold`` HU (subsampled to ``max_points``), image->world via the
    scan's own spacing/offset. Returns (0, 4) when nothing tracks — the
    honest failure mode marker recall must count."""
    vol, meta = io_utils.load_scan(scan_path)
    ijk = np.argwhere(vol > threshold)
    if len(ijk) == 0:
        return np.zeros((0, 4), np.float64)
    if len(ijk) > max_points:
        ijk = ijk[rng.choice(len(ijk), size=max_points, replace=False)]
    world = geom.image_to_world_coords(
        ijk.astype(np.float64), meta["offset"], meta["spacing"]
    )
    radius = np.full((len(world), 1), 1.0)
    return np.concatenate([world, radius], axis=1)


def derive_annotations(gt_centerline_dir, out_dir: Path, rng) -> None:
    """IDR_CADRADS-style marker files from a ground-truth centerline dir:
    the GT polyline split into 3 "arteries" (LAD/LCX/RCA), 4 evenly-spaced
    markers each (reference marker_recall_rate.py:18-30's expected layout)."""
    pts = io_utils.load_centerlines(gt_centerline_dir)[..., :3]
    out_dir.mkdir(parents=True, exist_ok=True)
    thirds = np.array_split(np.arange(len(pts)), 3)
    for artery, idx in zip(("LAD", "LCX", "RCA"), thirds):
        take = idx[np.linspace(0, len(idx) - 1, 4).round().astype(int)]
        np.savetxt(out_dir / f"{artery}.txt", pts[take])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cohort_list", type=Path,
                   help="eval_hu_shift-format JSON list "
                        "([[scan, centerline_dir, myo|null], label])")
    p.add_argument("out_root", type=Path,
                   help="tracked centerlines written to <out_root>/<name>/")
    p.add_argument("--threshold", type=float, default=300.0,
                   help="HU track threshold (default 300: between the "
                        "~250 HU under-enhanced vessels and the 350-450 "
                        "target corridor)")
    p.add_argument("--max-points", type=int, default=2000)
    p.add_argument("--annotations-out", type=Path, default=None,
                   help="also derive <name>/{LAD,LCX,RCA}.txt marker "
                        "annotations from each entry's GROUND-TRUTH "
                        "centerline dir + a labels.csv sheet")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cohort = json.loads(args.cohort_list.read_text())
    rng = np.random.default_rng(args.seed)
    labels = []
    for (scan, gt_ctl_dir, _myo), label in cohort:
        name = io_utils.stem(scan)
        pts = track_scan(scan, args.threshold, args.max_points, rng)
        pdir = args.out_root / name
        pdir.mkdir(parents=True, exist_ok=True)
        np.savetxt(pdir / "vessel0.txt", pts)
        logger.info(
            "%s: %d voxels tracked above %.0f HU", name, len(pts),
            args.threshold,
        )
        if args.annotations_out is not None:
            derive_annotations(gt_ctl_dir, args.annotations_out / name, rng)
        labels.append((name, label))

    if args.annotations_out is not None:
        with open(args.annotations_out / "labels.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["ID", "label"])
            w.writerows(labels)
    print(json.dumps({
        "tracked": len(labels),
        "out_root": str(args.out_root),
        "threshold": args.threshold,
    }))


if __name__ == "__main__":
    main()

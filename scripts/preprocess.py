#!/usr/bin/env python
"""Offline preprocessing driver (replaces reference ``notebooks/
preprocessing.ipynb``): walk a dataset root of raw CCTA scans + centerline
dirs + ostia markers and produce packed ``.npy`` patients.

Expected layout per patient (ASOCA/MMWHS style):
  <root>/<name>.mhd (or .nii.gz)           the scan
  <root>/<name>/vessel[0-9]*.txt           centerline point clouds
  <root>/<name>/ostia.xml                  MeVisLab ostia markers
"""

import sys
from pathlib import Path

# allow running pre-install: repo root on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path

from contrast_gan_3d_tpu.data.preprocess import create_patient
from contrast_gan_3d_tpu.utils.io_utils import stem
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name="preprocess")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", type=Path, help="dataset root")
    p.add_argument(
        "out_dir",
        type=Path,
        help="output directory for patients — or a .h5 path to pack ALL "
        "patients into one sharded-corpus HDF5 file (data/hdf5.py)",
    )
    p.add_argument("--glob", default="*.mhd", help="scan file glob")
    p.add_argument(
        "--format",
        choices=("npy", "h5"),
        default="npy",
        help="per-patient storage: .npy+pickle (reference layout) or "
        "standalone HDF5 (ignored when out_dir is itself a .h5 corpus)",
    )
    p.add_argument(
        "--out-spacing",
        type=float,
        nargs="+",
        default=None,
        metavar="MM",
        help="resample scans to this spacing (1 value = isotropic, or 3 "
        "per-axis mm) before packing; default keeps native spacing like "
        "the reference",
    )
    p.add_argument(
        "--h5-chunks",
        type=int,
        nargs=4,
        default=None,
        metavar=("CX", "CY", "CZ", "CC"),
        help="HDF5 storage chunk shape override (default 64 64 64 C, tuned "
        "for random 3D crops); corpora meant for 2D slice training should "
        "use z-thin chunks, e.g. 64 64 1 2",
    )
    p.add_argument(
        "--shard",
        default=None,
        metavar="I/N",
        help="process only scans[i::n] — run N preprocessing jobs in "
        "parallel (HDF5 corpora are single-writer: give each shard its own "
        ".h5 out path, e.g. corpus.shard0.h5; readers/folds handle any mix)",
    )
    args = p.parse_args()
    shard = None
    if args.shard:
        try:
            i, n = (int(v) for v in args.shard.split("/"))
        except ValueError:
            raise SystemExit(f"--shard {args.shard!r}: expected I/N, e.g. 0/4")
        if not 0 <= i < n:
            raise SystemExit(f"--shard {args.shard}: need 0 <= i < n")
        shard = (i, n)
    out_spacing = args.out_spacing
    if out_spacing is not None and len(out_spacing) == 1:
        out_spacing = out_spacing[0]
    h5_chunks = tuple(args.h5_chunks) if args.h5_chunks else None
    if h5_chunks and args.format != "h5" and args.out_dir.suffix != ".h5":
        # npy patients have no chunking — a silent no-op here would ship a
        # corpus the user believes is slice-read-optimized when it isn't
        p.error("--h5-chunks needs --format h5 or a .h5 corpus out_dir "
                "(.npy patients are not chunked)")

    scans = sorted(args.root.glob(args.glob))
    logger.info("Found %d scans under %s", len(scans), args.root)
    if shard is not None:
        scans = scans[shard[0] :: shard[1]]
        logger.info("Shard %d/%d: %d scans", shard[0], shard[1], len(scans))
    failures = []
    for scan in scans:
        # io_utils.stem, NOT Path.stem: '.nii.gz' scans keep '.nii' under
        # Path.stem, so the '<name>/' centerline dir would never be found
        pdir = scan.parent / stem(scan)
        ostia = pdir / "ostia.xml"
        if not pdir.is_dir() or not ostia.is_file():
            logger.warning("Skipping %s: missing centerlines dir or ostia.xml", scan)
            continue
        try:
            create_patient(
                scan,
                pdir,
                ostia,
                args.out_dir,
                out_spacing=out_spacing,
                fmt=args.format,
                h5_chunks=h5_chunks,
            )
        except Exception as e:  # keep batch preprocessing going
            logger.error("FAILED %s: %s", scan, e)
            failures.append(scan)
    if failures:
        logger.error("%d failures: %s", len(failures), [str(f) for f in failures])


if __name__ == "__main__":
    main()

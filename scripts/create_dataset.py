#!/usr/bin/env python
"""Dataset creation driver (replaces reference ``notebooks/
create_dataset.ipynb``): extract 19^3 @0.5mm ostia patches from every
preprocessed patient, GMM-label contrast quality at the aortic root, write
the labeled dataset sheet and the stratified cross-validation split pickle.
"""

import sys
from pathlib import Path

# allow running pre-install: repo root on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import pickle
from pathlib import Path

import numpy as np
import pandas as pd

from contrast_gan_3d_tpu.data.labeling import (
    compute_ostia_HU_stats,
    cross_val_splits,
    label_ccta_scans,
)
from contrast_gan_3d_tpu.data.preprocess import load_patient
from contrast_gan_3d_tpu.utils.geometry import extract_ostia_patch
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name="create_dataset")


def patient_paths(src: Path) -> list:
    """Addressable preprocessed patients under ``src``: .npy files,
    standalone .h5 patients, members of .h5 corpus files — or ``src``
    itself when it IS a corpus file (``data/hdf5.py``). Unrecognized .h5
    schemas (e.g. RAW scans that were never preprocessed) fail loudly
    instead of silently contributing zero patients."""
    from contrast_gan_3d_tpu.data import hdf5

    def members_or_raise(h5_file) -> list:
        members = hdf5.corpus_members(h5_file)
        if not members:
            raise SystemExit(
                f"{h5_file}: neither a preprocessed patient nor a corpus "
                f"(no '{hdf5.SCAN_DS}' datasets) — raw scans must go "
                "through scripts/preprocess.py first"
            )
        return members

    if src.suffix.lower() in (".h5", ".hdf5"):
        return members_or_raise(src)
    paths = [str(p) for p in sorted(src.glob("*.npy"))]
    for h5_file in sorted(src.glob("*.h5")) + sorted(src.glob("*.hdf5")):
        paths.extend(members_or_raise(h5_file))
    if not paths:
        raise SystemExit(f"{src}: no preprocessed patients (.npy/.h5) found")
    return paths


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "patients_dir",
        type=Path,
        help="directory of preprocessed patients (.npy and/or .h5) or one "
        ".h5 corpus file",
    )
    p.add_argument("out_dir", type=Path)
    p.add_argument("--n-folds", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    args.out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for patient in patient_paths(args.patients_dir):
        data, meta = load_patient(patient)
        patches = extract_ostia_patch(
            np.asarray(data[..., 0]).astype(np.float32),
            meta["ostia_world"], meta["offset"], meta["spacing"],
        )
        for (mu, std) in compute_ostia_HU_stats(patches, seed=args.seed):
            rows.append({"ID": meta["name"], "path": str(patient), "mu": mu, "std": std})
        logger.info("Labeled %s", meta["name"])

    ostia_df = pd.DataFrame(rows)
    labeled = label_ccta_scans(ostia_df)
    sheet = args.out_dir / "dataset.xlsx"
    try:
        labeled.to_excel(sheet, index=False)
    except Exception:  # no openpyxl — csv fallback
        sheet = args.out_dir / "dataset.csv"
        labeled.to_csv(sheet, index=False)
    logger.info(
        "Wrote %s: %d scans, labels %s",
        sheet, len(labeled), labeled["label"].value_counts().to_dict(),
    )

    train, test = cross_val_splits(args.n_folds, sheet, seed=args.seed)
    with open(args.out_dir / "cross_val_splits.pkl", "wb") as fd:
        pickle.dump({"train": train, "test": test}, fd)
    logger.info("Wrote %s", args.out_dir / "cross_val_splits.pkl")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Marker-recall-rate evaluation driver (replaces reference
``notebooks/eval_marker_recall_hit.ipynb``): after re-running the external
centerline tracker on corrected scans (``scripts/centerlines_autoextract.sh``),
score annotated markers against the re-extracted centerlines."""

import sys
from pathlib import Path

# allow running pre-install: repo root on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path

import pandas as pd

from contrast_gan_3d_tpu.eval.marker_recall_rate import (
    eval_model_marker_recall_rate,
    read_ASOCA_annotations,
    read_IDR_CADRADS_annotations,
    summarize_marker_recall_rate,
)
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name="eval_marker_recall")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("centerlines_root", type=Path)
    p.add_argument("annotations_root", type=Path)
    p.add_argument("labels_sheet", type=Path, help="xlsx/csv with ID + label columns")
    p.add_argument("out_json", type=Path)
    p.add_argument("--annotations", choices=["idr_cadrads", "asoca"], default="idr_cadrads")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    labels_df = (
        pd.read_excel(args.labels_sheet)
        if args.labels_sheet.suffix == ".xlsx"
        else pd.read_csv(args.labels_sheet)
    )
    reader = (
        read_IDR_CADRADS_annotations
        if args.annotations == "idr_cadrads"
        else read_ASOCA_annotations
    )
    distances, metrics = eval_model_marker_recall_rate(
        args.centerlines_root, args.annotations_root, labels_df,
        workers=args.workers, annot_read_fn=reader,
    )
    summary = summarize_marker_recall_rate(distances)
    payload = {
        "per_scan_type": {st.name: m for st, m in metrics.items()},
        "summary": summary,
    }
    args.out_json.parent.mkdir(parents=True, exist_ok=True)
    args.out_json.write_text(json.dumps(payload, indent=2))
    logger.info("Marker recall: %s", json.dumps(payload))


if __name__ == "__main__":
    main()

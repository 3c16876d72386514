#!/usr/bin/env python
"""HU-distribution-shift evaluation driver (replaces reference
``notebooks/eval_HU_distribution_shift.ipynb``): collect masked voxel
intensities for original and corrected scans, print summary statistics and
write the KDE comparison figure."""

import sys
from pathlib import Path

# allow running pre-install: repo root on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path

from contrast_gan_3d_tpu.eval.hu_distribution_shift import (
    collect_voxels_intensity,
    summarize_hu_shift,
)
from contrast_gan_3d_tpu.utils import visualization as viz
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name="eval_hu_shift")


def _load_eval_list(path: Path):
    """JSON list of [[scan_path, centerline_dir, myocardium_path|null], label]."""
    entries = json.loads(Path(path).read_text())
    return [
        (tuple(p for p in paths if p is not None), int(label))
        for paths, label in entries
    ]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("eval_list", type=Path, help="JSON eval list (see _load_eval_list)")
    p.add_argument("out_dir", type=Path)
    p.add_argument("--tag", default="original", help="series name in outputs")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument(
        "--series",
        action="append",
        default=[],
        metavar="TAG=EVAL_LIST.json",
        help="additional series overlaid on ONE comparison figure (the "
        "reference notebook's original-vs-corrected view) — e.g. "
        "--series corrected=corrected_list.json; repeatable. Each series "
        "also gets its own hu_shift_<tag>.json summary",
    )
    args = p.parse_args()
    args.out_dir.mkdir(parents=True, exist_ok=True)

    lists = [(args.tag, args.eval_list)]
    for spec in args.series:
        tag, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--series {spec!r}: expected TAG=EVAL_LIST.json")
        lists.append((tag, Path(path)))

    series = {}
    for tag, eval_list in lists:
        voxels = collect_voxels_intensity(_load_eval_list(eval_list), args.workers)
        summary = summarize_hu_shift(voxels)
        out_json = args.out_dir / f"hu_shift_{tag}.json"
        out_json.write_text(json.dumps(summary, indent=2))
        logger.info("Wrote %s", out_json)
        series |= {f"{tag}/{st.name}": by for st, by in voxels.items()}

    name = f"hu_shift_{args.tag}.png" if len(lists) == 1 else "hu_shift_compare.png"
    fig = viz.hu_distribution_shift_plot(series, regions=("centerlines", "ostia"))
    fig.savefig(args.out_dir / name, dpi=120)
    logger.info("Wrote %s", args.out_dir / name)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Visual loader smoke test (replaces reference ``notebooks/view_batches.py``):
pull batches through the real sampler + on-device augmentation stack and save
axial-slice grids for eyeballing."""

import sys
from pathlib import Path

# allow running pre-install: repo root on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import pickle
from pathlib import Path

import jax
import numpy as np

from contrast_gan_3d_tpu.alias import ScanType
from contrast_gan_3d_tpu.data.augment import AugmentConfig, augment_batch
from contrast_gan_3d_tpu.data.pipeline import create_loaders
from contrast_gan_3d_tpu.utils import visualization as viz
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name="view_batches")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cval_splits", type=Path)
    p.add_argument("out_dir", type=Path)
    p.add_argument("--patch-size", type=int, nargs="+", default=(128, 128, 128))
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--augment", action="store_true")
    p.add_argument(
        "--interactive", action="store_true",
        help="open a scrollable BatchViewer window per batch (needs a "
             "display — the reference notebooks/view_batches.py GUI flow) "
             "instead of writing PNG grids",
    )
    args = p.parse_args()
    args.out_dir.mkdir(parents=True, exist_ok=True)

    with open(args.cval_splits, "rb") as fd:
        fold = pickle.load(fd)["train"][0]
    rng = np.random.default_rng(0)
    loaders = create_loaders(
        fold, tuple(args.patch_size), {st.value: args.batch_size for st in ScanType},
        rng, num_threads=1, prefetch=1, to_device=False,
    )
    # iterate the loaders that exist: a small fold may miss a ScanType
    # entirely (create_loaders only builds loaders for labels present)
    for label in sorted(loaders):
        st = ScanType(label)
        batch = loaders[st.value].sampler.next_batch()
        data = batch["data"].astype(np.float32)
        seg = batch["seg"].astype(np.float32)
        if args.augment:
            data, seg = augment_batch(data, seg, jax.random.key(0), AugmentConfig())
            data, seg = np.asarray(data), np.asarray(seg)
        if args.interactive:
            from contrast_gan_3d_tpu.utils.batch_viewer import view_batch

            view_batch(
                data, seg,
                titles=[f"{st.name} {batch['name'][0]}", "centerline mask"],
            )
            continue
        fig = viz.plot_axial_slices(
            data[0], mask=seg[0], max_slices=16,
            title=f"{st.name} {batch['name'][0]}",
        )
        out = args.out_dir / f"batch_{st.name}.png"
        fig.savefig(out, dpi=110)
        viz.close(fig)
        logger.info("Wrote %s", out)


if __name__ == "__main__":
    main()

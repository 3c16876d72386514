#!/usr/bin/env python
"""Batch full-volume correction driver (reference ``eval/utils.py`` +
eval notebooks): load a trained generator checkpoint and correct a list of
scans / preprocessed patients, writing .mhd (default), NIfTI or HDF5
outputs (``--output-format``)."""

import sys
from pathlib import Path

# allow running pre-install: repo root on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import jax

from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()  # scoped per platform+CPU features (utils/cache.py)

from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
from contrast_gan_3d_tpu.eval.utils import correct_patients
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name="correct_scans")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint_dir", type=Path)
    p.add_argument("out_dir", type=Path)
    p.add_argument("scans", nargs="+", help="scan files or preprocessed patients")
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--patch-size", type=int, nargs=3, default=(128, 128, 128))
    p.add_argument("--overlap", type=float, default=0.5)
    p.add_argument("--batch-size", type=int, default=None,
                   help="generator forward batch (default: the corrector's "
                        "layout-aware choice, 24 packed / 8 direct)")
    p.add_argument("--reference-pt", action="store_true",
                   help="checkpoint is a reference torch .pt file "
                        "(architecture auto-derived from its state_dict)")
    p.add_argument("--sharded", action="store_true",
                   help="shard each volume's patch grid over all local devices")
    p.add_argument("--output-format", choices=("mhd", "nii", "nii.gz", "h5"),
                   default="mhd",
                   help="corrected-scan format (.mhd like the reference, "
                        "NIfTI-1, or HDF5)")
    args = p.parse_args()
    if args.reference_pt and args.iteration is not None:
        p.error("--iteration applies to checkpoint DIRS; a --reference-pt "
                "file IS one iteration")

    kwargs = dict(
        inference_patch_size=tuple(args.patch_size),
        overlap=args.overlap,
        batch_size=args.batch_size,
    )
    if args.reference_pt:
        corrector = CCTAContrastCorrector.from_reference_checkpoint(
            args.checkpoint_dir, **kwargs
        )
    else:
        corrector = CCTAContrastCorrector.from_checkpoint(
            args.checkpoint_dir, iteration=args.iteration, **kwargs
        )
    if args.sharded:
        from contrast_gan_3d_tpu.parallel import data_mesh

        # patch grid split across all visible chips; keeps the corrector's
        # layout (packed block-space by default)
        corrector.shard_over(data_mesh())
    # graceful interrupt for long cohort jobs: first SIGTERM/Ctrl-C finishes
    # the in-flight volume(s) and exits 0 with completed outputs intact, a
    # second one aborts (no-op when embedded off the main thread)
    import threading

    from contrast_gan_3d_tpu.utils.signals import install_graceful_stop

    stop = threading.Event()
    install_graceful_stop(lambda name: stop.set(), stop.is_set)

    done = correct_patients(
        corrector, args.out_dir, args.scans, suffix=f".{args.output_format}",
        stop_requested=stop.is_set,
    )
    if stop.is_set():
        logger.warning(
            "Stopped early: %d/%d scans corrected", len(done), len(args.scans)
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Learning-convergence validation on synthetic data.

Builds a synthetic cohort where LOW scans carry under-enhanced vessels
(~250 HU) and OPT scans optimal ones (~400 HU), trains a small WGAN with the
real pipeline (host-augmented loaders, fused jitted steps, checkpointing),
then corrects a held-out LOW scan with the sliding-window corrector and
measures the centerline HU shift — the framework's whole loop, shown to
actually learn the contrast correction. Prints a JSON summary.
"""

import sys
from pathlib import Path

# allow running pre-install: repo root on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import os
import tempfile
from dataclasses import replace
from pathlib import Path

import jax
import numpy as np

# the axon sitecustomize overrides jax_platforms programmatically; honor an
# explicit JAX_PLATFORMS env request (same rationale as __graft_entry__.py —
# the committed reports/synthetic_study artifacts are CPU reproductions)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()  # scoped per platform+CPU features (utils/cache.py)


def synth_patient(rng, shape, vessel_hu):
    vol = rng.normal(50.0, 20.0, shape).astype(np.float32)
    vol[0, 0, 0] = -1000
    n = 60
    t = np.linspace(0, 1, n)
    pts = np.stack(
        [
            (0.15 + 0.7 * t) * shape[0],
            (0.5 + 0.25 * np.sin(2 * np.pi * t)) * shape[1],
            (0.15 + 0.7 * t) * shape[2],
        ],
        axis=-1,
    )
    mask = np.zeros(shape, np.uint8)
    ijk = np.clip(np.round(pts).astype(int), 0, np.asarray(shape) - 1)
    for x, y, z in ijk:
        # a small bright blob around each centerline point
        xs, ys, zs = (
            slice(max(0, x - 1), x + 2),
            slice(max(0, y - 1), y + 2),
            slice(max(0, z - 1), z + 2),
        )
        vol[xs, ys, zs] = vessel_hu + rng.normal(0, 10)
        mask[x, y, z] = 1
    meta = {
        "spacing": np.ones(3), "offset": np.zeros(3),
        "ostia_world": pts[:2].astype(np.float32),
        "centerlines_world": np.concatenate(
            [pts, np.full((n, 1), 1.0)], -1
        ).astype(np.float32),
    }
    return vol.astype(np.int16), mask, meta


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iterations", type=int, default=400)
    p.add_argument("--shape", type=int, nargs=3, default=(32, 32, 32))
    p.add_argument("--patch", type=int, nargs=3, default=(16, 16, 16))
    p.add_argument("--gp", action="store_true", help="gradient-penalty mode")
    p.add_argument("--cycle-length", type=int, default=1,
                   help="fuse K schedule iterations per dispatch "
                        "(steps.build_cycle_step; log cadence should divide)")
    p.add_argument(
        "--family", choices=["3d", "2d"], default="3d",
        help="2d = conf_2D-family: 2D patches/models, per-slice correction",
    )
    p.add_argument("--out", type=Path, default=None)
    p.add_argument("--workdir", type=Path, default=None,
                   help="persist the study (cohort, checkpoint, held-out "
                        "scans) here instead of a throwaway tempdir — lets "
                        "scripts/eval_hu_shift.py run on the trained result")
    p.add_argument("--eval-cohort", type=int, default=0,
                   help="additionally write N held-out RAW LOW scans (+ "
                        "centerline dirs), correct them with the trained "
                        "generator, and emit original_list.json / "
                        "corrected_list.json in eval_hu_shift.py's format "
                        "(the reference notebook's original-vs-corrected "
                        "study on the synthetic cohort)")
    p.add_argument("--p-centerline-3d", type=float, default=0.0,
                   help="fraction of train crops centered on centerline "
                        "points (guided 3D sampling A/B)")
    p.add_argument("--data-format", choices=("npy", "h5"), default="npy",
                   help="patient storage driving the run (h5 = one corpus "
                        "file end-to-end)")
    p.add_argument("--seed", type=int, default=None,
                   help="training seed override (cohort stays fixed); the toy "
                        "WGAN oscillates — use to separate seed noise from "
                        "regressions")
    args = p.parse_args()

    from contrast_gan_3d_tpu.data.pipeline import create_loaders
    from contrast_gan_3d_tpu.data.preprocess import write_patient
    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
    from contrast_gan_3d_tpu.experiments import load_config
    from contrast_gan_3d_tpu.experiments.builder import build
    from contrast_gan_3d_tpu.trainer.trainer import Trainer
    from contrast_gan_3d_tpu.utils import seed_everything

    if args.workdir is not None:
        tmp = Path(args.workdir)
        tmp.mkdir(parents=True, exist_ok=True)
    else:
        tmp = Path(tempfile.mkdtemp(prefix="cgan3d_validate_"))
    rng = np.random.default_rng(0)
    fold = []
    vessel_by_label = {0: 400, -1: 250, 1: 550}
    out_store = tmp / ("data/corpus.h5" if args.data_format == "h5" else "data")
    for label, hu in vessel_by_label.items():
        for i in range(3):
            vol, mask, meta = synth_patient(rng, tuple(args.shape), hu)
            path = write_patient(vol, mask, meta, f"s{label}_{i}", out_store)
            fold.append((str(path), label))

    is_2d = args.family == "2d"
    if is_2d and args.gp:
        raise SystemExit("--family 2d validates the weight-clip conf_2D stack")
    cfg = replace(
        load_config("conf_2d" if is_2d else
                    ("gradient_penalty" if args.gp else "basic_3d")),
        train_iterations=args.iterations,
        validate_every=None,
        checkpoint_every=args.iterations,
        log_every=max(1, args.iterations // 10),
        log_images_every=None,
        train_patch_size=tuple(args.patch)[:2] if is_2d else tuple(args.patch),
        train_batch_size={0: 8, -1: 4, 1: 4} if is_2d else {0: 4, -1: 2, 1: 2},
        generator_args={"n_resnet_blocks": 2, "n_updownsample_blocks": 1,
                        "init_channels_out": 8},
        critic_args={"init_channels_out": 4, "discriminator_depth": 2},
        # WC converges fast at 1e-3; GP keeps its paper hyperparams (1e-4,
        # betas (0, 0.9)) — a hot lr destabilizes the unnormalized critic
        lr=1e-4 if args.gp else 1e-3,
        milestones=(),
        num_workers=(2, 1),
        logger="console",
        cycle_length=args.cycle_length,
        **({"seed": args.seed} if args.seed is not None else {}),
    )
    built = build(cfg, checkpoint_dir=str(tmp / "ckpt"))
    host_rng, key = seed_everything(built.seed)
    loaders = create_loaders(
        fold, cfg.train_patch_size, cfg.train_batch_size, host_rng,
        num_threads=2, augmenter=built.host_augmenter,
        p_centerline_3d=0.0 if is_2d else args.p_centerline_3d,
    )
    trainer = Trainer(
        built.generator, built.critic, built.gen_tx, built.critic_tx,
        built.step_config, built.trainer_config, key, cfg.train_patch_size,
        logger_interface=built.logger_interface,
    )
    trainer.fit(loaders)

    # held-out LOW and HIGH scans -> correct -> measure centerline HU (the
    # correction must raise LOW and lower HIGH toward the corridor)
    corrector = CCTAContrastCorrector.from_checkpoint(
        tmp / "ckpt", generator=built.generator,
        # 2D: whole-slice correction batched along z (conf_2D's val style)
        inference_patch_size=tuple(args.shape[:2]) if is_2d else tuple(args.patch),
        batch_size=4,
    )
    lo, hi = cfg.desired_HU_bounds
    mid = (lo + hi) / 2
    summary = {
        "target_corridor": [lo, hi],
        "iterations": args.iterations,
        "mode": "gp" if args.gp else "wc",
        "family": args.family,
        "p_centerline_3d": args.p_centerline_3d,
        "data_format": args.data_format,
    }
    for tag, vessel_hu in (("", 250), ("high_", 550)):
        vol, mask, meta = synth_patient(rng, tuple(args.shape), vessel_hu)
        corrected = np.asarray(corrector(vol))
        m = mask.astype(bool)
        before = float(vol[m].mean())
        after = float(corrected[m].mean())
        summary[f"{tag}centerline_mean_hu_before"] = round(before, 1)
        summary[f"{tag}centerline_mean_hu_after"] = round(after, 1)
        summary[f"{tag}moved_toward_corridor"] = bool(
            abs(after - mid) < abs(before - mid)
        )
    if args.eval_cohort > 0:
        # held-out RAW cohort for the original-vs-corrected HU study
        # (reference notebooks/eval_HU_distribution_shift.ipynb): LOW scans
        # + an OPT anchor series, centerline dirs alongside, corrected LOW
        # via the trained generator — lists in scripts/eval_hu_shift.py's
        # [[scan, centerline_dir, myocardium|null], label] format
        from contrast_gan_3d_tpu.utils import io_utils

        raw_dir, corr_dir = tmp / "eval_raw", tmp / "eval_corrected"
        raw_dir.mkdir(parents=True, exist_ok=True)
        corr_dir.mkdir(parents=True, exist_ok=True)

        def write_raw(name, vessel_hu):
            vol, _, meta = synth_patient(rng, tuple(args.shape), vessel_hu)
            scan = raw_dir / f"{name}.mhd"
            io_utils.write_mhd(
                vol.astype(np.int16), scan,
                spacing=meta["spacing"], origin=meta["offset"],
            )
            pdir = raw_dir / name
            pdir.mkdir(exist_ok=True)
            np.savetxt(pdir / "vessel0.txt", meta["centerlines_world"])
            ostia = meta["ostia_world"]
            (pdir / "ostia.xml").write_text(
                "<XMarkerList><ListSize>2</ListSize>"
                + "".join(f"<pos>{x} {y} {z}</pos>" for x, y, z in ostia)
                + "</XMarkerList>"
            )
            return vol, meta, scan, pdir

        original, corrected_list = [], []
        for i in range(args.eval_cohort):
            vol, meta, scan, pdir = write_raw(f"low_{i}", 250)
            original.append([[str(scan), str(pdir), None], -1])
            corr = np.asarray(corrector(vol))
            cpath = corr_dir / f"low_{i}.mhd"
            corrector.save(corr, cpath, meta)
            corrected_list.append([[str(cpath), str(pdir), None], -1])
        for i in range(max(2, args.eval_cohort // 2)):
            _, _, scan, pdir = write_raw(f"opt_{i}", 400)
            original.append([[str(scan), str(pdir), None], 0])
        (tmp / "original_list.json").write_text(json.dumps(original))
        (tmp / "corrected_list.json").write_text(json.dumps(corrected_list))
        summary["eval_lists"] = {
            "original": str(tmp / "original_list.json"),
            "corrected": str(tmp / "corrected_list.json"),
        }

    print(json.dumps(summary))
    if args.out:
        args.out.write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

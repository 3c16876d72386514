#!/usr/bin/env python
"""Head-to-head training study: the ACTUAL reference PyTorch Trainer vs this
framework, on an identical synthetic cohort, identical initial weights and an
identical batch stream.

Both sides train the small WGAN (weight-clip mode, Adam lr 1e-3, critic
every 1 / generator every 5) for N iterations:

- **reference**: the live ``contrast_gan_3D.trainer.Trainer.train_step``
  (loaded by file path from /root/reference — its real alternation dispatch,
  losses, optimizers and clipping), fed scaled torch tensors;
- **ours**: the fused jitted ``combined_step``/``critic_step`` programs fed
  the same raw int16 batches (production path, minus augmentation — disabled
  on BOTH sides so the streams are identical; batchgenerators is absent for
  the reference anyway).

Afterwards each side's final generator corrects the same held-out LOW and
HIGH scans through OUR sliding-window corrector (patchwise inference parity
is proven ≤1e-4 by tests/test_reference_parity.py, so the corrector is a
neutral referee) and the centerline HU movement toward the 350-450 corridor
is compared. Trajectories diverge chaotically after tens of GAN iterations —
the claim here is NOT bitwise parity (tests/test_reference_parity_train.py
proves that at step granularity) but equal end-to-end training QUALITY:
a reference user switching frameworks trains to the same place.

Writes ``reference_training_comparison.json`` (committed at the repo root).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json

import numpy as np

import jax

from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()  # scoped per platform+CPU features (utils/cache.py)

REF = Path("/root/reference/contrast_gan_3D")

GEN_CFG = dict(n_resnet_blocks=2, n_updownsample_blocks=1, init_channels_out=8)
CRITIC_CFG = dict(init_channels_out=4, discriminator_depth=2)
BATCH = {0: 4, -1: 2, 1: 2}
LR, BETAS, CLIP = 1e-3, (0.5, 0.999), 0.01
GEN_EVERY, CRITIC_EVERY = 5, 1


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iterations", type=int, default=800)
    p.add_argument("--shape", type=int, nargs=3, default=(32, 32, 32))
    p.add_argument("--patch", type=int, nargs="+", default=None,
                   help="training patch: W H D (3d family) or W H (2d); "
                        "default 16 per dim")
    p.add_argument("--family", choices=["3d", "2d"], default="3d",
                   help="2d = conf_2D family head-to-head: 2D models on both "
                        "sides, centerline-guided axial-slice batches (the "
                        "reference's own '2D-WC-baseline' checkpoint family), "
                        "per-slice correction judging")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--gp", action="store_true",
                   help="gradient-penalty mode on BOTH sides (weight_clip "
                        "None, Adam (0, 0.9) lr 1e-4, gp_weight 10; GP eps "
                        "draws differ across frameworks, so this compares "
                        "endpoint quality, not trajectories)")
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args()
    is_2d = args.family == "2d"
    if args.patch is None:
        args.patch = (16, 16) if is_2d else (16, 16, 16)
    if len(args.patch) != (2 if is_2d else 3):
        p.error(f"--patch takes {'W H' if is_2d else 'W H D'} for "
                f"--family {args.family}")
    if args.out is None:
        args.out = Path(__file__).resolve().parent.parent / (
            "reference_training_comparison_2d.json" if is_2d
            else "reference_training_comparison.json"
        )
    patch = tuple(args.patch)
    lr, betas, clip = (1e-4, (0.0, 0.9), None) if args.gp else (LR, BETAS, CLIP)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        setup_compilation_cache()  # re-scope: platform changed

    import types
    from functools import partial

    import jax.numpy as jnp
    import torch

    from contrast_gan_3d_tpu.data.preprocess import write_patient
    from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler
    from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler
    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import (
        StepConfig, build_train_steps, init_state,
    )
    from contrast_gan_3d_tpu.utils.torch_port import (
        critic_variables_from_torch, generator_variables_from_torch,
        numpy_state_dict,
    )

    from tests.test_reference_parity import fill_deterministic, load_reference_models
    from tests.test_reference_parity_numpy import _ensure_stub
    from scripts.validate_learning import synth_patient

    import tempfile

    tmp = Path(tempfile.mkdtemp(prefix="cgan3d_refcmp_"))
    rng = np.random.default_rng(0)
    by_label = {}
    for label, hu in {0: 400, -1: 250, 1: 550}.items():
        paths = []
        for i in range(3):
            vol, mask, meta = synth_patient(rng, tuple(args.shape), hu)
            paths.append(str(write_patient(vol, mask, meta, f"s{label}_{i}", tmp)))
        by_label[label] = paths

    # ---- identical initial weights: deterministic torch fill, ported -----
    mods = load_reference_models()
    gen_t = fill_deterministic(
        mods["generator"].ResnetGenerator(
            GEN_CFG["n_resnet_blocks"], GEN_CFG["n_updownsample_blocks"],
            GEN_CFG["init_channels_out"], is_2D=is_2d,
        ),
        seed=70,
    )
    crit_t = fill_deterministic(
        mods["discriminator"].PatchGANDiscriminator(
            1, CRITIC_CFG["init_channels_out"], CRITIC_CFG["discriminator_depth"],
            is_2D=is_2d, negative_slope=0.2,
        ),
        seed=71,
    )

    scaler = FactorZeroCenterScaler()
    ndim = 2 if is_2d else 3
    gen = ResnetGenerator(tconv_placement="torch", ndim=ndim, **GEN_CFG)
    critic = PatchGANDiscriminator(ndim=ndim, **CRITIC_CFG)
    tx = make_optimizer("adam", lr=lr, betas=betas)
    cfg = StepConfig(weight_clip=clip, dtype=jnp.float32, augment=None)
    state = init_state(gen, critic, tx, tx, jax.random.key(0), patch)
    def port_generator():
        return generator_variables_from_torch(
            numpy_state_dict(gen_t.state_dict()),
            GEN_CFG["n_resnet_blocks"], GEN_CFG["n_updownsample_blocks"],
        )

    gv = port_generator()
    cv = critic_variables_from_torch(
        numpy_state_dict(crit_t.state_dict()), CRITIC_CFG["discriminator_depth"]
    )
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gv["params"]),
        gen_stats=jax.tree.map(jnp.asarray, gv["batch_stats"]),
        critic_params=jax.tree.map(jnp.asarray, cv["params"]),
        critic_stats=jax.tree.map(jnp.asarray, cv["batch_stats"]),
    )
    steps = build_train_steps(gen, critic, tx, tx, cfg)

    # ---- the live reference Trainer --------------------------------------
    from enum import Enum

    class RefScanType(Enum):
        OPT = 0
        LOW = -1
        HIGH = 1

    _ensure_stub("contrast_gan_3D.alias", ScanType=RefScanType, BGenAugmenter=object)
    pkg = sys.modules["contrast_gan_3D"]
    pkg.__path__ = [str(REF)]
    import importlib
    import importlib.util

    importlib.import_module("contrast_gan_3D.utils")
    trainer_pkg = _ensure_stub("contrast_gan_3D.trainer")
    trainer_pkg.utils = _ensure_stub(
        "contrast_gan_3D.trainer.utils", find_latest_checkpoint=lambda d: None
    )
    logger_pkg = _ensure_stub("contrast_gan_3D.trainer.logger")
    logger_pkg.LoggerInterface = _ensure_stub(
        "contrast_gan_3D.trainer.logger.LoggerInterface",
        MultiThreadedLogger=object, SingleThreadedLogger=object,
    )
    full = "contrast_gan_3D.trainer.Trainer"
    if full not in sys.modules:
        spec = importlib.util.spec_from_file_location(full, REF / "trainer" / "Trainer.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    lo_s, hi_s = float(scaler(350.0)), float(scaler(450.0))
    n_sub = BATCH[-1] + BATCH[1]
    tr = sys.modules[full].Trainer(
        train_iterations=args.iterations, val_iterations=1, validate_every=10**9,
        train_generator_every=GEN_EVERY, train_critic_every=CRITIC_EVERY,
        log_every=10**9, log_images_every=10**9,
        generator_class=lambda: gen_t, critic_class=lambda: crit_t,
        generator_optim_class=partial(torch.optim.Adam, lr=lr, betas=betas),
        critic_optim_class=partial(torch.optim.Adam, lr=lr, betas=betas),
        hu_loss_instance=mods["loss"].HULoss(lo_s, hi_s, (n_sub, 1, *patch)),
        logger_interface=types.SimpleNamespace(logger=None),
        device=torch.device("cpu"),
        weight_clip=clip,
        rng=np.random.default_rng(5),
    )
    gen_t.train()
    crit_t.train()

    # ---- identical batch stream ------------------------------------------
    samplers = {
        label: CCTAPatchSampler(
            paths, patch, BATCH[label],
            rng=np.random.default_rng(100 + label),
        )
        for label, paths in by_label.items()
    }

    def t_scaled(a):
        return torch.from_numpy(np.asarray(scaler(a.astype(np.float32)))[:, None])

    print(f"training both frameworks for {args.iterations} iterations", flush=True)
    for it in range(1, args.iterations + 1):
        b_opt = samplers[0].next_batch()
        b_low = samplers[-1].next_batch()
        b_high = samplers[1].next_batch()
        opt = np.asarray(b_opt["data"])
        subopt = np.concatenate([b_low["data"], b_high["data"]])
        mask = np.concatenate([b_low["seg"], b_high["seg"]])

        patches = [
            {"data": t_scaled(opt), "seg": torch.zeros(())},
            {"data": t_scaled(np.asarray(b_low["data"])),
             "seg": torch.from_numpy(np.asarray(b_low["seg"], np.float32)[:, None])},
            {"data": t_scaled(np.asarray(b_high["data"])),
             "seg": torch.from_numpy(np.asarray(b_high["seg"], np.float32)[:, None])},
        ]
        tr.train_step(patches, it)

        fn = steps.combined_step if it % GEN_EVERY == 0 else steps.critic_step
        state, metrics = fn(
            state, jnp.asarray(opt), jnp.asarray(subopt), jnp.asarray(mask)
        )
        if it % max(1, args.iterations // 8) == 0:
            print(f"  it {it}: ours D={float(metrics['D']):+.4f}", flush=True)

    # ---- the same corrector judges both ----------------------------------
    corr_patch = tuple(args.shape[:2]) if is_2d else tuple(args.patch)
    ours_corr = CCTAContrastCorrector(
        gen, state.gen_params, state.gen_stats,
        inference_patch_size=corr_patch, batch_size=4,
    )
    ref_v = port_generator()
    ref_corr = CCTAContrastCorrector(
        gen, ref_v["params"], ref_v.get("batch_stats"),
        inference_patch_size=corr_patch, batch_size=4,
    )

    lo, hi = 350.0, 450.0
    mid = (lo + hi) / 2
    summary = {
        "iterations": args.iterations,
        "target_corridor": [lo, hi],
        "mode": "gp" if args.gp else "wc",
        "family": args.family,
        "setup": "identical init (ported), identical batch stream, "
                 f"{'GP' if args.gp else 'WC'} mode, {args.family} family, "
                 f"Adam lr {lr} betas {betas}, critic/{CRITIC_EVERY} gen/{GEN_EVERY}",
    }
    for tag, vessel_hu in (("low", 250), ("high", 550)):
        vol, mask, _ = synth_patient(rng, tuple(args.shape), vessel_hu)
        m = mask.astype(bool)
        before = float(vol[m].mean())
        row = {"before": round(before, 1)}
        for side, corr in (("ours", ours_corr), ("reference", ref_corr)):
            after = float(np.asarray(corr(vol))[m].mean())
            row[side] = {
                "after": round(after, 1),
                "moved_toward_corridor": bool(abs(after - mid) < abs(before - mid)),
            }
        row["after_delta_ours_vs_reference"] = round(
            row["ours"]["after"] - row["reference"]["after"], 1
        )
        summary[f"{tag}_scan_centerline_mean_hu"] = row
    print(json.dumps(summary, indent=2))
    args.out.write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

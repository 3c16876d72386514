"""End-to-end trainer smoke test: synthetic patients -> loaders -> jitted WGAN
steps -> validate -> checkpoint -> resume (SURVEY.md §4 minimum slice;
reference capability: trainer/Trainer.py fit/validate/save/load)."""

import jax
import numpy as np
import pytest

from contrast_gan_3d_tpu.data.pipeline import create_loaders
from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
from contrast_gan_3d_tpu.trainer.logger import LoggerInterface
from contrast_gan_3d_tpu.trainer.optim import make_optimizer
from contrast_gan_3d_tpu.trainer.steps import StepConfig
from contrast_gan_3d_tpu.trainer.trainer import Trainer, TrainerConfig

from tests.synth import make_dataset

PATCH = (16, 16, 16)


class RecordingLogger(LoggerInterface):
    def __init__(self):
        self.scalars, self.images = [], []

    def log_scalars(self, scalars, step, stage="train"):
        self.scalars.append((stage, step, scalars))

    def log_images(self, *args, **kwargs):
        self.images.append(args)


def _build_trainer(tmp_path, log, ckpt_dir=None, iterations=4):
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    # tiny elastic grid so augmentation is cheap on a (16,16,16) patch
    from contrast_gan_3d_tpu.data.augment import AugmentConfig

    step_cfg = StepConfig(augment=AugmentConfig(elastic_grid=4))
    cfg = TrainerConfig(
        train_iterations=iterations,
        train_critic_every=1,
        train_generator_every=2,
        val_every=2,
        val_iterations=1,
        log_every=1,
        log_images_every=3,
        checkpoint_every=2,
        checkpoint_dir=str(ckpt_dir) if ckpt_dir else None,
    )
    return Trainer(
        gen, critic, tx, tx, step_cfg, cfg, jax.random.key(0), PATCH,
        logger_interface=log,
    )


@pytest.mark.slow
def test_fit_end_to_end(tmp_path, rng):
    fold = make_dataset(tmp_path / "data", rng, n_per_label=2)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, rng, num_threads=1, prefetch=2,
        to_device=False,
    )
    log = RecordingLogger()
    ckpt_dir = tmp_path / "ckpt"
    trainer = _build_trainer(tmp_path, log, ckpt_dir=ckpt_dir, iterations=4)
    state = trainer.fit(loaders, val_loaders=loaders)

    assert int(state.step) == 4
    # scalar logs every iteration; validation fired at iteration 2
    train_logs = [s for s in log.scalars if s[0] == "train"]
    val_logs = [s for s in log.scalars if s[0] == "validation"]
    assert len(train_logs) == 4
    assert len(val_logs) == 1
    for _, _, scalars in train_logs:
        for v in scalars.values():
            assert np.isfinite(v)
    # critic trained and was clipped
    clip = trainer.step_cfg.weight_clip
    for leaf in jax.tree_util.tree_leaves(state.critic_params):
        assert np.abs(np.asarray(leaf)).max() <= clip + 1e-6
    # checkpoints written: iteration 2 + final 4
    names = sorted(p.name for p in ckpt_dir.glob("*.msgpack"))
    assert "4.msgpack" in names

    # resume: a fresh trainer picks up from the final checkpoint
    trainer2 = _build_trainer(tmp_path, RecordingLogger(), ckpt_dir=ckpt_dir, iterations=4)
    assert trainer2.iteration == 4


@pytest.mark.slow
def test_schedule_branches(tmp_path, rng):
    """critic-every-1 / generator-every-2: even iterations run combined,
    odd run critic-only."""
    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    loaders = create_loaders(
        fold, PATCH, {0: 1, -1: 1, 1: 1}, rng, num_threads=1, prefetch=1,
        to_device=False,
    )
    log = RecordingLogger()
    trainer = _build_trainer(tmp_path, log, iterations=2)
    trainer.fit(loaders)
    by_step = {s: sc for _, s, sc in log.scalars if _ == "train"}
    assert set(by_step[0]) == {"D", "G", "G-full", "sim", "HU"}  # combined
    assert set(by_step[1]) == {"D"}  # critic only

"""Turn an :class:`ExperimentConfig` into runnable objects (models,
optimizers, step/trainer configs, loaders, logger) — the analogue of the
reference's ``TrainManager`` wiring (``train.py:124-209``)."""

import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from contrast_gan_3d_tpu.constants import DEFAULT_SEED
from contrast_gan_3d_tpu.data.augment import AugmentConfig
from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler
from contrast_gan_3d_tpu.experiments.config import ExperimentConfig
from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.trainer.logger import (
    ConsoleLogger,
    FileLogger,
    FileLogger2D,
    HAS_WANDB,
    LoggerInterface,
    MultiThreadedLogger,
    NoopLogger,
    WandbLogger,
    WandbLogger2D,
)
from contrast_gan_3d_tpu.trainer.optim import make_optimizer
from contrast_gan_3d_tpu.trainer.steps import StepConfig
from contrast_gan_3d_tpu.trainer.trainer import TrainerConfig
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


def resolve_cycle_length(
    cfg: ExperimentConfig, stop_sync_every: Optional[int] = None
) -> int:
    """Resolve ``cfg.cycle_length`` (None = auto) to a concrete K.

    Auto picks the schedule period ``train_generator_every`` — fusing the
    reference 4-critic+1-combined cycle into ONE compiled program (measured
    +21%% schedule-effective on-chip, PERF.md) — when every host-visible
    cadence is a multiple of it, so log/val/checkpoint/stop semantics are
    exactly the per-iteration ones (cadences fire at cycle boundaries that
    ARE their due iterations). Any cadence that doesn't divide falls back
    to per-iteration dispatch rather than silently shifting its firing
    points. Explicit ints are honored as-is.

    ``stop_sync_every`` must be the value the trainer will actually run
    with — ``build()`` passes its constructed TrainerConfig's instance
    value, so an override there can't silently shift stop-sync firing to
    cycle boundaries (the class default is only the fallback for direct
    callers)."""
    if cfg.cycle_length is not None:
        return max(1, int(cfg.cycle_length))
    k = int(cfg.train_generator_every or 0)
    if k <= 1:
        return 1
    if stop_sync_every is None:
        stop_sync_every = TrainerConfig.stop_sync_every
    # (train_critic_every needn't divide: critic/generator branching happens
    # INSIDE the cycle pattern, per iteration — schedule_branches)
    cadences = (
        cfg.log_every, cfg.log_images_every, cfg.validate_every,
        cfg.checkpoint_every, stop_sync_every,
    )
    if any(c is not None and c % k for c in cadences):
        return 1
    logger.info(
        "cycle_length auto: fusing %d-iteration schedule cycles into one "
        "program (every cadence divides; pass cycle_length=1 to disable)", k,
    )
    return k


def resolve_compiler_options(cfg: ExperimentConfig) -> Optional[dict]:
    """Resolve ``cfg.xla_compiler_options`` (None = auto) to the dict the
    per-iteration TRAIN-step programs compile with. Auto injects the
    measured TPU default — scoped VMEM 64 MiB, a 3D per-step win at every
    batch (PERF.md round-5 A/B: 0.930 -> 0.892 s at 48+48, 0.257 -> 0.254 s
    at the reference mix; flat 32-96 MiB plateau) — and nothing for the 2D
    family (-11% measured) or on other backends (``xla_tpu_*`` keys are
    compile errors there). Fused cycles and eval programs never take these
    options regardless (each measured worse — steps.py notes). ``{}`` opts
    out; explicit dicts pass through verbatim."""
    if cfg.xla_compiler_options is not None:
        return dict(cfg.xla_compiler_options) or None
    if cfg.is_2d:
        return None
    import jax

    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    return None


@dataclass
class BuiltExperiment:
    config: ExperimentConfig
    generator: nn.Module
    critic: nn.Module
    gen_tx: optax.GradientTransformation
    critic_tx: optax.GradientTransformation
    step_config: StepConfig
    trainer_config: TrainerConfig
    scaler: FactorZeroCenterScaler
    logger_interface: LoggerInterface
    seed: int
    host_augmenter: object = None  # HostAugmenter for the train loaders


def build(cfg: ExperimentConfig, checkpoint_dir: Optional[str] = None) -> BuiltExperiment:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    ndim = 2 if cfg.is_2d else 3

    # remat auto policy: needed only when the per-iteration voxel volume
    # exceeds the reference default (the fused step + lean BatchNorm fit
    # 16 GB at 6+3+3 x 128^3 without it, and no-remat is ~18% faster)
    if cfg.remat is not None:
        remat = cfg.remat
    else:
        voxels = sum(cfg.train_batch_size.values()) * int(
            np.prod(cfg.train_patch_size)
        )
        remat = (not cfg.is_2d) and voxels > 30_000_000
    # an explicit generator_args["layout"] wins over the config-level knob
    layout = cfg.generator_args.get("layout", cfg.generator_layout)
    if layout == "auto":
        block = max(4, 2 ** cfg.generator_args.get("n_updownsample_blocks", 2))
        eligible = (
            not cfg.is_2d
            and cfg.generator_args.get("norm", "batch") == "batch"
            and cfg.generator_args.get("n_updownsample_blocks", 2) >= 1
            # % block for the stage strides; >= 8 for the (L+1)-block
            # reflect-pad slabs (ops/packed.reflect_pad_packed)
            and all(p % block == 0 and p >= 8 for p in cfg.train_patch_size)
            and all(p % block == 0 and p >= 8 for p in cfg.val_patch_size)
        )
        layout = "packed" if eligible else "direct"
    # builder defaults first, user args win (an explicit remat/dtype/ndim in
    # generator_args/critic_args previously raised duplicate-keyword errors);
    # "layout" stays excluded — its raw value ("auto") was resolved above
    generator = ResnetGenerator(
        **{
            **dict(ndim=ndim, dtype=dtype, remat=remat, layout=layout),
            **{k: v for k, v in cfg.generator_args.items() if k != "layout"},
        }
    )
    critic = PatchGANDiscriminator(
        **{**dict(ndim=ndim, dtype=dtype, remat=remat), **cfg.critic_args}
    )

    gen_tx = make_optimizer(
        cfg.optimizer, cfg.lr, cfg.betas, cfg.milestones, cfg.lr_gamma
    )
    critic_tx = make_optimizer(
        cfg.optimizer, cfg.lr, cfg.betas, cfg.milestones, cfg.lr_gamma
    )

    scaler = FactorZeroCenterScaler(*cfg.HU_norm_range, cfg.max_HU_delta)

    augment = None
    host_augmenter = None
    # resolved ONCE: the host augmenters below must see the same
    # DEFAULT_SEED fallback as the loaders/model init (a raw None here made
    # default-config host augmentation OS-entropy-seeded, i.e. irreproducible;
    # create_loaders additionally respawns per-loader child rngs from this)
    seed = DEFAULT_SEED if cfg.seed is None else cfg.seed
    if cfg.augment and cfg.is_2d:
        from contrast_gan_3d_tpu.data.augment import Augment2DConfig

        augment = Augment2DConfig(
            do_rotation=cfg.do_rotation,
            angle=float(np.deg2rad(cfg.rotation_deg)),
            p_rotation=cfg.p_rotation,
        )
        if cfg.augment_backend == "host":
            from contrast_gan_3d_tpu import native

            if native.has_native():
                from contrast_gan_3d_tpu.data.host_augment import HostAugmenter2D

                host_augmenter = HostAugmenter2D(
                    augment, np.random.default_rng(seed)
                )
                augment = None  # warp happens in the prefetch workers
    elif cfg.augment:
        augment = AugmentConfig(
            do_elastic=cfg.do_elastic,
            deformation_scale=cfg.deformation_scale,
            p_elastic=cfg.p_elastic,
            do_scale=cfg.do_scale,
            scale_range=cfg.scale_range,
            p_scale=cfg.p_scale,
            do_rotation=cfg.do_rotation,
            angle=float(np.deg2rad(cfg.rotation_deg)),
            p_rotation=cfg.p_rotation,
        )
        if cfg.augment_backend == "host":
            from contrast_gan_3d_tpu import native

            if native.has_native():
                from contrast_gan_3d_tpu.data.host_augment import HostAugmenter

                host_augmenter = HostAugmenter(
                    augment, np.random.default_rng(seed)
                )
                augment = None  # warp happens in the prefetch workers

    step_config = StepConfig(
        weight_clip=cfg.weight_clip,
        gp_weight=cfg.gp_weight,
        hu_bounds=tuple(float(b) for b in cfg.desired_HU_bounds),
        scaler=scaler,
        augment=augment,
        dtype=dtype,
        compiler_options=resolve_compiler_options(cfg),
    )
    trainer_config = TrainerConfig(
        train_iterations=cfg.train_iterations,
        train_critic_every=cfg.train_critic_every,
        train_generator_every=cfg.train_generator_every,
        val_every=cfg.validate_every,
        val_iterations=cfg.val_iterations,
        log_every=cfg.log_every,
        log_images_every=cfg.log_images_every,
        checkpoint_every=cfg.checkpoint_every,
        checkpoint_keep=cfg.checkpoint_keep,
        checkpoint_dir=checkpoint_dir,
        cycle_length=1,  # resolved below against the INSTANCE cadences
    )
    # auto-fusing must validate against the stop_sync_every this TrainerConfig
    # actually carries, not the class default (ADVICE r4)
    trainer_config = dataclasses.replace(
        trainer_config,
        cycle_length=resolve_cycle_length(cfg, trainer_config.stop_sync_every),
    )

    rng = np.random.default_rng(seed)
    if cfg.logger == "wandb" and HAS_WANDB:
        # 2D runs render the batch as one slice grid (reference WandbLogger2D)
        wandb_cls = WandbLogger2D if cfg.is_2d else WandbLogger
        logger_interface: LoggerInterface = MultiThreadedLogger(wandb_cls(scaler, rng=rng))
    elif cfg.logger == "file":
        # offline sink: JSONL scalars + PNG grids next to the checkpoints
        # (or under the project logs dir when no checkpoint dir is given)
        from contrast_gan_3d_tpu import config as paths

        out_dir = (
            Path(checkpoint_dir) / "metrics"
            if checkpoint_dir
            else paths.LOGS_DIR / cfg.name / "metrics"
        )
        file_cls = FileLogger2D if cfg.is_2d else FileLogger
        logger_interface = MultiThreadedLogger(file_cls(scaler, out_dir, rng=rng))
    elif cfg.logger == "tensorboard":
        # live local backend (tensorboardX): curves + image summaries in the
        # same logdir family as the XProf traces
        from contrast_gan_3d_tpu import config as paths
        from contrast_gan_3d_tpu.trainer.logger import (
            TensorBoardLogger, TensorBoardLogger2D,
        )

        out_dir = (
            Path(checkpoint_dir) / "tb"
            if checkpoint_dir
            else paths.LOGS_DIR / cfg.name / "tb"
        )
        tb_cls = TensorBoardLogger2D if cfg.is_2d else TensorBoardLogger
        logger_interface = MultiThreadedLogger(tb_cls(scaler, out_dir, rng=rng))
    elif cfg.logger == "console" or (cfg.logger == "wandb" and not HAS_WANDB):
        logger_interface = ConsoleLogger()
    elif cfg.logger == "none":
        logger_interface = NoopLogger()
    else:
        # a typo ("Wandb", "files") must not silently disable all logging
        # for a 10k-iteration run
        raise ValueError(
            f"unknown logger {cfg.logger!r}: expected wandb | tensorboard | "
            "file | console | none"
        )

    return BuiltExperiment(
        config=cfg,
        generator=generator,
        critic=critic,
        gen_tx=gen_tx,
        critic_tx=critic_tx,
        step_config=step_config,
        trainer_config=trainer_config,
        scaler=scaler,
        logger_interface=logger_interface,
        seed=seed,
        host_augmenter=host_augmenter,
    )

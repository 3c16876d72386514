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
    # sustained-throughput scalar appears from the second log point on
    assert any("patches_per_sec" in s for _, _, s in train_logs)
    assert all(
        s["patches_per_sec"] > 0 for _, _, s in train_logs if "patches_per_sec" in s
    )
    # per-phase time budget: tb/ window scalars at log boundaries, totals on
    # the trainer afterwards (the sustained-gap attribution, PERF.md round 3)
    assert any(
        k.startswith("tb/") for _, _, s in train_logs for k in s
    ), "no tb/ scalars logged"
    tb = trainer.time_budget
    assert tb.total["data_wait"] > 0 and tb.total["dispatch"] > 0
    assert tb.total["validation"] > 0 and tb.total["checkpoint"] > 0
    assert "time budget over" in tb.summary() and "dispatch" in tb.summary()
    # critic trained and was clipped
    clip = trainer.step_cfg.weight_clip
    for leaf in jax.tree_util.tree_leaves(state.critic_params):
        assert np.abs(np.asarray(leaf)).max() <= clip + 1e-6
    # checkpoints written: the periodic checkpoint_every=2 save (named for
    # the completed step count) AND the final save — asserting only the
    # final one would let periodic checkpointing silently break
    names = sorted(p.name for p in ckpt_dir.glob("*.msgpack"))
    assert {"3.msgpack", "4.msgpack"} <= set(names), names

    # resume: a fresh trainer picks up from the final checkpoint
    trainer2 = _build_trainer(tmp_path, RecordingLogger(), ckpt_dir=ckpt_dir, iterations=4)
    assert trainer2.iteration == 4


def test_image_logging_gates(tmp_path, rng, monkeypatch):
    """_can_log_images: False for loggers that drop images (no preview
    dispatch for nothing) and under multi-process meshes (batches span
    hosts — np.asarray on them would raise); True for recording/wandb-style
    loggers. MultiThreadedLogger mirrors its inner logger."""
    from contrast_gan_3d_tpu.trainer.logger import (
        ConsoleLogger, MultiThreadedLogger, NoopLogger,
    )

    assert NoopLogger.logs_images is False
    assert ConsoleLogger.logs_images is False
    rec = RecordingLogger()
    assert getattr(rec, "logs_images", True) is True
    assert MultiThreadedLogger(NoopLogger()).logs_images is False
    assert MultiThreadedLogger(rec).logs_images is True

    trainer = _build_trainer(tmp_path, NoopLogger())
    assert not trainer._can_log_images()
    trainer = _build_trainer(tmp_path, rec)
    assert trainer._can_log_images()

    # multi-process mesh: refused (with a one-time warning), even for an
    # image-capable logger
    import contrast_gan_3d_tpu.trainer.trainer as trainer_mod

    trainer.mesh = object()  # only checked for None-ness on this path
    monkeypatch.setattr(trainer_mod.jax, "process_count", lambda: 2)
    assert not trainer._can_log_images()
    assert trainer._warned_multiproc_images


@pytest.mark.slow
def test_noop_logger_skips_preview_dispatch(tmp_path, rng):
    """With a NoopLogger, an image-log-due iteration must not run the
    preview step (a wasted dispatch + rng snapshot every cadence hit)."""
    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    loaders = create_loaders(
        fold, PATCH, {0: 1, -1: 1, 1: 1}, rng, num_threads=1, prefetch=2,
        to_device=False,
    )
    from contrast_gan_3d_tpu.trainer.logger import NoopLogger

    trainer = _build_trainer(tmp_path, NoopLogger(), iterations=4)
    assert trainer._preview_step is not None  # device-augment config
    calls = {"n": 0}
    real = trainer._preview_step

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    trainer._preview_step = spy
    trainer.fit(loaders)  # log_images_every=3 → iteration 3 is images-due
    assert calls["n"] == 0


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
    # strip the host-side bookkeeping scalars (throughput + per-phase time
    # budget) — this test pins the DEVICE metrics each schedule branch emits
    by_step = {
        s: {k for k in sc if k != "patches_per_sec" and not k.startswith("tb/")}
        for stage, s, sc in log.scalars
        if stage == "train"
    }
    assert by_step[0] == {"D", "G", "G-full", "sim", "HU"}  # combined
    assert by_step[1] == {"D"}  # critic only


def test_mesh_validate_padding_exact(tmp_path, rng):
    """Sharded validation must produce the same losses as single-device
    validation even when the val batch (3) does not divide the mesh (8):
    padding is masked out of the losses exactly."""
    from contrast_gan_3d_tpu.parallel.mesh import data_mesh

    fold = make_dataset(tmp_path, rng, n_per_label=1)
    log_a, log_b = RecordingLogger(), RecordingLogger()
    t_single = _build_trainer(tmp_path, log_a)
    t_mesh = _build_trainer(tmp_path, log_b)
    t_mesh.mesh = data_mesh()
    from contrast_gan_3d_tpu.trainer.steps import build_val_steps
    from contrast_gan_3d_tpu.parallel.mesh import put_replicated

    t_mesh.val_opt_step, t_mesh.val_subopt_step = build_val_steps(
        t_mesh.generator, t_mesh.critic, t_mesh.step_cfg, mesh=t_mesh.mesh
    )
    # identical states
    t_mesh.state = put_replicated(
        jax.device_get(t_single.state), t_mesh.mesh
    )

    loaders = create_loaders(
        fold, PATCH, {0: 3, -1: 3, 1: 3}, rng, num_threads=1, to_device=False
    )
    batches = {k: next(l) for k, l in loaders.items()}
    for l in loaders.values():
        l.stop()

    class Replay:
        def __init__(self, b):
            self.b = b

        def __next__(self):
            return self.b

    t_single.validate({k: Replay(b) for k, b in batches.items()}, 1)
    t_mesh.validate({k: Replay(b) for k, b in batches.items()}, 1)
    (_, _, va), (_, _, vb) = log_a.scalars[-1:] + log_b.scalars[-1:]
    for k in va:
        np.testing.assert_allclose(va[k], vb[k], rtol=2e-5, atol=1e-6, err_msg=k)


def test_preview_logs_the_augmented_batch(tmp_path, rng):
    """With on-device augmentation, logged train images must show the batch
    the step actually trained on: the preview re-derives the step's
    augmentation from the pre-step PRNG key."""
    import jax.numpy as jnp

    from contrast_gan_3d_tpu.data.augment import augment_batch
    from contrast_gan_3d_tpu.alias import ScanType

    fold = make_dataset(tmp_path, rng, n_per_label=1)
    log = RecordingLogger()
    trainer = _build_trainer(tmp_path, log, iterations=1)
    # force augmentation to always fire so the preview visibly differs from
    # the raw batch
    import dataclasses

    from contrast_gan_3d_tpu.trainer.steps import StepConfig, build_preview_step
    from contrast_gan_3d_tpu.data.augment import AugmentConfig

    aug = AugmentConfig(p_elastic=1.0, p_scale=1.0, p_rotation=1.0, elastic_grid=4)
    trainer.step_cfg = dataclasses.replace(trainer.step_cfg, augment=aug)
    trainer._preview_step = build_preview_step(trainer.generator, trainer.step_cfg)

    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, rng, num_threads=1, to_device=False
    )
    patches = {st.value: next(loaders[st.value]) for st in ScanType}
    for l in loaders.values():
        l.stop()

    rng_before = trainer.state.rng
    subopt = np.concatenate(
        [patches[ScanType.LOW.value]["data"], patches[ScanType.HIGH.value]["data"]]
    )
    mask = np.concatenate(
        [patches[ScanType.LOW.value]["seg"], patches[ScanType.HIGH.value]["seg"]]
    )
    # expected: the exact augmented+scaled batch the step consumes
    _, k_aug, _ = jax.random.split(rng_before, 3)
    _, k2 = jax.random.split(k_aug)
    exp_sub, _ = augment_batch(
        jnp.asarray(subopt, jnp.float32), jnp.asarray(mask, jnp.float32), k2, aug
    )
    expected = np.asarray(trainer.step_cfg.scaler(exp_sub))

    trainer._log_train_images(
        jnp.asarray(subopt), jnp.asarray(mask),
        list(patches[ScanType.LOW.value]["name"]) + list(patches[ScanType.HIGH.value]["name"]),
        0, rng_before=rng_before,
    )
    logged_sample = np.asarray(log.images[-1][0])
    np.testing.assert_allclose(logged_sample, expected, atol=1e-5)
    assert not np.allclose(
        logged_sample, np.asarray(trainer.step_cfg.scaler(subopt.astype(np.float32)))
    )


@pytest.mark.slow
def test_noop_iterations_advance_step(tmp_path, rng):
    """Schedules with iterations that train NEITHER net (critic every 2,
    generator every 4 -> odd iterations are no-ops) must still advance
    state.step, or checkpoints/resume drift from the python iteration count
    and the data stream position."""
    from contrast_gan_3d_tpu.data.augment import AugmentConfig
    from contrast_gan_3d_tpu.trainer.steps import StepConfig

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    loaders = create_loaders(
        fold, PATCH, {0: 1, -1: 1, 1: 1}, rng, num_threads=1, prefetch=1,
        to_device=False,
    )
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    log = RecordingLogger()
    cfg = TrainerConfig(
        train_iterations=4, train_critic_every=2, train_generator_every=4,
        val_every=None, log_every=1, log_images_every=None, checkpoint_every=None,
    )
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=AugmentConfig(elastic_grid=4)),
        cfg, jax.random.key(0), PATCH, logger_interface=log,
    )
    state = trainer.fit(loaders)
    assert int(state.step) == 4  # 2 trained + 2 no-op iterations all counted
    # only the even iterations produced metrics
    train_steps_logged = sorted(s for st, s, _ in log.scalars if st == "train")
    assert train_steps_logged == [0, 2]


@pytest.mark.slow
def test_resume_is_exactly_equivalent_to_uninterrupted(tmp_path, rng):
    """Train 4 iterations straight vs train 2 -> checkpoint -> fresh trainer
    resumes -> 2 more: final params, opt state and the PRNG key must be
    IDENTICAL (full-state checkpoint + checkpointed host data stream). The
    reference cannot make this guarantee (critic and augmenter rngs are not
    saved)."""
    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)

    def mk_loaders(seed):
        return create_loaders(
            fold, PATCH, {0: 1, -1: 1, 1: 1}, np.random.default_rng(seed),
            num_threads=1, prefetch=1, to_device=False,
        )

    # uninterrupted: 4 iterations
    t_a = _build_trainer(tmp_path, RecordingLogger(), ckpt_dir=tmp_path / "a",
                         iterations=4)
    state_a = t_a.fit(mk_loaders(7))

    # interrupted: 2 iterations, then a FRESH trainer auto-resumes for 2 more
    t_b1 = _build_trainer(tmp_path, RecordingLogger(), ckpt_dir=tmp_path / "b",
                          iterations=2)
    t_b1.fit(mk_loaders(7))
    t_b2 = _build_trainer(tmp_path, RecordingLogger(), ckpt_dir=tmp_path / "b",
                          iterations=4)
    assert t_b2.iteration == 2  # picked up the checkpoint
    state_b = t_b2.fit(mk_loaders(7))

    flat_a = jax.tree_util.tree_leaves_with_path(
        {"g": state_a.gen_params, "c": state_a.critic_params,
         "go": state_a.gen_opt, "co": state_a.critic_opt}
    )
    flat_b = jax.tree_util.tree_leaves(
        {"g": state_b.gen_params, "c": state_b.critic_params,
         "go": state_b.gen_opt, "co": state_b.critic_opt}
    )
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(path),
        )
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(state_a.rng)),
        np.asarray(jax.random.key_data(state_b.rng)),
    )


class _ActAtStepLogger(RecordingLogger):
    """Fires a callback the first time a train scalar for ``at_step`` logs."""

    def __init__(self, at_step, action):
        super().__init__()
        self.at_step, self.action, self._fired = at_step, action, False

    def log_scalars(self, scalars, step, stage="train"):
        super().log_scalars(scalars, step, stage)
        if stage == "train" and step >= self.at_step and not self._fired:
            self._fired = True
            self.action()


def test_graceful_stop_checkpoints_and_resumes(tmp_path, rng):
    """request_stop() exits at the next iteration boundary and the normal
    end-of-fit path persists model + data-stream state — a preempted run
    resumes exactly where it stopped instead of replaying up to 1000
    iterations (TPU pods are routinely evicted; the reference loses
    everything since its last periodic save)."""
    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, rng, num_threads=1, prefetch=2,
        to_device=False,
    )
    holder = {}
    log = _ActAtStepLogger(1, lambda: holder["t"].request_stop("test"))
    ckpt_dir = tmp_path / "ckpt"
    trainer = _build_trainer(tmp_path, log, ckpt_dir=ckpt_dir, iterations=40)
    holder["t"] = trainer
    state = trainer.fit(loaders)

    stopped_at = int(state.step)
    assert 1 <= stopped_at < 40, stopped_at  # exited early, not at the end
    assert trainer.stop_requested
    # final checkpoint + data sidecar written for the break step
    assert (ckpt_dir / f"{stopped_at}.msgpack").exists()
    assert list(ckpt_dir.glob(f"{stopped_at}.data.*")), "no data sidecar"
    # a fresh trainer resumes from the break step
    resumed = _build_trainer(
        tmp_path, RecordingLogger(), ckpt_dir=ckpt_dir, iterations=40
    )
    assert resumed.iteration == stopped_at


def test_preemption_handler_sigterm_graceful_then_escalates(tmp_path, rng):
    """First SIGTERM -> graceful stop mid-fit; a second delivery escalates
    (KeyboardInterrupt) for runs wedged inside a device call."""
    import signal as sig

    from contrast_gan_3d_tpu.trainer.trainer import install_preemption_handler

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, rng, num_threads=1, prefetch=2,
        to_device=False,
    )
    log = _ActAtStepLogger(1, lambda: sig.raise_signal(sig.SIGTERM))
    trainer = _build_trainer(tmp_path, log, ckpt_dir=tmp_path / "ck", iterations=40)
    prev = install_preemption_handler(trainer)
    try:
        state = trainer.fit(loaders)
        assert trainer.stop_requested
        assert int(state.step) < 40
        with pytest.raises(KeyboardInterrupt):
            sig.raise_signal(sig.SIGTERM)
    finally:
        for signum, handler in prev.items():
            sig.signal(signum, handler)


def test_graceful_stop_without_checkpointing_breaks_and_warns(tmp_path, rng, caplog):
    """With checkpointing disabled a requested stop still breaks the loop
    (Ctrl-C must stop an ad-hoc run) but the break path states loudly that
    progress is discarded — an orchestrator reading exit 0 plus the normal
    'checkpoint follows' message would believe a checkpoint existed."""
    from contrast_gan_3d_tpu.trainer import trainer as trainer_mod

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, rng, num_threads=1, prefetch=2,
        to_device=False,
    )
    holder = {}
    log = _ActAtStepLogger(1, lambda: holder["t"].request_stop("test"))
    trainer = _build_trainer(tmp_path, log, ckpt_dir=None, iterations=40)
    holder["t"] = trainer
    trainer_mod.logger.addHandler(caplog.handler)
    try:
        state = trainer.fit(loaders)
    finally:
        trainer_mod.logger.removeHandler(caplog.handler)
    assert 1 <= int(state.step) < 40  # the stop still breaks the loop
    msgs = [r.getMessage() for r in caplog.records]
    assert any("DISABLED" in m and "discarded" in m for m in msgs), msgs
    assert not any("checkpoint + data sidecars follow" in m for m in msgs)
    # the FIRST line an operator sees (request_stop itself) must not claim
    # a checkpoint will be written when checkpointing is disabled
    first = next(m for m in msgs if "Graceful stop requested" in m)
    assert "WITHOUT a checkpoint" in first, first
    assert "then checkpointing" not in first, first


def test_split_combined_forces_per_iteration_dispatch(caplog):
    """ADVICE r3: cycle programs inline the fused combined step — the exact
    graph split_combined exists to avoid. The Trainer must fall back to
    per-iteration dispatch (warned), not silently compile the fused cycle."""
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
    )
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    cfg = TrainerConfig(train_iterations=4, cycle_length=5)
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=None), cfg,
        jax.random.key(0), PATCH, split_combined=True,
    )
    assert trainer.cfg.cycle_length == 1
    assert cfg.cycle_length == 5  # caller's config object untouched
    # without the split request the cycle length stands
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=None), cfg,
        jax.random.key(0), PATCH,
    )
    assert trainer.cfg.cycle_length == 5


@pytest.mark.slow
def test_fit_mesh_plus_cycle_end_to_end(tmp_path, rng):
    """Fused cycles are the production DEFAULT (round 4) and meshes are the
    scale-out path — the fit-level composition (stacked (K,B,...) batches
    assembled from loader streams, put batch-sharded, one cycle program per
    pattern) must run end-to-end, not just the steps-level dryrun."""
    from contrast_gan_3d_tpu.parallel.mesh import data_mesh

    fold = make_dataset(tmp_path / "data", rng, n_per_label=2)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, rng, num_threads=1, prefetch=2,
        to_device=False,
    )
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
    )
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    log = RecordingLogger()
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=None),
        TrainerConfig(
            train_iterations=5, train_critic_every=1,
            train_generator_every=2, val_every=None, log_every=1,
            log_images_every=None, checkpoint_every=None,
            cycle_length=2,  # 5 iterations -> cycles of 2, 2, then a 1-tail
        ),
        jax.random.key(0), PATCH, logger_interface=log,
        mesh=data_mesh(2),
    )
    state = trainer.fit(loaders)
    assert int(jax.device_get(state.step)) == 5
    train_logs = [s for s in log.scalars if s[0] == "train"]
    assert train_logs, "cycle boundaries must still log"
    for _, _, scalars in train_logs:
        for v in scalars.values():
            assert np.isfinite(v)

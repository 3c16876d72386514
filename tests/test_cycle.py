"""Fused schedule cycles (steps.build_cycle_step / TrainerConfig.cycle_length):
K schedule iterations as ONE compiled program — exact composition of the
per-iteration programs, K host round-trips -> 1. The reference's eager loop
pays Python+launch per iteration (reference trainer/Trainer.py:218-241);
this is the compile-the-schedule TPU shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.data.pipeline import create_loaders
from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.trainer.optim import make_optimizer
from contrast_gan_3d_tpu.trainer.steps import (
    StepConfig,
    build_cycle_step,
    build_train_steps,
    init_state,
    schedule_branches,
)
from contrast_gan_3d_tpu.trainer.trainer import Trainer, TrainerConfig

from tests.synth import make_dataset

PATCH = (16, 16, 16)


def test_schedule_branches_patterns():
    # the reference schedule: critic every iteration, generator every 5th
    assert schedule_branches(1, 5, 0, 5) == (
        "combined", "critic", "critic", "critic", "critic",
    )
    assert schedule_branches(1, 5, 5, 5) == (
        "combined", "critic", "critic", "critic", "critic",
    )
    # offset start (resume mid-cycle): pattern follows ABSOLUTE iteration
    assert schedule_branches(1, 5, 3, 4) == (
        "critic", "critic", "combined", "critic",
    )
    # generator-heavy schedule (train_generator_more_3D: G every 1, D every 5)
    assert schedule_branches(5, 1, 0, 6) == (
        "combined", "generator", "generator", "generator", "generator",
        "combined",
    )
    # schedules with idle iterations + None = never
    assert schedule_branches(2, 4, 1, 3) == ("none", "critic", "none")
    assert schedule_branches(2, 4, 3, 2) == ("none", "combined")
    assert schedule_branches(None, 2, 0, 3) == ("generator", "none", "generator")


def _tiny_setup(gp=False):
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
    )
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    cfg = StepConfig(weight_clip=None if gp else 0.01)
    state = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    steps = build_train_steps(gen, critic, tx, tx, cfg)
    rng = np.random.default_rng(0)
    batches = [
        tuple(
            jnp.asarray(rng.integers(-500, 500, (2, *PATCH), dtype=np.int16))
            for _ in range(2)
        ) + (jnp.asarray((rng.random((2, *PATCH)) < 0.01).astype(np.int16)),)
        for _ in range(5)
    ]
    return steps, state, batches


@pytest.mark.parametrize("gp", [False, True])
def test_cycle_equals_per_iteration_dispatch(gp):
    """One 5-iteration cycle == five per-iteration dispatches: params,
    optimizer state, rng and step all match (the inner programs inline)."""
    steps, state0, batches = _tiny_setup(gp)
    pattern = schedule_branches(1, 5, 0, 5)

    # reference trajectory: per-iteration dispatch, Trainer branch logic
    state_ref = state0
    d_losses = []
    for branch, (o, s, m) in zip(pattern, batches):
        fn = steps.combined_step if branch == "combined" else steps.critic_step
        state_ref, mt = fn(state_ref, o, s, m)
        d_losses.append(float(mt["D"]))

    # cycle: one dispatch over the stacked batches (state0 was donated by
    # the loop above — rebuild it; init is deterministic)
    _, state0b, _ = _tiny_setup(gp)
    cycle = build_cycle_step(steps, pattern)
    opt_c = jnp.stack([b[0] for b in batches])
    sub_c = jnp.stack([b[1] for b in batches])
    msk_c = jnp.stack([b[2] for b in batches])
    state_cyc, metrics = cycle(state0b, opt_c, sub_c, msk_c)

    assert int(state_cyc.step) == int(state_ref.step) == 5
    np.testing.assert_array_equal(
        jax.random.key_data(state_cyc.rng), jax.random.key_data(state_ref.rng)
    )
    for ref, got in zip(
        jax.tree_util.tree_leaves((state_ref.gen_params, state_ref.critic_params,
                                   state_ref.gen_opt, state_ref.critic_opt)),
        jax.tree_util.tree_leaves((state_cyc.gen_params, state_cyc.critic_params,
                                   state_cyc.gen_opt, state_cyc.critic_opt)),
    ):
        # GP's double-backward reassociates under the cycle's larger fusion
        # scope — observed max rel diff 1.5e-4 on CPU; WC composes tighter
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(got, np.float32),
            rtol=5e-4 if gp else 2e-5, atol=1e-5 if gp else 2e-6,
        )
    # D is the mean critic loss over the cycle; the generator keys are the
    # cycle's last values
    np.testing.assert_allclose(float(metrics["D"]), np.mean(d_losses), rtol=1e-5)
    assert {"G", "G-full", "sim", "HU"} <= set(metrics)


def test_cycle_none_branch_advances_step_only():
    steps, state0, batches = _tiny_setup()
    # snapshot BEFORE the call: the cycle donates its state argument
    before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state0.gen_params)]
    cycle = build_cycle_step(steps, ("none", "none"))
    o = jnp.stack([batches[0][0], batches[1][0]])
    s = jnp.stack([batches[0][1], batches[1][1]])
    m = jnp.stack([batches[0][2], batches[1][2]])
    state, metrics = cycle(state0, o, s, m)
    assert metrics == {}
    assert int(state.step) == 2
    for a, b in zip(before, jax.tree_util.tree_leaves(state.gen_params)):
        np.testing.assert_array_equal(a, np.asarray(b))


class _Recorder:
    logs_images = False

    def __init__(self):
        self.scalars = []

    def log_scalars(self, scalars, step, stage="train"):
        self.scalars.append((stage, step, scalars))

    def log_images(self, *a, **k):
        pass

    def end_hook(self):
        pass


def _fit_trainer(tmp_path, rng, cycle_length, iterations=6, subdir="d"):
    # fixed dataset seed: both fits must see IDENTICAL patients + streams
    fold = make_dataset(tmp_path / subdir, np.random.default_rng(1234), n_per_label=2)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, np.random.default_rng(0),
        num_threads=1, prefetch=2, to_device=False,
    )
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
    )
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    log = _Recorder()
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=None),
        TrainerConfig(
            train_iterations=iterations, train_critic_every=1,
            train_generator_every=2, val_every=None, log_every=2,
            log_images_every=None, checkpoint_every=None,
            cycle_length=cycle_length,
        ),
        jax.random.key(0), PATCH, logger_interface=log,
    )
    state = trainer.fit(loaders)
    return state, log


@pytest.mark.slow
def test_trainer_cycle_mode_matches_per_iteration(tmp_path, rng):
    """fit with cycle_length=2 == fit with per-iteration dispatch: same
    data stream (single-threaded loaders), same final params/step; scalar
    logs land on cycle boundaries."""
    state1, log1 = _fit_trainer(tmp_path, rng, cycle_length=1, subdir="a")
    state2, log2 = _fit_trainer(tmp_path, rng, cycle_length=2, subdir="b")
    assert int(state1.step) == int(state2.step) == 6
    for a, b in zip(
        jax.tree_util.tree_leaves((state1.gen_params, state1.critic_params)),
        jax.tree_util.tree_leaves((state2.gen_params, state2.critic_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-6,
        )
    steps1 = [s for _, s, _ in log1.scalars]
    steps2 = [s for _, s, _ in log2.scalars]
    assert steps1 == [0, 2, 4] and steps2 == [0, 2, 4]
    # same device metrics at the shared boundaries (D at an even boundary is
    # that iteration's critic loss in per-iteration mode vs the cycle mean —
    # compare the generator keys, which are last-value in both)
    for (s1, sc1), (s2, sc2) in zip(
        [(s, sc) for _, s, sc in log1.scalars],
        [(s, sc) for _, s, sc in log2.scalars],
    ):
        assert s1 == s2
        for k in ("G", "G-full", "sim", "HU"):
            if k in sc1 and k in sc2:
                np.testing.assert_allclose(sc1[k], sc2[k], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_trainer_cycle_mode_sharded(tmp_path, rng):
    """cycle_length works under a data-parallel mesh (the 'c' sharding
    kind): one cycle program over the 8-device CPU mesh."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from contrast_gan_3d_tpu.parallel.mesh import data_mesh, put_replicated

    mesh = data_mesh(2)
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
    )
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    cfg = StepConfig(weight_clip=0.01)
    steps = build_train_steps(gen, critic, tx, tx, cfg, mesh=mesh)
    state = put_replicated(
        init_state(gen, critic, tx, tx, jax.random.key(0), PATCH), mesh
    )
    cycle = build_cycle_step(steps, schedule_branches(1, 5, 0, 5), mesh=mesh)
    rng_np = np.random.default_rng(0)
    o = jnp.asarray(rng_np.integers(-500, 500, (5, 2, *PATCH), dtype=np.int16))
    s = jnp.asarray(rng_np.integers(-500, 500, (5, 2, *PATCH), dtype=np.int16))
    m = jnp.asarray((rng_np.random((5, 2, *PATCH)) < 0.01).astype(np.int16))
    state, metrics = cycle(state, o, s, m)
    assert int(state.step) == 5
    for v in metrics.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_cycle_resume_realigns_boundaries(tmp_path, rng):
    """A run resumed mid-cycle gets one SHORT first cycle so later
    boundaries stay on multiples of K — %-based cadences keep firing."""
    fold = make_dataset(tmp_path / "d", np.random.default_rng(7), n_per_label=2)

    def fit(iterations):
        loaders = create_loaders(
            fold, PATCH, {0: 2, -1: 1, 1: 1}, np.random.default_rng(0),
            num_threads=1, prefetch=2, to_device=False,
        )
        gen = ResnetGenerator(
            n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
        )
        critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
        tx = make_optimizer(lr=1e-3)
        log = _Recorder()
        trainer = Trainer(
            gen, critic, tx, tx, StepConfig(augment=None),
            TrainerConfig(
                train_iterations=iterations, train_critic_every=1,
                train_generator_every=2, val_every=None, log_every=2,
                log_images_every=None, checkpoint_every=1,
                checkpoint_dir=str(tmp_path / "ckpt"), cycle_length=2,
            ),
            jax.random.key(0), PATCH, logger_interface=log,
        )
        state = trainer.fit(loaders)
        return state, log

    state1, log1 = fit(3)  # boundaries 0 (k=2), 2 (k=1 tail) -> step 3
    assert int(state1.step) == 3
    state2, log2 = fit(7)  # resumes at 3: cycles 3(k=1), 4(k=2), 6(k=1)
    assert int(state2.step) == 7
    # boundaries realigned to multiples of 2 -> log_every=2 fires at 4 and 6
    assert [s for _, s, _ in log2.scalars] == [4, 6]


class _ImageRecorder(_Recorder):
    logs_images = True

    def __init__(self):
        super().__init__()
        self.images = []

    def log_images(self, *a, **k):
        self.images.append(a)


@pytest.mark.slow
def test_cycle_preview_skips_none_first_branch(tmp_path, rng):
    """The preview pairs the cycle's first batch with the pre-cycle rng;
    a cycle whose FIRST branch is 'none' never consumed that rng, so its
    preview is skipped (critic_every=4, generator_every=3, K=2: cycle at
    iteration 2 is ('none','generator') -> no images; cycle at 0 renders)."""
    fold = make_dataset(tmp_path / "d", np.random.default_rng(7), n_per_label=2)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, np.random.default_rng(0),
        num_threads=1, prefetch=2, to_device=False,
    )
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
    )
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    log = _ImageRecorder()
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=None),
        TrainerConfig(
            train_iterations=4, train_critic_every=4, train_generator_every=3,
            val_every=None, log_every=None, log_images_every=2,
            checkpoint_every=None, cycle_length=2,
        ),
        jax.random.key(0), PATCH, logger_interface=log,
    )
    trainer.fit(loaders)
    # iteration-0 cycle: ('combined','none') -> preview; iteration-2 cycle:
    # ('none','generator') -> metrics non-empty BUT preview skipped
    assert len(log.images) == 1


def test_first_flush_omits_patches_per_sec(tmp_path):
    """The first flushed boundary after a (re)start has no prior fetch
    completion to bracket against — emitting patches_per_sec there would
    span fit-entry..flush (one lag window longer than the patch window) and
    understate throughput severalfold; later flushes emit it."""
    import types

    from contrast_gan_3d_tpu.trainer.trainer import Trainer

    log = _Recorder()
    t = types.SimpleNamespace(
        _pending_logs=[
            {"iteration": 10, "metrics": {"D": jnp.float32(1.0)},
             "n_patches": 4, "tb": {}},
            {"iteration": 20, "metrics": {"D": jnp.float32(2.0)},
             "n_patches": 4, "tb": {}},
        ],
        _last_fetch=(0, None),  # resumed at 0; nothing fetched yet
        logger_interface=log,
    )
    Trainer._flush_oldest_log(t)
    Trainer._flush_oldest_log(t)
    (first, second) = [sc for _, _, sc in log.scalars]
    assert "patches_per_sec" not in first
    assert second["patches_per_sec"] > 0

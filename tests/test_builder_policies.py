"""Builder policy tests: remat auto heuristic, augment backend selection."""

from dataclasses import replace

from contrast_gan_3d_tpu.experiments import load_config
from contrast_gan_3d_tpu.experiments.builder import build


def test_remat_auto_off_at_reference_batch():
    built = build(load_config("basic_3d"))
    assert built.generator.remat is False  # 25M voxels/iter fits 16 GB


def test_remat_auto_on_for_oversized_configs():
    built = build(load_config("small_patch"))  # 80 x (128,128,32) = 42M voxels
    assert built.generator.remat is True
    assert built.critic.remat is True


def test_remat_explicit_override_wins():
    cfg = replace(load_config("small_patch"), remat=False)
    assert build(cfg).generator.remat is False
    cfg = replace(load_config("basic_3d"), remat=True)
    assert build(cfg).generator.remat is True


def test_host_augmenter_selected_when_native():
    from contrast_gan_3d_tpu import native

    built = build(load_config("basic_3d"))
    if native.has_native():
        assert built.host_augmenter is not None
        assert built.step_config.augment is None  # warp moved off-device
    else:
        assert built.step_config.augment is not None


def test_device_backend_keeps_jitted_augment():
    cfg = replace(load_config("basic_3d"), augment_backend="device")
    built = build(cfg)
    assert built.host_augmenter is None
    assert built.step_config.augment is not None


def test_2d_config_uses_2d_augment():
    from contrast_gan_3d_tpu import native
    from contrast_gan_3d_tpu.data.augment import Augment2DConfig
    from contrast_gan_3d_tpu.data.host_augment import HostAugmenter2D

    built = build(load_config("conf_2d"))
    if native.has_native():  # default backend: host warp in the prefetchers
        assert isinstance(built.host_augmenter, HostAugmenter2D)
        assert built.step_config.augment is None
    else:
        assert isinstance(built.step_config.augment, Augment2DConfig)
    assert built.generator.remat is False  # 2D never remats

    built = build(replace(load_config("conf_2d"), augment_backend="device"))
    assert built.host_augmenter is None
    assert isinstance(built.step_config.augment, Augment2DConfig)


def test_layout_auto_packs_eligible_3d():
    built = build(load_config("basic_3d"))
    assert built.generator.layout == "packed"
    # remat configs stay eligible (packed stages support nn.remat)
    built = build(load_config("small_patch"))
    assert built.generator.layout == "packed"


def test_layout_auto_direct_for_2d():
    built = build(load_config("conf_2d"))
    assert built.generator.layout == "direct"


def test_layout_explicit_override():
    cfg = replace(load_config("basic_3d"), generator_layout="direct")
    assert build(cfg).generator.layout == "direct"


def test_layout_auto_direct_for_unaligned_patches():
    cfg = replace(load_config("basic_3d"), train_patch_size=(126, 126, 126))
    assert build(cfg).generator.layout == "direct"


def test_layout_auto_direct_without_updownsampling():
    """The packed pipeline needs >= 1 up/down block (the f_out=1 unpack
    rides the last downsample) — auto must fall back to direct."""
    cfg = replace(
        load_config("basic_3d"),
        generator_args={"n_resnet_blocks": 2, "n_updownsample_blocks": 0,
                        "init_channels_out": 4},
    )
    assert build(cfg).generator.layout == "direct"


def test_model_args_may_override_builder_defaults():
    """generator_args/critic_args carrying remat/dtype/ndim used to raise
    duplicate-keyword TypeErrors; explicit user values win now."""
    cfg = replace(
        load_config("basic_3d"),
        generator_args={"n_resnet_blocks": 1, "n_updownsample_blocks": 1,
                        "init_channels_out": 2, "remat": True},
        critic_args={"init_channels_out": 2, "discriminator_depth": 1,
                     "remat": True},
    )
    built = build(cfg)
    assert built.generator.remat and built.critic.remat


def test_host_augmenter_seeded_deterministically():
    """Default config (seed=None): the host augmenter must get the
    DEFAULT_SEED fallback, not OS entropy."""
    from contrast_gan_3d_tpu import native

    if not native.has_native():
        import pytest

        pytest.skip("no native toolchain")
    rngs = [
        build(load_config("basic_3d")).host_augmenter.rng.bit_generator.state
        for _ in range(2)
    ]
    assert rngs[0] == rngs[1]


def test_checkpoint_keep_wired_through():
    """cfg.checkpoint_keep reaches the TrainerConfig (bounds checkpoint disk
    on long runs; default None = keep-all, the reference behavior)."""
    built = build(load_config("basic_3d"))
    assert built.trainer_config.checkpoint_keep is None
    built = build(replace(load_config("basic_3d"), checkpoint_keep=3))
    assert built.trainer_config.checkpoint_keep == 3


def test_unknown_logger_is_rejected():
    import pytest

    with pytest.raises(ValueError, match="unknown logger"):
        build(replace(load_config("basic_3d"), logger="Wandb"))


def test_cycle_length_auto_picks_schedule_period():
    """Production default (VERDICT r3 #3): every reference preset's cadences
    divide the 5-iteration schedule, so auto fuses cycles."""
    built = build(load_config("basic_3d"))
    assert built.trainer_config.cycle_length == 5


def test_cycle_length_auto_falls_back_on_non_dividing_cadence():
    cfg = replace(load_config("basic_3d"), log_every=7)
    assert build(cfg).trainer_config.cycle_length == 1


def test_cycle_length_explicit_overrides_auto():
    cfg = replace(load_config("basic_3d"), cycle_length=1)
    assert build(cfg).trainer_config.cycle_length == 1
    cfg = replace(load_config("basic_3d"), cycle_length=3)
    assert build(cfg).trainer_config.cycle_length == 3


def test_cycle_length_auto_every_preset_resolves():
    """Auto must never pick a K any preset's cadences don't divide."""
    from contrast_gan_3d_tpu.experiments import PRESETS
    from contrast_gan_3d_tpu.experiments.builder import resolve_cycle_length
    from contrast_gan_3d_tpu.trainer.trainer import TrainerConfig

    for name in PRESETS:
        cfg = load_config(name)
        k = resolve_cycle_length(cfg)
        assert k >= 1
        if k > 1:
            for c in (cfg.log_every, cfg.log_images_every,
                      cfg.validate_every, cfg.checkpoint_every,
                      TrainerConfig.stop_sync_every):
                assert c is None or c % k == 0, (name, c, k)


def test_resolve_compiler_options_policy():
    """None = auto (TPU-only scoped-VMEM default; nothing on CPU — TPU keys
    are compile errors there); {} opts out; explicit dicts pass through."""
    import jax

    from contrast_gan_3d_tpu.experiments import load_config
    from contrast_gan_3d_tpu.experiments.builder import (
        build, resolve_compiler_options,
    )

    cfg = load_config("basic_3d")
    auto = resolve_compiler_options(cfg)
    if jax.default_backend() == "tpu":
        assert auto == {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    else:
        assert auto is None
    # 2D family: never auto-injected (-11% measured, PERF.md round-5 A/B)
    assert resolve_compiler_options(load_config("conf_2d")) is None

    from dataclasses import replace

    assert resolve_compiler_options(
        replace(cfg, xla_compiler_options={})
    ) is None
    custom = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    assert resolve_compiler_options(
        replace(cfg, xla_compiler_options=custom)
    ) == custom

    # threads into the built StepConfig (and the CPU test backend builds a
    # config whose programs compile + run — the full-suite trainer tests)
    built = build(replace(cfg, xla_compiler_options=custom))
    assert built.step_config.compiler_options == custom
    built_auto = build(cfg)
    assert built_auto.step_config.compiler_options == auto

"""Experiment config system tests (reference capability: experiments/ +
trainer/utils.py config machinery)."""

import json

import pytest

from contrast_gan_3d_tpu.experiments import PRESETS, asdict_flat, load_config
from contrast_gan_3d_tpu.experiments.builder import build


def test_all_presets_resolve_and_serialize():
    for name, factory in PRESETS.items():
        cfg = factory()
        assert cfg.name == name
        json.dumps(asdict_flat(cfg))  # wandb-serializable


def test_preset_values_match_reference():
    basic = load_config("basic_3d")
    assert basic.train_iterations == 10_000
    assert basic.lr == 2e-4 and basic.betas == (0.5, 0.999)
    assert basic.milestones == (6000, 8000) and basic.lr_gamma == 0.1
    assert basic.weight_clip == 0.01
    assert basic.train_batch_size == {0: 6, -1: 3, 1: 3}

    gp = load_config("gradient_penalty")
    assert gp.weight_clip is None and gp.lr == 1e-4 and gp.betas == (0.0, 0.9)
    assert gp.critic_args["norm"] is None

    sp = load_config("small_patch")
    assert sp.train_patch_size == (128, 128, 32)
    assert sp.train_batch_size == {0: 40, -1: 20, 1: 20}

    tgm = load_config("train_generator_more")
    assert tgm.train_critic_every == 5 and tgm.train_generator_every == 1

    c2d = load_config("conf_2d")
    assert c2d.is_2d and c2d.train_patch_size == (128, 128)
    assert c2d.generator_args["n_resnet_blocks"] == 6

    gp2d = load_config("gradient_penalty_2d")
    assert gp2d.is_2d and gp2d.weight_clip is None and gp2d.lr == 1e-4
    assert gp2d.betas == (0.0, 0.9) and gp2d.gp_weight == 10.0
    # net result of the reference's shared-dict mutations: 2D 16-ch critic
    # with the Identity norm (gradient_penalty_conf_2D.py)
    assert gp2d.critic_args["norm"] is None
    assert gp2d.critic_args["init_channels_out"] == 16
    assert gp2d.critic_args["ndim"] == 2

    tc = load_config("test_conf")
    assert tc.train_iterations == 61 and tc.validate_every == 10


def test_override_file_composition(tmp_path):
    f = tmp_path / "my_conf.py"
    f.write_text(
        "from dataclasses import replace\n"
        "def config(base):\n"
        "    return replace(base, lr=5e-5, train_iterations=7)\n"
    )
    cfg = load_config(str(f))
    assert cfg.lr == 5e-5 and cfg.train_iterations == 7
    # kwargs win last
    cfg = load_config(str(f), train_iterations=3)
    assert cfg.train_iterations == 3


def test_unknown_spec_raises():
    with pytest.raises(ValueError):
        load_config("nope_not_a_preset")


def test_build_basic_and_gp():
    for name in ["basic_3d", "gradient_penalty", "test_conf"]:
        built = build(load_config(name), checkpoint_dir=None)
        assert built.step_config.scaler.factor == 600
        assert built.trainer_config.train_iterations == built.config.train_iterations
        if name == "gradient_penalty":
            assert built.step_config.weight_clip is None
            assert built.critic.norm is None

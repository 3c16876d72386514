"""Checkpoint / resume round-trip tests (reference capability:
trainer/Trainer.py:310-339 + trainer/utils.py:26-34 — including the critic,
which the reference silently failed to checkpoint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
from contrast_gan_3d_tpu.trainer.optim import make_optimizer
from contrast_gan_3d_tpu.trainer.steps import init_state

PATCH = (8, 8, 8)


@pytest.fixture(scope="module")
def tiny_state():
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    return init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_load_roundtrip(tiny_state, tmp_path):
    state = tiny_state.replace(step=jnp.int32(123))
    path = ckpt_lib.save_checkpoint(state, tmp_path)
    assert path.name == "123.msgpack"
    restored = ckpt_lib.load_checkpoint(tmp_path, target=tiny_state)
    assert int(restored.step) == 123
    _tree_equal(restored.gen_params, state.gen_params)
    _tree_equal(restored.critic_params, state.critic_params)  # critic saved!
    _tree_equal(restored.gen_opt, state.gen_opt)


def test_find_latest(tiny_state, tmp_path):
    for step in [100, 2000, 900]:
        ckpt_lib.save_checkpoint(tiny_state.replace(step=jnp.int32(step)), tmp_path)
    assert ckpt_lib.find_latest_checkpoint(tmp_path).name == "2000.msgpack"
    assert ckpt_lib.find_latest_checkpoint(tmp_path / "nope") is None


def test_keep_limit(tiny_state, tmp_path):
    for step in [1, 2, 3, 4]:
        ckpt_lib.save_checkpoint(
            tiny_state.replace(step=jnp.int32(step)), tmp_path, keep=2
        )
    names = sorted(p.name for p in tmp_path.glob("*.msgpack"))
    assert names == ["3.msgpack", "4.msgpack"]


def test_maybe_restore_no_checkpoint(tiny_state, tmp_path):
    out = ckpt_lib.maybe_restore(tiny_state, tmp_path / "empty")
    assert out is tiny_state


def test_load_generator_payload(tiny_state, tmp_path):
    ckpt_lib.save_checkpoint(tiny_state.replace(step=jnp.int32(7)), tmp_path)
    payload = ckpt_lib.load_generator(tmp_path)
    assert payload["step"] == 7
    _tree_equal(payload["params"], tiny_state.gen_params)

"""Split critic/generator phases must equal the single combined program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.trainer.optim import make_optimizer
from contrast_gan_3d_tpu.trainer.steps import StepConfig, build_train_steps, init_state

PATCH = (16, 16, 16)


@pytest.mark.parametrize("weight_clip", [0.01, None])
@pytest.mark.parametrize("layout", ["direct", "packed"])
def test_split_equals_combined(rng, weight_clip, layout):
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1,
                          init_channels_out=2, layout=layout)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    cfg = StepConfig(weight_clip=weight_clip, augment=None)
    steps = build_train_steps(gen, critic, tx, tx, cfg)

    opt = jnp.asarray(rng.integers(-500, 500, (2, *PATCH), dtype=np.int16))
    sub = jnp.asarray(rng.integers(-500, 500, (2, *PATCH), dtype=np.int16))
    msk = jnp.asarray((rng.random((2, *PATCH)) < 0.05).astype(np.int16))

    s_combined = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    s_combined, m_combined = steps.combined_step(s_combined, opt, sub, msk)

    s_split = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    s_split, m1, sub_s, msk_s = steps.critic_phase(s_split, opt, sub, msk)
    s_split, m2 = steps.generator_phase(s_split, sub_s, msk_s)
    m_split = {**m1, **m2}

    assert set(m_combined) == set(m_split)
    for k in m_combined:
        np.testing.assert_allclose(
            float(m_combined[k]), float(m_split[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    for l1, l2 in zip(
        jax.tree_util.tree_leaves((s_combined.gen_params, s_combined.critic_params)),
        jax.tree_util.tree_leaves((s_split.gen_params, s_split.critic_params)),
    ):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-6)
    assert int(s_split.step) == int(s_combined.step) == 1


def test_dropout_runs_in_every_branch(rng):
    """resnet_dropout_prob > 0 (the reference's optional ResNet dropout,
    blocks.py:31-36) needs a 'dropout' rng threaded into every train-time
    generator apply — previously any nonzero prob crashed the first step."""
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1,
                          init_channels_out=2, resnet_dropout_prob=0.5)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    steps = build_train_steps(gen, critic, tx, tx, StepConfig(augment=None))

    opt = jnp.asarray(rng.integers(-500, 500, (2, *PATCH), dtype=np.int16))
    sub = jnp.asarray(rng.integers(-500, 500, (2, *PATCH), dtype=np.int16))
    msk = jnp.asarray((rng.random((2, *PATCH)) < 0.05).astype(np.int16))

    state = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    for name in ("combined_step", "critic_step", "generator_only_step"):
        state, metrics = getattr(steps, name)(state, opt, sub, msk)
        assert all(np.isfinite(float(v)) for v in metrics.values()), name
    state, m1, sub_s, msk_s = steps.critic_phase(state, opt, sub, msk)
    state, m2 = steps.generator_phase(state, sub_s, msk_s)
    assert all(np.isfinite(float(v)) for v in {**m1, **m2}.values())

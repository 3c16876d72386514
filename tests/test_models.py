"""Model shape/param tests. Param counts must match the reference exactly
(generator 1,035,297; critic 176,873 — BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.models import PatchGANDiscriminator, ResnetGenerator
from contrast_gan_3d_tpu.models.utils import count_parameters, generator_output_shape


def init_model(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return variables, x


def test_generator_param_count_matches_reference():
    model = ResnetGenerator(n_resnet_blocks=4, n_updownsample_blocks=2, init_channels_out=16)
    variables, _ = init_model(model, (1, 16, 16, 16, 1))
    assert count_parameters(variables["params"]) == 1_035_297


def test_critic_param_count_matches_reference():
    model = PatchGANDiscriminator(init_channels_out=8, discriminator_depth=3)
    variables, _ = init_model(model, (1, 32, 32, 32, 1))
    assert count_parameters(variables["params"]) == 176_873


def test_generator_is_shape_preserving_3d():
    model = ResnetGenerator()
    variables, x = init_model(model, (2, 32, 32, 32, 1))
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 32, 32, 32, 1)
    # tanh-bounded attenuation
    y = np.asarray(y)
    assert np.all(y > -1) and np.all(y < 1)


def test_generator_2d():
    model = ResnetGenerator(ndim=2, n_resnet_blocks=6)
    variables, x = init_model(model, (2, 64, 64, 1))
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 64, 64, 1)


def test_generator_output_shape_helper():
    assert generator_output_shape([128, 128, 128]) == [128, 128, 128]
    assert generator_output_shape([100, 100, 60]) == [100, 100, 60]
    assert generator_output_shape([99, 50, 30]) == [100, 52, 32]


def test_critic_logit_map_shape():
    # k4 s2 p1 halves 3x (depth 3 + first), final k4 s1 p1 shrinks by 1
    model = PatchGANDiscriminator()
    variables, x = init_model(model, (2, 64, 64, 64, 1))
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 3, 3, 3, 1)


def test_critic_2d():
    model = PatchGANDiscriminator(ndim=2)
    variables, x = init_model(model, (2, 64, 64, 1))
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 3, 3, 1)


def test_batchnorm_stats_are_updated_in_train_mode():
    model = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=4)
    variables, x = init_model(model, (2, 8, 8, 8, 1))
    x = jnp.asarray(np.random.default_rng(0).normal(size=x.shape), jnp.float32)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


@pytest.mark.parametrize("norm", ["layer", "instance", None])
def test_norm_variants(norm):
    model = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1,
                            init_channels_out=4, norm=norm)
    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == x.shape

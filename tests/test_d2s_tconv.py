"""d2s transpose-conv exactness vs flax nn.ConvTranspose (the probed index
convention is locked here — if flax changes, this catches it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from contrast_gan_3d_tpu.ops.s2d_conv import d2s_tconv3d


@pytest.mark.parametrize("ci,co,N", [(64, 32, 8), (32, 16, 12), (3, 5, 6)])
def test_d2s_tconv_matches_flax(rng, ci, co, N):
    x = jnp.asarray(rng.normal(size=(2, N, N, N, ci)), jnp.float32)
    ct = nn.ConvTranspose(co, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
    v = ct.init(jax.random.key(0), x)
    ref = np.asarray(ct.apply(v, x))
    got = np.asarray(
        d2s_tconv3d(x, v["params"]["kernel"], v["params"]["bias"], convention="same")
    )
    assert got.shape == (2, 2 * N, 2 * N, 2 * N, co)
    np.testing.assert_allclose(ref, got, atol=2e-4)


def test_generator_with_d2s_ups_matches_direct(rng):
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    g_fast = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=4, s2d_factor=4
    )
    g_ref = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=4, s2d_factor=None
    )
    v = g_fast.init(jax.random.key(0), x, train=False)
    np.testing.assert_allclose(
        np.asarray(g_fast.apply(v, x, train=False)),
        np.asarray(g_ref.apply(v, x, train=False)),
        atol=2e-5,
    )


def test_d2s_tconv_torch_convention(rng):
    """Default convention matches the torch ConvTranspose(k,s,p,op) window
    placement used by blocks.ConvBlock (= flax explicit pad (1,2)) — the
    weight-port parity convention."""
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 6, 3)), jnp.float32)
    ct = nn.ConvTranspose(5, (3, 3, 3), strides=(2, 2, 2), padding=((1, 2),) * 3)
    v = ct.init(jax.random.key(0), x)
    ref = np.asarray(ct.apply(v, x))
    got = np.asarray(
        d2s_tconv3d(x, v["params"]["kernel"], v["params"]["bias"], convention="torch")
    )
    np.testing.assert_allclose(ref, got, atol=2e-4)


def test_convblock_d2s_equals_direct_transpose(rng):
    """ConvBlock(transpose, s2d=...) -> D2STConv must equal the direct
    ConvTranspose path parameter-for-parameter."""
    from contrast_gan_3d_tpu.models.blocks import ConvBlock

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 4)), jnp.float32)
    fast = ConvBlock(2, 3, stride=2, transpose=True, norm=None, activation=None, s2d=4)
    direct = ConvBlock(2, 3, stride=2, transpose=True, norm=None, activation=None)
    v = fast.init(jax.random.key(1), x, train=False)
    np.testing.assert_allclose(
        np.asarray(fast.apply(v, x, train=False)),
        np.asarray(direct.apply(v, x, train=False)),
        atol=2e-5,
    )


def test_tconv_refuses_underived_kernels(rng):
    """The d2s transpose conv is derived for k=3 s=2 only; other shapes must
    refuse loudly (even k silently dropped taps, k=5/7 match a different
    output crop — found by review, pinned here)."""
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)), jnp.float32)
    for k in (2, 4, 5):
        w = jnp.asarray(rng.normal(size=(k, k, k, 2, 3)), jnp.float32)
        with pytest.raises(NotImplementedError, match="kernel 3 stride 2"):
            d2s_tconv3d(x, w, convention="same")

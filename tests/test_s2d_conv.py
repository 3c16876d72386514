"""Space-to-depth conv exactness tests (ops/s2d_conv): the MXU-efficient
path must match the direct XLA conv bit-for-bit up to fp reassociation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.ops.s2d_conv import (
    depth_to_space,
    s2d_conv3d,
    space_to_depth,
    transform_kernel,
)


def _direct_conv(x, w, b, stride, mode):
    k = w.shape[0]
    p = (k - 1) // 2
    xm = jnp.pad(
        x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)),
        mode="reflect" if mode == "reflect" else "constant",
    )
    out = jax.lax.conv_general_dilated(
        xm, w, (stride,) * 3, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out if b is None else out + b


CASES = [
    # (k, ci, co, N, mode, f, stride)
    (7, 1, 16, 16, "reflect", 4, 1),   # generator stem
    (7, 16, 1, 16, "reflect", 4, 1),   # generator projection
    (3, 4, 8, 8, "zeros", 4, 1),
    (5, 3, 5, 12, "reflect", 2, 1),
    (3, 16, 32, 16, "zeros", 4, 2),    # strided (down-conv shape)
    (3, 8, 8, 24, "reflect", 2, 2),
    (4, 1, 8, 32, "zeros", 4, 2),      # even kernel: critic first conv shape
    (4, 8, 16, 16, "zeros", 2, 2),     # even kernel, strided
]


@pytest.mark.parametrize("k,ci,co,N,mode,f,stride", CASES)
def test_s2d_matches_direct_conv(rng, k, ci, co, N, mode, f, stride):
    x = jnp.asarray(rng.normal(size=(2, N, N, N, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, k, ci, co)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    ref = _direct_conv(x, w, b, stride, mode)
    got = s2d_conv3d(x, w, b, f=f, stride=stride, padding_mode=mode)
    ref = ref[:, : got.shape[1], : got.shape[2], : got.shape[3]]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-3)


def test_space_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)), jnp.float32)
    # s2d uses d-major layout, d2s expects r-major — they are NOT inverses
    # channel-wise for C>1, but are for C==1
    x1 = x[..., :1]
    np.testing.assert_allclose(
        np.asarray(depth_to_space(space_to_depth(x1, 2), 2)), np.asarray(x1)
    )


def test_transform_kernel_shape():
    w = jnp.zeros((7, 7, 7, 1, 16))
    wp = transform_kernel(w, 4)
    assert wp.shape == (3, 3, 3, 64, 1024)
    w2 = jnp.zeros((3, 3, 3, 16, 32))
    assert transform_kernel(w2, 4, s=2).shape == (3, 3, 3, 64 * 16, 64 * 32)


def test_generator_s2d_matches_direct(rng):
    """End-to-end: the default generator (s2d stem/last) must equal the
    s2d-disabled generator with identical params."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    g_s2d = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=4, s2d_factor=4
    )
    g_ref = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=4, s2d_factor=None
    )
    v = g_s2d.init(jax.random.key(0), x, train=False)
    out_s2d = g_s2d.apply(v, x, train=False)
    out_ref = g_ref.apply(v, x, train=False)  # same params (paths compatible)
    np.testing.assert_allclose(
        np.asarray(out_s2d), np.asarray(out_ref), atol=2e-5
    )

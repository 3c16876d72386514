"""Pallas block-conv kernel tests (interpret mode on CPU; the real-TPU run
was validated on-chip: exactness 7.6e-5 f32, matches XLA timing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from contrast_gan_3d_tpu.ops.pallas_conv import block_conv3x3x3, s2d_conv3d_pallas
from contrast_gan_3d_tpu.ops.s2d_conv import s2d_conv3d


def test_block_conv_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 6, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 4)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.transpose(x, (0, 2, 3, 1, 4)), w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    ref = jnp.transpose(ref, (0, 3, 1, 2, 4))  # back to z-major
    with pltpu.force_tpu_interpret_mode():
        got = block_conv3x3x3(x, w)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_block_conv_k_split_accumulation(rng):
    """Channel chunks must accumulate into the revisited output block."""
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 5, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 256, 4)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        whole = block_conv3x3x3(x, w, k_splits=1)
        split = block_conv3x3x3(x, w, k_splits=2)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(split), rtol=1e-5, atol=1e-4)


def test_s2d_pallas_wrapper_matches_xla_path(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, 7, 3, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2,)), jnp.float32)
    ref = s2d_conv3d(x, w, b, f=4, padding_mode="reflect")
    with pltpu.force_tpu_interpret_mode():
        got = s2d_conv3d_pallas(x, w, b, f=4, padding_mode="reflect")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4)


def test_s2d_pallas_fallback_for_unsupported(rng):
    """Non-K3 block kernels fall back to the XLA path (no crash)."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 2)), jnp.float32)  # K=2 at f=4
    ref = s2d_conv3d(x, w, f=4)
    got = s2d_conv3d_pallas(x, w, f=4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_block_conv_v2_matches_xla(rng):
    """v2 (aligned tap slices): x is (B, Z, Y, X, C)."""
    from contrast_gan_3d_tpu.ops.pallas_conv import block_conv3x3x3_v2

    x = jnp.asarray(rng.normal(size=(2, 6, 7, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 4)), jnp.float32)
    # reference NDHWC order is (X, Y, Z): transpose (B,Z,Y,X,C) -> (B,X,Y,Z,C)
    ref = jax.lax.conv_general_dilated(
        jnp.transpose(x, (0, 3, 2, 1, 4)), w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    ref = jnp.transpose(ref, (0, 3, 2, 1, 4))  # back to (B, Z, Y, X, C)
    with pltpu.force_tpu_interpret_mode():
        got = block_conv3x3x3_v2(x, w)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_block_conv_v2_k_split(rng):
    from contrast_gan_3d_tpu.ops.pallas_conv import block_conv3x3x3_v2

    x = jnp.asarray(rng.normal(size=(1, 5, 5, 5, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 256, 4)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        whole = block_conv3x3x3_v2(x, w, k_splits=1)
        split = block_conv3x3x3_v2(x, w, k_splits=2)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(split), atol=1e-4)


def test_s2d_pallas_even_kernel_full_output(rng):
    """k=6 at f=4 (K=3, p=2): the padded length must satisfy the d + f*(K-1)
    bound or the VALID block conv silently truncates the output; must match
    the s2d_conv3d fallback exactly in shape and values."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(6, 6, 6, 2, 3)), jnp.float32)
    ref = s2d_conv3d(x, w, f=4)
    with pltpu.force_tpu_interpret_mode():
        got = s2d_conv3d_pallas(x, w, f=4)
    assert got.shape == ref.shape == (1, 8, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)

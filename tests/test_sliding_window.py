"""Sliding-window corrector tests (reference capability:
eval/CCTAContrastCorrector.py — reconstruction identity, blending, coverage)."""

import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler
from contrast_gan_3d_tpu.ops.sliding_window import (
    _plan_grid,
    gaussian_weights,
    grid_starts,
    make_volume_corrector,
    num_patches,
    weight_field,
    weight_vectors,
)


def test_grid_starts_cover_every_voxel():
    for dim, patch, stride in [(40, 16, 8), (16, 16, 8), (10, 16, 8), (33, 16, 11)]:
        starts = grid_starts(dim, patch, stride)
        covered = np.zeros(max(dim, patch), bool)
        for s in starts:
            assert s >= 0 and s + patch <= max(dim, patch)
            covered[s : s + patch] = True
        assert covered[:dim].all()
        # last window is clamped to the edge
        assert starts[-1] == max(dim, patch) - patch


def test_weight_vectors_separable_equals_dense_window_sum():
    """The outer product of the per-axis vectors must equal the brute-force
    sum of the 3-D window over the actual patch grid — the separability the
    normalization (and the small jax.export artifacts) relies on."""
    padded, patch, stride, sigma = (24, 20, 18), (16, 12, 8), (8, 6, 4), 0.125
    dense = np.zeros(padded, np.float64)
    gw = gaussian_weights(patch, sigma).astype(np.float64)
    for s in _plan_grid(padded, patch, stride):
        dense[s[0]:s[0]+patch[0], s[1]:s[1]+patch[1], s[2]:s[2]+patch[2]] += gw
    vecs = weight_vectors(padded, patch, stride, sigma)
    sep = np.asarray(weight_field(vecs))
    np.testing.assert_allclose(sep, dense, rtol=1e-5)
    assert (sep > 0).all()


def test_gaussian_weights_properties():
    w = gaussian_weights((16, 12, 8))
    assert w.shape == (16, 12, 8)
    assert w.max() == pytest.approx(1.0)
    assert (w > 0).all()
    # symmetric about the (fractional) center
    np.testing.assert_allclose(w, w[::-1, ::-1, ::-1], atol=1e-6)


def test_identity_generator_reconstructs_input(rng):
    """G = 0 => corrected volume == input exactly (SURVEY.md test strategy)."""
    corr = make_volume_corrector(
        lambda x: jnp.zeros_like(x), patch_size=(16, 16, 16), batch_size=2
    )
    vol = rng.integers(-1024, 1500, (40, 33, 12), dtype=np.int16)
    out = np.asarray(corr(jnp.asarray(vol)))
    np.testing.assert_allclose(out, vol, atol=1e-3)


def test_constant_attenuation_shifts_by_factor(rng):
    """atten = c => every voxel shifts by c * scaler.factor HU, independent of
    how many overlapping patches covered it (blending normalizes)."""
    c, factor = 0.25, 600
    corr = make_volume_corrector(
        lambda x: jnp.full_like(x, c),
        patch_size=(16, 16, 16),
        batch_size=3,
        scaler=FactorZeroCenterScaler(factor=factor),
    )
    vol = rng.integers(-1024, 1500, (24, 24, 24), dtype=np.int16)
    out = np.asarray(corr(jnp.asarray(vol)))
    np.testing.assert_allclose(out, vol - c * factor, atol=1e-2)


def test_volume_smaller_than_patch(rng):
    """Padding path: every dim smaller than the patch."""
    corr = make_volume_corrector(
        lambda x: jnp.zeros_like(x), patch_size=(16, 16, 16), batch_size=1
    )
    vol = rng.integers(-500, 500, (7, 9, 5), dtype=np.int16)
    out = np.asarray(corr(jnp.asarray(vol)))
    assert out.shape == (7, 9, 5)
    np.testing.assert_allclose(out, vol, atol=1e-3)


def test_num_patches():
    assert num_patches((512, 512, 400), (128, 128, 128), overlap=0.5) == 7 * 7 * 6
    assert num_patches((16, 16, 16), (16, 16, 16)) == 1
    # packed_io: stride snaps down to a multiple of 4 and dims pad to blocks
    # (overlap 0.45 -> direct stride 70 vs packed 68; z 401 pads to 404)
    assert num_patches((512, 512, 401), (128, 128, 128), overlap=0.45) == 245
    assert num_patches((512, 512, 401), (128, 128, 128), overlap=0.45,
                       packed_io=True) == 294
    # at the default geometry both layouts agree
    assert num_patches((512, 512, 400), (128, 128, 128), overlap=0.5) == \
        num_patches((512, 512, 400), (128, 128, 128), overlap=0.5, packed_io=True)


def test_non_divisible_patch_auto_upsample(rng):
    """Patch sizes the generator can't preserve (odd dims) resize back —
    reference auto-inserts nn.Upsample (CCTAContrastCorrector.py:42-52)."""
    import jax
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    v = gen.init(jax.random.key(0), jnp.zeros((1, 20, 20, 20, 1)), train=False)
    corr = make_volume_corrector(
        lambda x: gen.apply(v, x, train=False), patch_size=(19, 19, 19), batch_size=2
    )
    vol = rng.integers(-500, 500, (25, 23, 21), dtype=np.int16)
    out = np.asarray(corr(jnp.asarray(vol)))
    assert out.shape == vol.shape
    assert np.isfinite(out).all()


def test_num_patches_refuses_what_the_corrector_refuses():
    """num_patches must not report a grid for a packed config the corrector
    raises on (stride < 4 after overlap)."""
    import pytest

    from contrast_gan_3d_tpu.ops.sliding_window import num_patches

    with pytest.raises(ValueError, match="stride >= 4"):
        num_patches((64, 64, 64), (16, 16, 16), overlap=0.9, packed_io=True)
    # and agrees with itself for a valid config
    assert num_patches((64, 64, 64), (16, 16, 16), overlap=0.25, packed_io=True) > 0

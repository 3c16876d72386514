"""Host (native C++) augmentation warp tests: must match the device
resampler for identical transform parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu import native
from contrast_gan_3d_tpu.data.augment import AugmentConfig
from contrast_gan_3d_tpu.data.host_augment import HostAugmenter, rotation_matrix_np
from contrast_gan_3d_tpu.ops.resample import identity_grid, nearest_sample, trilinear_sample

from tests.synth import centered_affine_coords

pytestmark = pytest.mark.skipif(not native.has_native(), reason="no native lib")

SHAPE = (12, 12, 12)


def _device_warp(scan, seg, affine, shape=SHAPE):
    coords = centered_affine_coords(shape, affine)
    out = trilinear_sample(jnp.asarray(scan, jnp.float32), coords)
    out_seg = nearest_sample(jnp.asarray(seg, jnp.float32), coords)
    return np.asarray(out), np.asarray(out_seg)


def test_identity_affine_roundtrip(rng):
    scan = rng.integers(-500, 500, SHAPE).astype(np.int16)
    seg = (rng.random(SHAPE) < 0.1).astype(np.int16)
    out_scan, out_seg = native.warp_augment_int16(scan, seg, np.eye(3))
    np.testing.assert_array_equal(out_scan, scan)
    np.testing.assert_array_equal(out_seg, seg)


def test_rotation_matches_device(rng):
    scan = rng.integers(-500, 500, SHAPE).astype(np.int16)
    seg = (rng.random(SHAPE) < 0.1).astype(np.int16)
    affine = rotation_matrix_np(np.array([0.3, -0.2, 0.5]))
    got_scan, got_seg = native.warp_augment_int16(scan, seg, affine)
    ref_scan, ref_seg = _device_warp(scan, seg, affine)
    # int16 rounding in the native path vs float device path
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))


def test_scale_matches_device(rng):
    scan = rng.integers(-500, 500, SHAPE).astype(np.int16)
    seg = np.zeros(SHAPE, np.int16)
    affine = np.eye(3) * 1.3
    got_scan, _ = native.warp_augment_int16(scan, seg, affine)
    ref_scan, _ = _device_warp(scan, seg, affine)
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1


def test_elastic_displaces(rng):
    """A constant coarse field of +1 with amplitude a shifts sampling by a."""
    scan = rng.integers(-500, 500, SHAPE).astype(np.int16)
    seg = (rng.random(SHAPE) < 0.1).astype(np.int16)
    coarse = np.ones((4, 4, 4, 3), np.float32)
    amp = np.array([2.0, 0.0, 0.0], np.float32)
    got_scan, got_seg = native.warp_augment_int16(scan, seg, np.eye(3), coarse, amp)
    # interior voxels: sampled from x+2
    np.testing.assert_array_equal(got_scan[:-2, :, :], scan[2:, :, :])
    np.testing.assert_array_equal(got_seg[:-2, :, :], seg[2:, :, :])


def test_elastic_matches_device(rng):
    """Random coarse noise field: the native warp's on-the-fly half-pixel
    upsample must equal the device path's jax.image.resize(method='linear')
    elastic field — identical displacement, identical resample."""
    scan = rng.integers(-500, 500, SHAPE).astype(np.int16)
    seg = (rng.random(SHAPE) < 0.1).astype(np.int16)
    coarse = rng.uniform(-1.0, 1.0, (4, 4, 4, 3)).astype(np.float32)
    amp = np.array([2.5, 1.5, 3.0], np.float32)
    got_scan, got_seg = native.warp_augment_int16(scan, seg, np.eye(3), coarse, amp)

    field = jax.image.resize(jnp.asarray(coarse), (*SHAPE, 3), method="linear")
    coords = identity_grid(SHAPE) + field * jnp.asarray(amp)
    ref_scan = np.asarray(trilinear_sample(jnp.asarray(scan, jnp.float32), coords))
    ref_seg = np.asarray(nearest_sample(jnp.asarray(seg, jnp.float32), coords))
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))


def test_host_augmenter_probabilities(rng):
    """With all probabilities zero the augmenter is the identity; with p=1
    something changes."""
    scan = rng.integers(-500, 500, SHAPE).astype(np.int16)
    seg = (rng.random(SHAPE) < 0.1).astype(np.int16)
    never = HostAugmenter(
        AugmentConfig(p_elastic=0.0, p_scale=0.0, p_rotation=0.0),
        np.random.default_rng(0),
    )
    s2, g2 = never(scan, seg)
    np.testing.assert_array_equal(s2, scan)
    np.testing.assert_array_equal(g2, seg)  # the mask must be identity too

    always = HostAugmenter(
        AugmentConfig(p_elastic=1.0, p_scale=1.0, p_rotation=1.0, elastic_grid=4),
        np.random.default_rng(0),
    )
    s3, _ = always(scan, seg)
    assert not np.array_equal(s3, scan)


@pytest.mark.parametrize("shape", [(5, 4, 3), (2, 2, 2), (17, 3, 9), (16, 16, 5)])
def test_tiny_odd_shapes_match_device(rng, shape):
    """SIMD masked-tail edge cases: z-lines shorter than one vector, dims of
    2, non-multiples of 16 — must still match the device path."""
    scan = rng.integers(-500, 500, shape).astype(np.int16)
    seg = (rng.random(shape) < 0.2).astype(np.int16)
    affine = (rotation_matrix_np(np.array([0.4, -0.5, 0.2])) * 1.1).astype(np.float32)
    got_scan, got_seg = native.warp_augment_int16(scan, seg, affine)
    ref_scan, ref_seg = _device_warp(scan, seg, affine, shape)
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))


def test_half_integer_coords_seg_matches_device(rng):
    """An exact 2x downscale on even dims lands every sampling coordinate on
    a half-integer: the nearest mask sample must round half-EVEN on host
    exactly like the device jnp.round (half-up rounding shifts labels by a
    voxel on the host path only)."""
    shape = (8, 8, 8)
    scan = rng.integers(-500, 500, shape).astype(np.int16)
    seg = rng.integers(0, 5, shape).astype(np.int16)
    affine = (np.eye(3) * 2.0).astype(np.float32)
    got_scan, got_seg = native.warp_augment_int16(scan, seg, affine)
    ref_scan, ref_seg = _device_warp(scan, seg, affine, shape)
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))


# ------------------------------------------------------------------- 2D
def _device_warp2d(scan, seg, affine, shape):
    from contrast_gan_3d_tpu.ops.resample import bilinear_sample, nearest_sample_2d

    coords = centered_affine_coords(shape, affine)
    out = bilinear_sample(jnp.asarray(scan, jnp.float32), coords)
    out_seg = nearest_sample_2d(jnp.asarray(seg, jnp.float32), coords)
    return np.asarray(out), np.asarray(out_seg)


def test_2d_identity_affine_roundtrip(rng):
    scan = rng.integers(-500, 500, (13, 11)).astype(np.int16)
    seg = (rng.random((13, 11)) < 0.1).astype(np.int16)
    out_scan, out_seg = native.warp_augment2d_int16(scan, seg, np.eye(2))
    np.testing.assert_array_equal(out_scan, scan)
    np.testing.assert_array_equal(out_seg, seg)


@pytest.mark.parametrize("shape", [(16, 16), (33, 17)])
def test_2d_rotation_mirror_matches_device(rng, shape):
    """Rotation composed with a mirror (the conf_2D transform set) must match
    the device 2D path (ops/resample bilinear/nearest conventions)."""
    scan = rng.integers(-500, 500, shape).astype(np.int16)
    seg = (rng.random(shape) < 0.1).astype(np.int16)
    a = 0.7
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
    affine = (np.diag([-1.0, 1.0]).astype(np.float32) @ rot).astype(np.float32)
    got_scan, got_seg = native.warp_augment2d_int16(scan, seg, affine)
    ref_scan, ref_seg = _device_warp2d(scan, seg, affine, shape)
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))


def test_2d_pure_mirror_is_exact_flip(rng):
    scan = rng.integers(-500, 500, (12, 12)).astype(np.int16)
    seg = (rng.random((12, 12)) < 0.1).astype(np.int16)
    got_scan, got_seg = native.warp_augment2d_int16(
        scan, seg, np.diag([-1.0, 1.0]).astype(np.float32)
    )
    np.testing.assert_array_equal(got_scan, scan[::-1, :])
    np.testing.assert_array_equal(got_seg, seg[::-1, :])


@pytest.mark.parametrize("shape", [(3, 5), (2, 2), (16, 3), (5, 37)])
def test_2d_tiny_odd_shapes_match_device(rng, shape):
    scan = rng.integers(-500, 500, shape).astype(np.int16)
    seg = (rng.random(shape) < 0.2).astype(np.int16)
    a = 1.1
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
    affine = (np.diag([1.0, -1.0]).astype(np.float32) @ rot).astype(np.float32)
    got_scan, got_seg = native.warp_augment2d_int16(scan, seg, affine)
    ref_scan, ref_seg = _device_warp2d(scan, seg, affine, shape)
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))


def test_host_augmenter2d_probabilities(rng):
    from contrast_gan_3d_tpu.data.augment import Augment2DConfig
    from contrast_gan_3d_tpu.data.host_augment import HostAugmenter2D

    scan = rng.integers(-500, 500, (16, 16)).astype(np.int16)
    seg = (rng.random((16, 16)) < 0.1).astype(np.int16)
    never = HostAugmenter2D(
        Augment2DConfig(p_rotation=0.0, p_mirror=0.0), np.random.default_rng(0)
    )
    s, g = never(scan, seg)
    np.testing.assert_array_equal(s, scan)
    np.testing.assert_array_equal(g, seg)

    always = HostAugmenter2D(
        Augment2DConfig(p_rotation=1.0, p_mirror=1.0), np.random.default_rng(3)
    )
    changed = False
    for _ in range(8):
        s, _ = always(scan, seg)
        changed = changed or not np.array_equal(s, scan)
    assert changed


@pytest.mark.parametrize("shape", [(16, 16, 16), (32, 32, 32)])
def test_combined_transforms_match_device(rng, shape):
    """Rotation + scale + elastic COMPOSED (the realistic augmentation case)
    must match the device path across shapes."""
    scan = rng.integers(-500, 500, shape).astype(np.int16)
    seg = (rng.random(shape) < 0.05).astype(np.int16)
    affine = (rotation_matrix_np(np.array([0.3, -0.2, 0.5])) * 1.2).astype(np.float32)
    coarse = rng.uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
    amp = np.array([2.0, 1.0, 3.0], np.float32)
    got_scan, got_seg = native.warp_augment_int16(scan, seg, affine, coarse, amp)

    rel = centered_affine_coords(shape, affine)
    field = jax.image.resize(jnp.asarray(coarse), (*shape, 3), method="linear")
    coords = rel + field * jnp.asarray(amp)
    ref_scan = np.asarray(trilinear_sample(jnp.asarray(scan, jnp.float32), coords))
    ref_seg = np.asarray(nearest_sample(jnp.asarray(seg, jnp.float32), coords))
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))

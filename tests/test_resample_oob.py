"""Deep out-of-bounds semantics of the resamplers: TRUE clamp-to-edge.

The reference's augmentation rides batchgenerators, whose spatial transforms
resample with ``scipy.ndimage.map_coordinates(order=1, mode='nearest')`` —
coordinates beyond the volume clamp to the border voxel. An unclamped lerp
fraction against a clamped base index would instead *extrapolate* with
weights outside [0, 1]; these tests pin the clamped behavior on the device
samplers (ops/resample.py) and the native host warp (csrc/hostops.cpp) so
the three paths (scipy reference, device, host) stay in lockstep for
transforms that push sampling coordinates far outside the volume.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from contrast_gan_3d_tpu import native
from contrast_gan_3d_tpu.data.host_augment import rotation_matrix_np
from contrast_gan_3d_tpu.ops.resample import (
    bilinear_sample,
    nearest_sample,
    nearest_sample_2d,
    trilinear_sample,
)

from tests.synth import centered_affine_coords

SHAPE = (9, 8, 7)


def test_trilinear_deep_oob_equals_clamped_coords(rng):
    """Sampling at any OOB coordinate == sampling at the clamped coordinate
    (the defining property of clamp-to-edge)."""
    vol = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
    coords = rng.uniform(-12.0, 20.0, (500, 3)).astype(np.float32)
    clamped = np.clip(coords, 0.0, np.asarray(SHAPE, np.float32) - 1.0)
    got = np.asarray(trilinear_sample(vol, jnp.asarray(coords)))
    want = np.asarray(trilinear_sample(vol, jnp.asarray(clamped)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_trilinear_matches_scipy_nearest_mode(rng):
    """Device trilinear == scipy map_coordinates(order=1, mode='nearest'),
    the exact resampler batchgenerators uses under the reference augmenter —
    including coordinates far outside the volume."""
    vol = rng.normal(size=SHAPE).astype(np.float32)
    coords = rng.uniform(-6.0, 14.0, (400, 3)).astype(np.float32)
    got = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(coords)))
    want = map_coordinates(vol, coords.T, order=1, mode="nearest").astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_bilinear_deep_oob_equals_clamped_coords(rng):
    img = jnp.asarray(rng.normal(size=(9, 7)).astype(np.float32))
    coords = rng.uniform(-10.0, 18.0, (300, 2)).astype(np.float32)
    clamped = np.clip(coords, 0.0, np.asarray((9, 7), np.float32) - 1.0)
    got = np.asarray(bilinear_sample(img, jnp.asarray(coords)))
    want = np.asarray(bilinear_sample(img, jnp.asarray(clamped)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_bilinear_matches_scipy_nearest_mode(rng):
    img = rng.normal(size=(9, 7)).astype(np.float32)
    coords = rng.uniform(-6.0, 14.0, (300, 2)).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    want = map_coordinates(img, coords.T, order=1, mode="nearest").astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


@pytest.mark.skipif(not native.has_native(), reason="no native lib")
def test_host_warp_deep_oob_matches_device(rng):
    """A 3x downscale affine sends edge sampling coords ~one full extent
    outside the volume: host AVX/scalar warp must equal the device path in
    that regime (both clamp-to-edge)."""
    shape = (16, 16, 16)
    scan = rng.integers(-500, 500, shape).astype(np.int16)
    seg = (rng.random(shape) < 0.1).astype(np.int16)
    affine = (rotation_matrix_np(np.array([0.3, -0.6, 0.2])) * 3.0).astype(np.float32)
    got_scan, got_seg = native.warp_augment_int16(scan, seg, affine)
    coords = centered_affine_coords(shape, affine)
    ref_scan = np.asarray(trilinear_sample(jnp.asarray(scan, jnp.float32), coords))
    ref_seg = np.asarray(nearest_sample(jnp.asarray(seg, jnp.float32), coords))
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))


@pytest.mark.skipif(not native.has_native(), reason="no native lib")
def test_host_warp2d_deep_oob_matches_device(rng):
    shape = (16, 16)
    scan = rng.integers(-500, 500, shape).astype(np.int16)
    seg = (rng.random(shape) < 0.1).astype(np.int16)
    a = 0.9
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
    affine = (rot * 3.0).astype(np.float32)
    got_scan, got_seg = native.warp_augment2d_int16(scan, seg, affine)
    coords = centered_affine_coords(shape, affine)
    ref_scan = np.asarray(bilinear_sample(jnp.asarray(scan, jnp.float32), coords))
    ref_seg = np.asarray(nearest_sample_2d(jnp.asarray(seg, jnp.float32), coords))
    assert np.abs(got_scan - np.round(ref_scan)).max() <= 1
    np.testing.assert_array_equal(got_seg, ref_seg.astype(np.int16))


def test_device_world_patch_matches_host_geometry(rng):
    """The device sample_world_patch must equal the host geometry engine
    (reference fast_trilinear semantics) INCLUDING a patch that overhangs the
    volume border by a fractional voxel — the regime where clamp-to-edge and
    the reference's extrapolation differ."""
    from contrast_gan_3d_tpu.ops import resample as dev
    from contrast_gan_3d_tpu.utils import geometry as host

    vol = rng.normal(size=(12, 11, 10)).astype(np.float32)
    spacing = np.array([0.7, 0.8, 0.9], np.float32)
    patch_size = (6, 6, 6)
    patch_spacing = np.array([1.1, 1.0, 0.9], np.float32)
    # centers: interior AND overhanging the low/high borders sub-voxel
    for center in ([3.0, 3.1, 2.9], [0.2, 0.3, 0.1], [7.9, 8.2, 8.6]):
        c = np.asarray(center, np.float32)
        want = host.sample_world_patch(vol, c, spacing, patch_size, patch_spacing)
        got = np.asarray(
            dev.sample_world_patch(
                jnp.asarray(vol), jnp.asarray(c), jnp.asarray(spacing),
                patch_size, jnp.asarray(patch_spacing),
            )
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)

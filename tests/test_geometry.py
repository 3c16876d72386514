"""Geometry unit tests: golden values derived from the reference formulas
(SURVEY.md §7 layer 2; reference utils/geometry.py:21-172)."""

import numpy as np
import pytest

from contrast_gan_3d_tpu.utils import geometry as geom


def test_world_to_image_roundtrip():
    offset = np.array([-100.0, -50.0, 10.0])
    spacing = np.array([0.5, 0.5, 1.0])
    world = np.array([[-99.0, -49.0, 12.0], [-100.0, -50.0, 10.0]])
    img = geom.world_to_image_coords(world, offset, spacing)
    np.testing.assert_array_equal(img, [[2, 2, 2], [0, 0, 0]])
    back = geom.image_to_world_coords(img, offset, spacing)
    np.testing.assert_allclose(back, world)


def test_trilinear_exact_at_voxels(rng):
    vol = rng.normal(size=(5, 6, 7)).astype(np.float32)
    xs, ys, zs = np.meshgrid(np.arange(5.0), np.arange(6.0), np.arange(7.0), indexing="ij")
    out = geom.trilinear_interpolate(vol, xs.ravel(), ys.ravel(), zs.ravel())
    np.testing.assert_allclose(out.reshape(vol.shape), vol, rtol=1e-6)


def test_trilinear_midpoint():
    vol = np.zeros((2, 2, 2), np.float32)
    vol[1, 1, 1] = 8.0
    out = geom.trilinear_interpolate(vol, np.array([0.5]), np.array([0.5]), np.array([0.5]))
    np.testing.assert_allclose(out, [1.0])  # 8 * 0.5^3


def test_trilinear_linear_ramp():
    # interpolating a linear function reproduces it exactly
    x, y, z = np.meshgrid(np.arange(8.0), np.arange(8.0), np.arange(8.0), indexing="ij")
    vol = (2 * x + 3 * y - z).astype(np.float32)
    qs = np.array([[1.5, 2.25, 3.75], [0.1, 6.9, 4.2]])
    out = geom.trilinear_interpolate(vol, qs[:, 0], qs[:, 1], qs[:, 2])
    np.testing.assert_allclose(out, 2 * qs[:, 0] + 3 * qs[:, 1] - qs[:, 2], rtol=1e-5)


def test_world_to_grid_coords_dedup_and_clip():
    offset, spacing = np.zeros(3), np.ones(3)
    pts = np.array([[1.0, 1.0, 1.0], [1.2, 1.1, 0.9], [99.0, 0.0, 0.0], [-5, 0, 0]])
    grid = geom.world_to_grid_coords(pts, offset, spacing, (4, 4, 4))
    assert grid[1, 1, 1] == 1
    assert grid[3, 0, 0] == 1  # clipped from x=99
    assert grid[0, 0, 0] == 1  # clipped from x=-5
    assert grid.sum() == 3
    assert grid.dtype == np.uint8


def test_get_patch_bounds_inside():
    bbox = geom.get_patch_bounds((4, 4), (10, 10), np.array([5, 5]))
    np.testing.assert_array_equal(bbox, [[3, 7], [3, 7]])


def test_get_patch_bounds_clamped_edges():
    bbox = geom.get_patch_bounds((4, 4), (10, 10), np.array([0, 9]))
    np.testing.assert_array_equal(bbox, [[0, 4], [6, 10]])


def test_get_patch_bounds_full_dim():
    # -1 means "use the whole source dim" (reference parse_patch_size)
    bbox = geom.get_patch_bounds((4, -1), (10, 12), np.array([5, 5]))
    np.testing.assert_array_equal(bbox[1], [0, 12])


def test_pointwise_euclidean_distance():
    a = np.array([[0.0, 0, 0], [1, 0, 0]])
    b = np.array([[0.0, 0, 0], [0, 3, 4]])
    d = geom.pointwise_euclidean_distance(a, b)
    np.testing.assert_allclose(d, [[0, 5], [1, np.sqrt(1 + 9 + 16)]])


def test_sample_world_patch_identity_spacing(rng):
    vol = rng.normal(size=(9, 9, 9)).astype(np.float32)
    # 3x3x3 patch at the exact center with unit spacings == direct crop
    patch = geom.sample_world_patch(
        vol, np.array([4.0, 4.0, 4.0]), np.ones(3), np.array([3, 3, 3]), np.ones(3)
    )
    np.testing.assert_allclose(patch, vol[3:6, 3:6, 3:6], rtol=1e-5)


def test_extract_ostia_patch_shape(rng):
    vol = rng.normal(size=(32, 32, 32)).astype(np.float32)
    ostia = np.array([[10.0, 10, 10], [20, 20, 20]])
    patches = geom.extract_ostia_patch(vol, ostia, np.zeros(3), np.ones(3))
    assert patches.shape == (2, 19, 19, 19)


def test_ensure_valid_bounds_oversized_target_clamps():
    """target > source: the whole source comes back (the caller pads).
    The reference asserts on the centered case and silently produces a
    negative wrap-around start on off-center ones (geometry.py:115-120) —
    documented divergence."""
    assert geom.ensure_valid_bounds(-1, 11, 12, 10) == (0, 10)
    # off-center window, the reference's silent-corruption case
    assert geom.ensure_valid_bounds(3, 15, 12, 10) == (0, 10)
    # in-range behavior unchanged (reference-exact)
    assert geom.ensure_valid_bounds(-2, 6, 8, 10) == (0, 8)
    assert geom.ensure_valid_bounds(5, 13, 8, 10) == (2, 10)


def test_downsample_is_choice_without_replacement():
    """utils.downsample matches the reference's np.random.choice(a, size,
    replace=False) semantics (reference utils/__init__.py:70-71)."""
    import numpy as np

    from contrast_gan_3d_tpu.utils import downsample

    a = np.arange(1000)
    out = downsample(a, 100, rng=np.random.default_rng(0))
    assert out.shape == (100,)
    assert len(np.unique(out)) == 100  # no replacement
    assert np.isin(out, a).all()

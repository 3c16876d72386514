"""Whole-volume separable (matmul) resampler — BASELINE.json's "isotropic
resampling" stage (``ops/resample.py``) and its preprocessing hook
(``data/preprocess.create_patient(out_spacing=...)``).

The matmul path must agree with the gather-based clamp-to-edge samplers
(themselves pinned against scipy ``map_coordinates(mode='nearest')`` in
test_resample_oob.py), so parity here is transitive to the reference's
augmentation semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from contrast_gan_3d_tpu.data.preprocess import create_patient, load_patient
from contrast_gan_3d_tpu.ops import resample as R
from contrast_gan_3d_tpu.utils import geometry as geom
from contrast_gan_3d_tpu.utils import io_utils


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _gather_reference(vol, in_spacing, out_spacing, out_shape):
    """Point-sample the output grid with the gather-based clamp-to-edge
    sampler — the semantics the matmul path must reproduce."""
    steps = np.asarray(out_spacing, np.float64) / np.asarray(in_spacing, np.float64)
    grid = R.identity_grid(out_shape) * jnp.asarray(steps, jnp.float32)
    return np.asarray(R.trilinear_sample(jnp.asarray(vol, jnp.float32), grid))


def test_output_shape_covers_extent():
    assert R.resample_output_shape((10, 10, 20), (1, 1, 0.5), 1.0) == (10, 10, 10)
    assert R.resample_output_shape((128,), 0.4, 0.5) == (102,)
    # never collapses to zero
    assert R.resample_output_shape((3,), 1.0, 100.0) == (1,)


def test_identity_spacing_is_exact(rng):
    vol = rng.integers(-1024, 1500, (9, 7, 5), dtype=np.int16)
    out = R.resample_volume(vol, (0.7, 0.7, 0.4), (0.7, 0.7, 0.4))
    assert out.dtype == np.int16 and out.shape == vol.shape
    np.testing.assert_array_equal(out, vol)


def test_linear_matches_gather_sampler(rng):
    vol = rng.normal(size=(12, 10, 14)).astype(np.float32)
    in_sp, out_sp = (0.6, 0.8, 0.5), (1.0, 1.0, 1.0)
    out = R.resample_volume(vol, in_sp, out_sp)
    ref = _gather_reference(vol, in_sp, out_sp, out.shape)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_linear_upsample_matches_gather_sampler(rng):
    vol = rng.normal(size=(6, 5, 7)).astype(np.float32)
    out = R.resample_volume(vol, 1.0, (0.4, 0.5, 0.25))
    ref = _gather_reference(vol, (1, 1, 1), (0.4, 0.5, 0.25), out.shape)
    assert out.shape == (15, 10, 28)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_linear_rows_sum_to_one_preserves_constants():
    vol = np.full((11, 9, 13), 123.0, np.float32)
    out = R.resample_volume(vol, (0.33, 0.7, 1.1), 0.5)
    np.testing.assert_allclose(out, 123.0, atol=1e-4)


def test_nearest_keeps_masks_binary(rng):
    mask = (rng.random((10, 12, 8)) < 0.2).astype(np.int16)
    out = R.resample_volume(mask, (0.5, 0.5, 1.0), 0.8, method="nearest")
    assert set(np.unique(out)).issubset({0, 1})
    # scipy order=0 convention: out[i] = in[clip(floor(i*step + 0.5))]
    for axis, (n_in, n_out) in enumerate(zip(mask.shape, out.shape)):
        step = 0.8 / (0.5 if axis < 2 else 1.0)
        j = np.clip(
            np.floor(np.arange(n_out) * step + 0.5).astype(int), 0, n_in - 1
        )
        mask = np.take(mask, j, axis=axis)
    np.testing.assert_array_equal(out, mask)


def test_int16_rounds_and_clips():
    # values that lerp to halves must round (half-even) and stay in-dtype
    vol = np.array([[[0, 1]]], np.int16).repeat(4, 0).repeat(4, 1)
    out = R.resample_volume(vol, 1.0, (1.0, 1.0, 0.5))
    assert out.dtype == np.int16
    assert set(np.unique(out)).issubset({0, 1})


def test_trailing_channels_pass_through(rng):
    packed = rng.normal(size=(8, 8, 8, 2)).astype(np.float32)
    out = R.resample_volume(packed, (0.5, 0.5, 0.5), 0.7)
    per_channel = np.stack(
        [
            R.resample_volume(packed[..., c], (0.5, 0.5, 0.5), 0.7)
            for c in range(2)
        ],
        axis=-1,
    )
    assert out.shape[-1] == 2
    np.testing.assert_allclose(out, per_channel, atol=1e-6)


def test_2d_resample(rng):
    img = rng.normal(size=(16, 12)).astype(np.float32)
    out = R.resample_volume(img, (0.5, 0.75), (1.0, 1.0))
    assert out.shape == (8, 9)
    steps = np.array([2.0, 4.0 / 3.0])
    grid = R.identity_grid_2d(out.shape) * jnp.asarray(steps, jnp.float32)
    ref = np.asarray(R.bilinear_sample(jnp.asarray(img), grid))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_explicit_out_shape():
    vol = np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
    fn, shape = R.make_volume_resampler((4, 4, 4), 1.0, 0.5, out_shape=(5, 6, 7))
    assert shape == (5, 6, 7)
    assert fn(jnp.asarray(vol)).shape == (5, 6, 7)


def test_unknown_method_raises():
    with pytest.raises(ValueError, match="unknown resample method"):
        R.make_volume_resampler((4, 4, 4), 1.0, 0.5, method="cubic")


def test_create_patient_out_spacing(tmp_path, rng):
    # synthetic raw patient on disk: anisotropic 0.5x0.5x1.0 mm scan
    shape, spacing, offset = (16, 16, 8), (0.5, 0.5, 1.0), (-4.0, -4.0, 0.0)
    vol = rng.integers(-200, 800, shape, dtype=np.int16)
    io_utils.write_mhd(
        vol, tmp_path / "p1.mhd", spacing=np.asarray(spacing), origin=np.asarray(offset)
    )
    pdir = tmp_path / "p1"
    pdir.mkdir()
    # two centerline points at known world coords (inside the volume)
    (pdir / "vessel0.txt").write_text("-3.0 -3.0 2.0 0.5\n0.0 0.0 5.0 0.5\n")
    (pdir / "ostia.xml").write_text(
        "<XMarkerList><ListSize>2</ListSize>"
        "<Item><pos>-3 -3 2</pos></Item><Item><pos>0 0 5</pos></Item>"
        "</XMarkerList>"
    )

    out = create_patient(
        tmp_path / "p1.mhd", pdir, pdir / "ostia.xml", tmp_path / "out",
        out_spacing=1.0,
    )
    data, meta = load_patient(out)
    # 16 * 0.5 / 1.0 = 8 in-plane, z unchanged
    assert data.shape == (8, 8, 8, 2)
    np.testing.assert_allclose(meta["spacing"], 1.0)
    np.testing.assert_allclose(meta["offset"], offset)

    # scan channel equals a direct resample of the raw volume
    expected = R.resample_volume(vol, spacing, 1.0)
    np.testing.assert_array_equal(data[..., 0], expected)

    # mask was rasterized on the FINAL grid from world coords
    ctls = meta["centerlines_world"][..., :3]
    expected_mask = geom.world_to_grid_coords(
        ctls, np.asarray(offset), np.ones(3), (8, 8, 8)
    )
    np.testing.assert_array_equal(data[..., 1], expected_mask.astype(np.int16))
    assert data[..., 1].sum() > 0


def test_resample_volume_spatial_dims_for_2d_plus_channels(rng):
    """spatial_dims=2 keeps a (W, H, C) channel axis out of the resample
    (scalar spacing + 3-D array is otherwise read as (W, H, D))."""
    img = rng.normal(size=(16, 16, 2)).astype(np.float32)
    out = R.resample_volume(img, 1.0, 2.0, spatial_dims=2)
    assert out.shape == (8, 8, 2)
    np.testing.assert_allclose(
        out[..., 1], R.resample_volume(img[..., 1], 1.0, 2.0, spatial_dims=2), atol=1e-5
    )
    # default inference on a 3-D array still treats all three dims as spatial
    assert R.resample_volume(img, 1.0, 2.0).shape == (8, 8, 1)

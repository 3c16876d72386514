"""Host-side geometry engine (numpy).

Capability parity with reference ``contrast_gan_3D/utils/geometry.py``:
world<->image coordinate transforms (:21-26), vectorized trilinear
interpolation (:30-58), world-space oriented patch resampling (:63-96),
ostia patch extraction (:99-111), clamped patch bounds (:115-138),
centerline rasterization (:141-157) and pairwise euclidean distance
(:167-172). These run on host during offline preprocessing and evaluation;
the device (jittable) resampler lives in ``contrast_gan_3d_tpu.ops.resample``.
"""

from typing import Sequence, Tuple

import numpy as np

from contrast_gan_3d_tpu import utils
from contrast_gan_3d_tpu.constants import AORTIC_ROOT_PATCH_SIZE, AORTIC_ROOT_PATCH_SPACING


def deg_to_radians(deg: float) -> float:
    return deg * np.pi / 180.0


def world_to_image_coords(
    world_coords: np.ndarray, offset: np.ndarray, spacing: np.ndarray
) -> np.ndarray:
    """Map world-space (mm) points to integer voxel indices: round((w - o)/s)."""
    world_coords = np.asarray(world_coords)
    assert world_coords.shape[-1] == 3, world_coords.shape
    return np.round((world_coords - np.asarray(offset)) / np.asarray(spacing)).astype(int)


def image_to_world_coords(
    image_coords: np.ndarray, offset: np.ndarray, spacing: np.ndarray
) -> np.ndarray:
    return np.asarray(image_coords) * np.asarray(spacing) + np.asarray(offset)


def trilinear_interpolate(
    volume: np.ndarray, xs: np.ndarray, ys: np.ndarray, zs: np.ndarray
) -> np.ndarray:
    """Vectorized trilinear interpolation at fractional voxel coordinates with
    clamp-to-edge boundary handling (reference ``fast_trilinear``,
    geometry.py:30-58 — exact semantics: the base index truncates toward zero
    and the +1 neighbor is clipped independently of the clipped base, so even
    deep out-of-range coordinates extrapolate identically)."""
    shape = volume.shape
    x0p = np.asarray(xs).astype(np.int64)
    y0p = np.asarray(ys).astype(np.int64)
    z0p = np.asarray(zs).astype(np.int64)
    x0 = np.clip(x0p, 0, shape[0] - 1)
    y0 = np.clip(y0p, 0, shape[1] - 1)
    z0 = np.clip(z0p, 0, shape[2] - 1)
    x1 = np.clip(x0p + 1, 0, shape[0] - 1)
    y1 = np.clip(y0p + 1, 0, shape[1] - 1)
    z1 = np.clip(z0p + 1, 0, shape[2] - 1)

    fx, fy, fz = xs - x0, ys - y0, zs - z0
    c000 = volume[x0, y0, z0]
    c100 = volume[x1, y0, z0]
    c010 = volume[x0, y1, z0]
    c001 = volume[x0, y0, z1]
    c110 = volume[x1, y1, z0]
    c101 = volume[x1, y0, z1]
    c011 = volume[x0, y1, z1]
    c111 = volume[x1, y1, z1]
    return (
        c000 * (1 - fx) * (1 - fy) * (1 - fz)
        + c100 * fx * (1 - fy) * (1 - fz)
        + c010 * (1 - fx) * fy * (1 - fz)
        + c001 * (1 - fx) * (1 - fy) * fz
        + c110 * fx * fy * (1 - fz)
        + c101 * fx * (1 - fy) * fz
        + c011 * (1 - fx) * fy * fz
        + c111 * fx * fy * fz
    )


def sample_world_patch(
    volume: np.ndarray,
    center_world: np.ndarray,
    image_spacing: np.ndarray,
    patch_size: np.ndarray,
    patch_spacing: np.ndarray,
) -> np.ndarray:
    """Resample an axis-aligned patch centered at ``center_world`` (given in
    world mm relative to the image origin) at ``patch_spacing`` mm/voxel
    (reference ``draw_sample_3D_world_fast``, geometry.py:63-96)."""
    patch_size = np.asarray(patch_size)
    margin = (patch_size - 1) / 2.0
    axes = [
        (center_world[i] + (np.arange(patch_size[i]) - margin[i]) * patch_spacing[i])
        / image_spacing[i]
        for i in range(3)
    ]
    xs, ys, zs = np.meshgrid(*axes, indexing="ij")
    return trilinear_interpolate(volume, xs.ravel(), ys.ravel(), zs.ravel()).reshape(
        tuple(patch_size)
    )


def extract_ostia_patch(
    scan: np.ndarray,
    ostia_world: np.ndarray,
    offset: np.ndarray,
    spacing: np.ndarray,
    patch_size: np.ndarray = AORTIC_ROOT_PATCH_SIZE,
    patch_spacing: np.ndarray = AORTIC_ROOT_PATCH_SPACING,
) -> np.ndarray:
    """Cut one resampled patch per ostium (reference ``extract_ostia_patch_3D``)."""
    return np.stack(
        [
            sample_world_patch(scan, coords, spacing, patch_size, patch_spacing)
            for coords in np.asarray(ostia_world) - np.asarray(offset)
        ]
    )


def ensure_valid_bounds(s: int, e: int, target_size: int, size: int) -> Tuple[int, int]:
    """Shift a [s, e) window so it fits in [0, size) (reference geometry.py:115-127).

    Deliberate divergence: when ``target_size > size`` the window is the
    whole source (the caller pads). The reference either trips its assert
    (centered case) or rewrites an off-center window to a NEGATIVE start
    ``size - target_size`` — a silent wrap-around slice that extracts the
    wrong (and short) patch."""
    if target_size >= size:
        return 0, size
    assert not (s < 0 and e > size), f"window [{s}, {e}) invalid for size {size}"
    if s < 0:
        s, e = 0, target_size
    if e > size:
        s, e = size - target_size, size
    return s, e


def get_patch_bounds(
    target_shape: Sequence[int], source_shape: Sequence[int], coords: np.ndarray
) -> np.ndarray:
    """Bounding box of shape ``target_shape`` centered on ``coords``, clamped
    inside ``source_shape`` (reference ``get_patch_bounds``, geometry.py:131-138).

    Deliberate divergence: -1 target dims are resolved to the source dim
    BEFORE clamping. The reference resolves them only for ``half``, so a -1
    dim clamped at the low edge yields a degenerate ``[0, -1]`` window whose
    ``slice(0, -1)`` silently drops the last row (pinned by
    ``tests/test_reference_parity_numpy.py``)."""
    target = utils.parse_patch_size(target_shape, source_shape)
    half = target // 2
    coords = np.asarray(coords)
    bbox = np.stack([coords - half, coords + half + target % 2], axis=-1)
    for i in range(len(bbox)):
        bbox[i] = ensure_valid_bounds(bbox[i, 0], bbox[i, 1], target[i], source_shape[i])
    return bbox


def world_to_grid_coords(
    points_world: np.ndarray,
    offset: np.ndarray,
    spacing: np.ndarray,
    grid_shape: Sequence[int],
) -> np.ndarray:
    """Rasterize world-space points into a binary uint8 voxel grid with
    dedup + clipping (reference ``world_to_grid_coords``, geometry.py:141-157)."""
    img_coords = world_to_image_coords(points_world, offset, spacing)
    img_coords = np.unique(img_coords, axis=0)
    grid = np.zeros(tuple(grid_shape), dtype=np.uint8)
    clipped = tuple(
        np.clip(img_coords[:, i], 0, grid_shape[i] - 1) for i in range(3)
    )
    grid[clipped] = 1
    return grid


def grid_to_cartesian_coords(grid_mask: np.ndarray) -> np.ndarray:
    """Indices of nonzero voxels, shape (N, ndim)."""
    return np.stack(np.nonzero(grid_mask), axis=-1)


def pointwise_euclidean_distance(
    centerlines: np.ndarray, annotations: np.ndarray
) -> np.ndarray:
    """(X, 3) x (Y, 3) -> (X, Y) pairwise euclidean distances
    (reference geometry.py:167-172)."""
    delta = centerlines[:, None, :] - annotations[None]
    return np.sqrt(np.square(delta).sum(-1))

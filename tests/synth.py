"""Synthetic CCTA fixtures: fake scans + centerlines for end-to-end tests
(SURVEY.md §4: tiny random "CCTA" volumes with synthetic vessel centerlines,
the test_conf idea made into a real fixture)."""

from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

from contrast_gan_3d_tpu.data.preprocess import write_patient


def synthetic_patient(
    rng: np.random.Generator,
    shape: Tuple[int, int, int] = (24, 24, 24),
    n_centerline_points: int = 30,
    contrast_hu: int = 400,
):
    """A noisy soft-tissue volume with a bright 'vessel' polyline burned in.
    Returns (volume int16, mask uint8, centerlines_world (N, 4), meta)."""
    vol = rng.normal(40.0, 30.0, shape).astype(np.float32)
    spacing = np.array([0.5, 0.5, 0.5])
    offset = np.array([-10.0, -5.0, 0.0])

    t = np.linspace(0, 1, n_centerline_points)
    pts = np.stack(
        [
            (0.2 + 0.6 * t) * shape[0],
            (0.5 + 0.3 * np.sin(2 * np.pi * t)) * shape[1] / 2 + shape[1] / 4,
            (0.1 + 0.8 * t) * shape[2],
        ],
        axis=-1,
    )
    mask = np.zeros(shape, np.uint8)
    ijk = np.clip(np.round(pts).astype(int), 0, np.asarray(shape) - 1)
    for x, y, z in ijk:
        vol[x, y, z] = contrast_hu + rng.normal(0, 10)
        mask[x, y, z] = 1
    radii = np.full((len(pts), 1), 0.7)
    centerlines_world = np.concatenate([pts * spacing + offset, radii], axis=-1)
    meta = {
        "spacing": spacing,
        "offset": offset,
        "ostia_world": (pts[:2] * spacing + offset).astype(np.float32),
        "centerlines_world": centerlines_world.astype(np.float32),
    }
    return vol.astype(np.int16), mask, centerlines_world.astype(np.float32), meta


def make_dataset(
    tmp_path: Path,
    rng: np.random.Generator,
    n_per_label: int = 1,
    shape: Tuple[int, int, int] = (24, 24, 24),
    labels: Sequence[int] = (0, -1, 1),
    fmt: str = "npy",
):
    """Write synthetic preprocessed patients; returns a fold: [(path, label)].
    ``fmt``: "npy" (reference layout), "h5" (standalone HDF5 patients) — or
    pass a ``tmp_path`` ending in .h5 for one corpus file."""
    fold = []
    for label in labels:
        for i in range(n_per_label):
            vol, mask, _, meta = synthetic_patient(rng, shape)
            name = f"synth_{label}_{i}"
            path = write_patient(vol, mask, meta, name, tmp_path, fmt=fmt)
            fold.append((str(path), label))
    return fold


def centered_affine_coords(shape: Sequence[int], affine: np.ndarray):
    """Device-path sampling coordinates of the host augmentation warp:
    ``src = affine @ (dst - center) + center`` with ``center = (shape-1)/2``
    — the ONE definition every host-vs-device warp parity test shares (3D
     3x3 and 2D 2x2 affines)."""
    import jax.numpy as jnp

    from contrast_gan_3d_tpu.ops.resample import identity_grid, identity_grid_2d

    grid = identity_grid(tuple(shape)) if len(shape) == 3 else identity_grid_2d(tuple(shape))
    center = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0
    return (grid - center) @ jnp.asarray(affine, jnp.float32).T + center

"""Jittable trilinear resampling (device-side geometry engine).

TPU-native counterpart of two distinct reference resampler semantics, kept
distinct here too — everything is pure jnp and jit/vmap-friendly:

- the augmentation samplers (``trilinear_sample`` / ``bilinear_sample`` /
  ``nearest_sample*``) are TRUE clamp-to-edge, matching batchgenerators'
  ``scipy.ndimage.map_coordinates(order=1, mode='nearest')`` under the
  reference's spatial transforms;
- ``trilinear_sample_extrapolate`` (used by :func:`sample_world_patch`)
  mirrors the reference's ``fast_trilinear`` (``contrast_gan_3D/utils/
  geometry.py:30-58``) exactly — including its border extrapolation — so the
  device world-patch extraction equals the host geometry engine
  (``utils/geometry.py``) bit-for-bit in semantics.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _lerp8(volume4d, x0, x1, y0, y1, z0, z1, fx, fy, fz):
    """The shared 8-corner trilinear blend: one flattened gather per corner
    (XLA lowers these to efficient dynamic-gathers; lerp weights run on the
    VPU). Index/fraction derivation — the ONLY place the clamping vs
    extrapolating samplers differ — happens in the callers."""
    X, Y, Z, C = volume4d.shape
    flat = volume4d.reshape(-1, C)
    fx, fy, fz = fx[..., None], fy[..., None], fz[..., None]

    def gather(ix, iy, iz):
        return jnp.take(flat, (ix * Y + iy) * Z + iz, axis=0)

    return (
        gather(x0, y0, z0) * (1 - fx) * (1 - fy) * (1 - fz)
        + gather(x1, y0, z0) * fx * (1 - fy) * (1 - fz)
        + gather(x0, y1, z0) * (1 - fx) * fy * (1 - fz)
        + gather(x0, y0, z1) * (1 - fx) * (1 - fy) * fz
        + gather(x1, y1, z0) * fx * fy * (1 - fz)
        + gather(x1, y0, z1) * fx * (1 - fy) * fz
        + gather(x0, y1, z1) * (1 - fx) * fy * fz
        + gather(x1, y1, z1) * fx * fy * fz
    )


def trilinear_sample(volume: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``volume`` ((X, Y, Z) or (X, Y, Z, C)) at fractional voxel
    ``coords`` (..., 3) with clamp-to-edge boundaries. Returns (...,) or
    (..., C) samples."""
    has_channels = volume.ndim == 4
    if not has_channels:
        volume = volume[..., None]
    X, Y, Z, _ = volume.shape

    xs, ys, zs = coords[..., 0], coords[..., 1], coords[..., 2]
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, X - 1)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, Y - 1)
    z0 = jnp.clip(jnp.floor(zs).astype(jnp.int32), 0, Z - 1)
    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)

    # fraction clamped to [0, 1]: TRUE clamp-to-edge even for coords beyond
    # the first/last voxel (an unclamped fraction against the clamped base
    # extrapolates with negative lerp weights — batchgenerators' border mode
    # "nearest", which the reference augmenter uses, clamps instead)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    fz = jnp.clip(zs - z0, 0.0, 1.0)

    out = _lerp8(volume, x0, x1, y0, y1, z0, z1, fx, fy, fz)
    return out if has_channels else out[..., 0]


def trilinear_sample_extrapolate(volume: jax.Array, coords: jax.Array) -> jax.Array:
    """Device mirror of the host geometry engine's trilinear interpolation
    (``utils/geometry.trilinear_interpolate`` == reference ``fast_trilinear``,
    geometry.py:30-58): the base index truncates TOWARD ZERO, the +1 neighbor
    clips independently of the clipped base, and the fraction (relative to
    the clipped base) is left unclamped — coordinates within one voxel of the
    border therefore *extrapolate* exactly like the reference, rather than
    clamping. Use for world-space patch extraction parity; use
    :func:`trilinear_sample` for augmentation."""
    has_channels = volume.ndim == 4
    if not has_channels:
        volume = volume[..., None]
    X, Y, Z, _ = volume.shape
    xs, ys, zs = coords[..., 0], coords[..., 1], coords[..., 2]
    x0p = xs.astype(jnp.int32)  # float->int cast truncates toward zero
    y0p = ys.astype(jnp.int32)
    z0p = zs.astype(jnp.int32)
    x0 = jnp.clip(x0p, 0, X - 1)
    y0 = jnp.clip(y0p, 0, Y - 1)
    z0 = jnp.clip(z0p, 0, Z - 1)
    x1 = jnp.clip(x0p + 1, 0, X - 1)
    y1 = jnp.clip(y0p + 1, 0, Y - 1)
    z1 = jnp.clip(z0p + 1, 0, Z - 1)
    out = _lerp8(volume, x0, x1, y0, y1, z0, z1, xs - x0, ys - y0, zs - z0)
    return out if has_channels else out[..., 0]


def nearest_sample(volume: jax.Array, coords: jax.Array) -> jax.Array:
    """Nearest-neighbour sampling (used for segmentation masks). Rounds
    half-to-even (jnp.round) — identical to the native host warp (parity
    pinned by tests/test_host_augment.py); scipy ``order=0`` rounds half
    UP, so the two differ only at exactly-half-integer coordinates."""
    has_channels = volume.ndim == 4
    if not has_channels:
        volume = volume[..., None]
    X, Y, Z, C = volume.shape
    ix = jnp.clip(jnp.round(coords[..., 0]).astype(jnp.int32), 0, X - 1)
    iy = jnp.clip(jnp.round(coords[..., 1]).astype(jnp.int32), 0, Y - 1)
    iz = jnp.clip(jnp.round(coords[..., 2]).astype(jnp.int32), 0, Z - 1)
    out = jnp.take(volume.reshape(-1, C), (ix * Y + iy) * Z + iz, axis=0)
    return out if has_channels else out[..., 0]


def bilinear_sample(image: jax.Array, coords: jax.Array) -> jax.Array:
    """2D counterpart of :func:`trilinear_sample`: sample ``image`` ((X, Y) or
    (X, Y, C)) at fractional coords (..., 2), clamp-to-edge."""
    has_channels = image.ndim == 3
    if not has_channels:
        image = image[..., None]
    X, Y, C = image.shape
    xs, ys = coords[..., 0], coords[..., 1]
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, X - 1)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, Y - 1)
    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    fx = jnp.clip(xs - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(ys - y0, 0.0, 1.0)[..., None]
    flat = image.reshape(-1, C)
    gather = lambda ix, iy: jnp.take(flat, ix * Y + iy, axis=0)
    out = (
        gather(x0, y0) * (1 - fx) * (1 - fy)
        + gather(x1, y0) * fx * (1 - fy)
        + gather(x0, y1) * (1 - fx) * fy
        + gather(x1, y1) * fx * fy
    )
    return out if has_channels else out[..., 0]


def nearest_sample_2d(image: jax.Array, coords: jax.Array) -> jax.Array:
    has_channels = image.ndim == 3
    if not has_channels:
        image = image[..., None]
    X, Y, C = image.shape
    ix = jnp.clip(jnp.round(coords[..., 0]).astype(jnp.int32), 0, X - 1)
    iy = jnp.clip(jnp.round(coords[..., 1]).astype(jnp.int32), 0, Y - 1)
    out = jnp.take(image.reshape(-1, C), ix * Y + iy, axis=0)
    return out if has_channels else out[..., 0]


def identity_grid_2d(shape: Tuple[int, int]) -> jax.Array:
    ax = [jnp.arange(s, dtype=jnp.float32) for s in shape]
    gx, gy = jnp.meshgrid(*ax, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def identity_grid(shape: Tuple[int, int, int]) -> jax.Array:
    """(X, Y, Z, 3) grid of voxel coordinates."""
    ax = [jnp.arange(s, dtype=jnp.float32) for s in shape]
    gx, gy, gz = jnp.meshgrid(*ax, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1)


def rotation_matrix(angles: jax.Array) -> jax.Array:
    """3x3 rotation from per-axis angles (radians): Rz @ Ry @ Rx."""
    cx, sx = jnp.cos(angles[0]), jnp.sin(angles[0])
    cy, sy = jnp.cos(angles[1]), jnp.sin(angles[1])
    cz, sz = jnp.cos(angles[2]), jnp.sin(angles[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


# ---------------------------------------------------------------------------
# Whole-volume (an)isotropic resampling — separable, matmul-based.
#
# Point-sampling a full grid with the gather samplers above is the WRONG tool
# for whole-volume spacing changes on TPU (data-dependent gathers run on the
# scalar/VPU path; the round-1 device augmentation warp measured 1.4 s/step
# for exactly this reason, PERF.md). A fixed spacing change is a SEPARABLE
# linear map: one small (n_out, n_in) interpolation matrix per axis, applied
# as three dense contractions that ride the MXU. For a 512^3 volume each pass
# is a (512 x 512) x (512 x 512^2) matmul — microseconds of MXU time, and XLA
# fuses the dtype casts in/out.
#
# Grid convention (matches SimpleITK/ITK Resample with the same origin +
# direction): voxel i of the output grid sits at world offset i * out_spacing
# along each axis, i.e. input index x = i * out_spacing / in_spacing; borders
# clamp to edge. The output extent covers the input's physical extent:
# n_out = round(n_in * in_spacing / out_spacing).
# ---------------------------------------------------------------------------


def _resample_axis_matrix(
    n_in: int, n_out: int, step: float, method: str = "linear"
) -> np.ndarray:
    """(n_out, n_in) interpolation matrix for input coords x_i = i * step.

    ``linear``: clamp-to-edge lerp (rows sum to 1, at most 2 taps).
    ``nearest``: one tap at floor(x + 0.5) — scipy ``order=0`` convention;
    keeps segmentation masks binary."""
    x = np.arange(n_out, dtype=np.float64) * float(step)
    mat = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    if method == "nearest":
        j = np.clip(np.floor(x + 0.5).astype(np.int64), 0, n_in - 1)
        mat[rows, j] = 1.0
        return mat
    if method != "linear":
        raise ValueError(f"unknown resample method: {method!r}")
    j0 = np.clip(np.floor(x).astype(np.int64), 0, n_in - 1)
    j1 = np.minimum(j0 + 1, n_in - 1)
    f = np.clip(x - j0, 0.0, 1.0)  # clamp-to-edge, like trilinear_sample
    mat[rows, j0] += (1.0 - f).astype(np.float32)
    mat[rows, j1] += f.astype(np.float32)
    return mat


def resample_output_shape(in_shape, in_spacing, out_spacing) -> Tuple[int, ...]:
    """Output grid covering the input's physical extent at ``out_spacing``."""
    n_in = np.asarray(in_shape, dtype=np.float64)
    s_in = np.broadcast_to(np.asarray(in_spacing, np.float64), n_in.shape)
    s_out = np.broadcast_to(np.asarray(out_spacing, np.float64), n_in.shape)
    return tuple(int(max(1, round(n * si / so))) for n, si, so in zip(n_in, s_in, s_out))


def make_volume_resampler(
    in_shape: Tuple[int, ...],
    in_spacing,
    out_spacing,
    out_shape: Tuple[int, ...] = None,
    method: str = "linear",
    compute_dtype=jnp.float32,
):
    """Build a jittable separable resampler ``fn(volume) -> volume'`` for a
    fixed shape/spacing pair (2D or 3D; trailing channel dims pass through).

    int16 in -> int16 out (round-half-even), float in -> float out. The
    interpolation matrices are baked in as constants, so ``jax.jit(fn)``
    compiles to ``ndim`` dense contractions — no gathers.
    """
    ndim = len(in_shape)
    if out_shape is None:
        out_shape = resample_output_shape(in_shape, in_spacing, out_spacing)
    s_in = np.broadcast_to(np.asarray(in_spacing, np.float64), (ndim,))
    s_out = np.broadcast_to(np.asarray(out_spacing, np.float64), (ndim,))
    mats = [
        jnp.asarray(
            _resample_axis_matrix(int(n), int(m), so / si, method=method)
        )
        for n, m, si, so in zip(in_shape, out_shape, s_in, s_out)
    ]

    def fn(volume: jax.Array) -> jax.Array:
        in_dtype = volume.dtype
        vol = volume.astype(compute_dtype)
        for axis, mat in enumerate(mats):
            vol = jnp.moveaxis(
                jnp.tensordot(mat.astype(compute_dtype), vol, axes=(1, axis)),
                0,
                axis,
            )
        if jnp.issubdtype(in_dtype, jnp.integer):
            info = jnp.iinfo(in_dtype)
            vol = jnp.clip(jnp.round(vol), info.min, info.max)
        return vol.astype(in_dtype)

    return fn, tuple(out_shape)


def resample_volume(
    volume,
    in_spacing,
    out_spacing,
    out_shape: Tuple[int, ...] = None,
    method: str = "linear",
    compute_dtype=jnp.float32,
    spatial_dims: Optional[int] = None,
) -> np.ndarray:
    """One-shot (an)isotropic resample of a host volume ((W, H, D[, C]) or
    (W, H[, C])). Device-capable counterpart of the "isotropic resampling"
    stage the reference delegates to SimpleITK; returns a host numpy array.

    Spatial rank = ``spatial_dims`` when given, else len(broadcasted
    spacing); trailing dims (e.g. the packed scan+mask channel of a
    preprocessed patient) are untouched. With SCALAR spacings and no
    ``spatial_dims`` the first min(ndim, 3) dims are treated as spatial —
    a 3-D array is then read as (W, H, D); pass ``spatial_dims=2`` for a
    (W, H, C) 2-D-plus-channels array (otherwise the channel axis would be
    resampled as depth).
    """
    spatial = max(len(np.atleast_1d(in_spacing)), len(np.atleast_1d(out_spacing)))
    if spatial_dims is not None:
        spatial = int(spatial_dims)
    elif spatial == 1:  # scalar spacings: resample the (up to 3) leading dims
        spatial = min(volume.ndim, 3)
    fn, _ = make_volume_resampler(
        volume.shape[:spatial],
        in_spacing,
        out_spacing,
        out_shape=out_shape,
        method=method,
        compute_dtype=compute_dtype,
    )
    return np.asarray(jax.jit(fn)(jnp.asarray(volume)))


def sample_world_patch(
    volume: jax.Array,
    center_world: jax.Array,
    image_spacing: jax.Array,
    patch_size: Tuple[int, int, int],
    patch_spacing: jax.Array,
) -> jax.Array:
    """Device counterpart of geometry.sample_world_patch: resample an
    axis-aligned ``patch_size`` patch centered at ``center_world`` mm
    (relative to the image origin) at ``patch_spacing`` mm/voxel. Uses the
    extrapolating reference-``fast_trilinear`` semantics so device and host
    world patches agree even when the patch overhangs the volume border."""
    grid = identity_grid(patch_size)  # (px, py, pz, 3)
    margin = (jnp.asarray(patch_size, jnp.float32) - 1.0) / 2.0
    coords = (center_world + (grid - margin) * patch_spacing) / image_spacing
    return trilinear_sample_extrapolate(volume, coords)

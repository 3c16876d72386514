"""On-device spatial augmentation: one fused displacement-field resample.

TPU-native replacement for batchgenerators' CPU ``SpatialTransform_2``
pipeline (reference ``experiments/basic_conf.py:88-113``): per-sample elastic
deformation (p=0.1, scale (0, 0.25)), isotropic scaling (p=0.2, 0.7-1.4) and
rotation (p=0.2, +-30 deg per axis) — but instead of N worker processes
deforming patches on host, the whole batch is augmented in a single jitted,
vmapped kernel on device: compose affine + elastic displacement into ONE
coordinate field and do ONE trilinear gather for the scan (nearest for the
mask). Semantics match batchgenerators (per-sample probabilities, clamp-to-
edge borders, center-anchored transforms); the elastic field construction is
a smooth coarse-noise upsample rather than scipy gaussian_filter — same
spectral character, XLA-friendly.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from contrast_gan_3d_tpu.ops.resample import (
    bilinear_sample,
    identity_grid,
    identity_grid_2d,
    nearest_sample,
    nearest_sample_2d,
    rotation_matrix,
    trilinear_sample,
)


@dataclass(frozen=True)
class AugmentConfig:
    # elastic deformation
    do_elastic: bool = True
    deformation_scale: Tuple[float, float] = (0.0, 0.25)
    p_elastic: float = 0.1
    elastic_grid: int = 8  # coarse noise grid resolution per axis
    # scaling
    do_scale: bool = True
    scale_range: Tuple[float, float] = (0.7, 1.4)
    p_scale: float = 0.2
    # rotation
    do_rotation: bool = True
    angle: float = 30.0 * jnp.pi / 180.0  # +- bound per axis, radians
    p_rotation: float = 0.2


def _sample_coords(key: jax.Array, shape: Tuple[int, int, int], cfg: AugmentConfig):
    """Random warped coordinate field (X, Y, Z, 3) for one sample."""
    k_rot, k_rot_p, k_scale, k_scale_p, k_el, k_el_p, k_el_mag = jax.random.split(key, 7)
    grid = identity_grid(shape)
    center = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0
    rel = grid - center

    if cfg.do_rotation:
        gate = jax.random.bernoulli(k_rot_p, cfg.p_rotation)
        angles = jax.random.uniform(k_rot, (3,), minval=-cfg.angle, maxval=cfg.angle)
        rot = rotation_matrix(jnp.where(gate, angles, 0.0))
        rel = rel @ rot.T

    if cfg.do_scale:
        gate = jax.random.bernoulli(k_scale_p, cfg.p_scale)
        s = jax.random.uniform(
            k_scale, (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
        )
        # sampling-grid scale: s > 1 zooms OUT (object shrinks), matching
        # batchgenerators' convention where scale multiplies the coords
        rel = rel * jnp.where(gate, s, 1.0)

    coords = rel + center

    if cfg.do_elastic:
        gate = jax.random.bernoulli(k_el_p, cfg.p_elastic)
        mag_frac = jax.random.uniform(
            k_el_mag, (), minval=cfg.deformation_scale[0], maxval=cfg.deformation_scale[1]
        )
        g = cfg.elastic_grid
        coarse = jax.random.uniform(k_el, (g, g, g, 3), minval=-1.0, maxval=1.0)
        # linear upsample matches the native host warp's on-the-fly trilinear
        # field interpolation, so augment_backend="host"/"device" agree
        field = jax.image.resize(coarse, (*shape, 3), method="linear")
        # displacement magnitude: fraction of the patch extent per axis
        amplitude = mag_frac * jnp.asarray(shape, jnp.float32) / 4.0
        coords = coords + jnp.where(gate, 1.0, 0.0) * field * amplitude

    return coords


def _augment_one(data: jax.Array, seg: jax.Array, key: jax.Array, cfg: AugmentConfig):
    coords = _sample_coords(key, data.shape, cfg)
    return trilinear_sample(data, coords), nearest_sample(seg, coords)


def augment_batch(
    data: jax.Array, seg: jax.Array, key: jax.Array, cfg: AugmentConfig = AugmentConfig()
):
    """Augment a (B, X, Y, Z) scan batch + its (B, X, Y, Z) mask batch with
    per-sample random spatial transforms. Jit-safe; vmapped over the batch.
    (B, X, Y) batches dispatch to the 2D path (conf_2D parity)."""
    keys = jax.random.split(key, data.shape[0])
    if data.ndim == 3:
        return jax.vmap(_augment2d_one, in_axes=(0, 0, 0, None))(data, seg, keys, cfg)
    return jax.vmap(_augment_one, in_axes=(0, 0, 0, None))(data, seg, keys, cfg)


@dataclass(frozen=True)
class Augment2DConfig(AugmentConfig):
    """conf_2D augmentation (reference conf_2D.py:30-56): rotation only
    (+-360 deg, p=0.5) plus axis mirroring (p=0.5 per sample, each axis
    50/50 — batchgenerators MirrorTransform)."""

    do_elastic: bool = False
    do_scale: bool = False
    do_rotation: bool = True
    angle: float = float(2 * jnp.pi)
    p_rotation: float = 0.5
    do_mirror: bool = True
    p_mirror: float = 0.5


def _augment2d_one(data: jax.Array, seg: jax.Array, key: jax.Array, cfg: AugmentConfig):
    """2D per-sample transform: in-plane rotation + optional mirroring."""
    k_rot, k_rot_p, k_mir_p, k_mir_x, k_mir_y = jax.random.split(key, 5)
    shape = data.shape
    grid = identity_grid_2d(shape)
    center = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0
    rel = grid - center

    if cfg.do_rotation:
        gate = jax.random.bernoulli(k_rot_p, cfg.p_rotation)
        a = jnp.where(
            gate, jax.random.uniform(k_rot, (), minval=-cfg.angle, maxval=cfg.angle), 0.0
        )
        c, s = jnp.cos(a), jnp.sin(a)
        rot = jnp.array([[1.0, 0.0], [0.0, 1.0]]) * c + jnp.array(
            [[0.0, -1.0], [1.0, 0.0]]
        ) * s
        rel = rel @ rot.T

    if getattr(cfg, "do_mirror", False):
        gate = jax.random.bernoulli(k_mir_p, getattr(cfg, "p_mirror", 0.5))
        mx = jnp.where(gate & jax.random.bernoulli(k_mir_x, 0.5), -1.0, 1.0)
        my = jnp.where(gate & jax.random.bernoulli(k_mir_y, 0.5), -1.0, 1.0)
        rel = rel * jnp.stack([mx, my])

    coords = rel + center
    return bilinear_sample(data, coords), nearest_sample_2d(seg, coords)

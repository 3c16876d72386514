"""Host-side spatial augmentation (native C++ warp in the prefetch pipeline).

Same transform semantics as the on-device path (``data/augment.py`` —
per-sample elastic p=0.1, isotropic scale 0.7-1.4 p=0.2, rotation +-30deg
p=0.2; reference ``experiments/basic_conf.py:88-113``), but executed by
``native.warp_augment_int16`` on the host inside the async prefetch workers.
Rationale: TPUs are extremely slow at data-dependent gathers — the device
trilinear warp measured 1.4 s for 8x128^3 patches on v5e, ~60% of a whole
train step — while the C++ warp (AVX-512 16-wide z-lines with gather-based
trilinear taps + OpenMP slab-split) is ~11 ms/patch on one host core and
fully overlaps with device compute. The device path remains available
(StepConfig.augment) for hosts without a toolchain."""

import threading
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from contrast_gan_3d_tpu import native
from contrast_gan_3d_tpu.data.augment import Augment2DConfig, AugmentConfig


def rotation_matrix_np(angles: np.ndarray) -> np.ndarray:
    """Rz @ Ry @ Rx from per-axis radians (matches ops/resample.py)."""
    cx, sx = np.cos(angles[0]), np.sin(angles[0])
    cy, sy = np.cos(angles[1]), np.sin(angles[1])
    cz, sz = np.cos(angles[2]), np.sin(angles[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


@dataclass
class HostAugmenter:
    """Per-sample random spatial transforms applied via the native warp.
    Thread-safe: parameter draws are locked; the warp itself runs outside."""

    cfg: AugmentConfig
    rng: np.random.Generator
    # init=False: dataclasses.replace() re-runs __init__, so every clone
    # (create_loaders replaces rng per label) gets its OWN lock instead of
    # sharing the template's — cross-loader draws must not serialize
    _lock: threading.Lock = field(
        default_factory=threading.Lock, repr=False, init=False, compare=False
    )

    def sample_params(
        self, shape: Tuple[int, int, int]
    ) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray], bool]:
        cfg, rng = self.cfg, self.rng
        affine = np.eye(3, dtype=np.float32)
        any_transform = False
        if cfg.do_rotation and rng.random() < cfg.p_rotation:
            angles = rng.uniform(-cfg.angle, cfg.angle, 3)
            # device path applies row-vector `rel @ R.T` == column-vector
            # `R @ rel`; the C++ warp is column-vector, so pass R itself
            affine = rotation_matrix_np(angles).astype(np.float32)
            any_transform = True
        if cfg.do_scale and rng.random() < cfg.p_scale:
            affine = affine * np.float32(
                rng.uniform(cfg.scale_range[0], cfg.scale_range[1])
            )
            any_transform = True
        coarse = amp = None
        if cfg.do_elastic and rng.random() < cfg.p_elastic:
            g = cfg.elastic_grid
            coarse = rng.uniform(-1.0, 1.0, (g, g, g, 3)).astype(np.float32)
            mag = rng.uniform(*cfg.deformation_scale)
            amp = (mag * np.asarray(shape, np.float32) / 4.0).astype(np.float32)
            any_transform = True
        return affine, coarse, amp, any_transform

    def __call__(self, scan: np.ndarray, seg: np.ndarray):
        """Maybe-augment one (W, H, D) int16 scan + mask pair in place-ish."""
        with self._lock:
            affine, coarse, amp, any_transform = self.sample_params(scan.shape)
        if not any_transform:
            return scan, seg
        return native.warp_augment_int16(scan, seg, affine, coarse, amp)


@dataclass
class HostAugmenter2D:
    """conf_2D-family per-slice transforms (rotation +-angle p_rotation,
    per-axis mirroring under a p_mirror gate — ``Augment2DConfig`` /
    reference conf_2D.py:30-56) via the native 2D warp. Mirror folds into
    the 2x2 affine (``src = diag(mx, my) @ R @ (dst - c) + c`` — exactly the
    device path's ``(rel @ R.T) * (mx, my)``). Rationale: the on-device 2D
    augmentation measured 484 ms per 512x128^2 batch on the bench v5e (TPUs
    are slow at data-dependent gathers), ~10x the augmentation-free 2D train
    step; the host warp runs in the prefetch workers, fully overlapped."""

    cfg: Augment2DConfig
    rng: np.random.Generator
    # init=False: dataclasses.replace() re-runs __init__, so every clone
    # (create_loaders replaces rng per label) gets its OWN lock instead of
    # sharing the template's — cross-loader draws must not serialize
    _lock: threading.Lock = field(
        default_factory=threading.Lock, repr=False, init=False, compare=False
    )

    def sample_params(self) -> Tuple[np.ndarray, bool]:
        cfg, rng = self.cfg, self.rng
        affine = np.eye(2, dtype=np.float32)
        any_transform = False
        if cfg.do_rotation and rng.random() < cfg.p_rotation:
            a = rng.uniform(-cfg.angle, cfg.angle)
            c, s = np.float32(np.cos(a)), np.float32(np.sin(a))
            affine = np.array([[c, -s], [s, c]], np.float32)
            any_transform = True
        if cfg.do_mirror and rng.random() < cfg.p_mirror:
            mx = np.float32(-1.0 if rng.random() < 0.5 else 1.0)
            my = np.float32(-1.0 if rng.random() < 0.5 else 1.0)
            affine = np.diag([mx, my]).astype(np.float32) @ affine
            any_transform = any_transform or mx < 0 or my < 0
        return affine, any_transform

    def __call__(self, scan: np.ndarray, seg: np.ndarray):
        """Maybe-augment one (W, H) int16 slice + mask pair."""
        with self._lock:
            affine, any_transform = self.sample_params()
        if not any_transform:
            return scan, seg
        return native.warp_augment2d_int16(scan, seg, affine)

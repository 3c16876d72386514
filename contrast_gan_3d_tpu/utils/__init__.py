"""Misc utilities (reference: ``contrast_gan_3D/utils/__init__.py:13-71``)."""

from typing import Sequence, Tuple

import jax
import numpy as np

from contrast_gan_3d_tpu.constants import DEFAULT_SEED


def seed_everything(seed: int = DEFAULT_SEED) -> Tuple[np.random.Generator, jax.Array]:
    """Deterministic seeding: returns a numpy Generator for host-side sampling
    and a jax PRNG key for device-side randomness. JAX keys are deterministic
    by construction — there is no global RNG state to patch."""
    return np.random.default_rng(seed), jax.random.key(seed)


def parse_patch_size(patch_size: Sequence[int], source_shape: Sequence[int]) -> np.ndarray:
    """Resolve -1 entries in a patch size to the corresponding source dim
    (reference semantics: ``utils/__init__.py`` parse_patch_size)."""
    out = np.asarray(patch_size).copy()
    src = np.asarray(source_shape)
    mask = out == -1
    out[mask] = src[: len(out)][mask]
    return out


def swap_last_dim(x: np.ndarray) -> np.ndarray:
    """Move the last axis to the front: (..., C) -> (C, ...)."""
    return np.moveaxis(x, -1, 0)


def downsample(a: np.ndarray, size: int, rng=None) -> np.ndarray:
    """Random subsample WITHOUT replacement (reference ``utils.downsample``:
    ``np.random.choice(a, size, replace=False)`` — used to bound histogram/KDE
    inputs). Pass ``rng`` for a reproducible draw; the default is a fresh
    unseeded Generator (like the reference's unseeded-global-stream calls)."""
    rng = rng or np.random.default_rng()
    return rng.choice(a, size=size, replace=False)


def to_host(tree):
    """Device -> host transfer of an arbitrary pytree (reference ``to_CPU``)."""
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def object_name(o) -> str:
    return getattr(o, "__name__", type(o).__name__)


# reference-familiar alias (utils/__init__.py to_CPU)
to_CPU = to_host

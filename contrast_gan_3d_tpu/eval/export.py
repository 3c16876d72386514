"""AOT serving artifacts for the full-volume corrector (``jax.export``).

TPU-native capability with no reference analogue: the reference re-imports
its model code and re-instantiates the torch generator in every inference
process (``contrast_gan_3D/eval/utils.py:27-39``). Here, the ENTIRE compiled
correction program — patch-grid gather, HU scaling, generator forward,
Gaussian-weighted blending, unscale — is lowered ONCE through ``jax.export``
into a versioned StableHLO artifact. A serving process then ``deserialize``s
and ``.call()``s it with **no model code, no checkpoint, and no re-tracing**;
cross-platform lowering means a CPU build host can emit a TPU artifact.

Artifacts are shape-specialized (one per canonical padded volume shape — the
same reason the serving daemon z-buckets). ``save_exported_corrector`` writes
``<path>`` (the serialized bytes) plus ``<path>.json`` with the input/output
specs so loaders can validate before dispatch.
"""

import json
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

ARTIFACT_SUFFIX = ".jaxcorr"


def export_corrector(
    corrector,
    volume_shape: Sequence[int],
    in_dtype=jnp.int16,
    platforms: Optional[Sequence[str]] = None,
):
    """Lower ``corrector(volume)`` for one fixed ``volume_shape`` (3D
    ``(W, H, D)`` or 2D stacks handled by the corrector's own ``__call__``)
    into a ``jax.export.Exported``. ``platforms`` defaults to the current
    backend; pass e.g. ``("tpu",)`` to cross-lower from a CPU host."""
    spec = jax.ShapeDtypeStruct(tuple(int(s) for s in volume_shape), in_dtype)
    fn = jax.jit(lambda volume: corrector(volume))
    return jax_export.export(fn, platforms=list(platforms) if platforms else None)(
        spec
    )


def save_exported_corrector(
    path,
    corrector,
    volume_shape: Sequence[int],
    in_dtype=jnp.int16,
    platforms: Optional[Sequence[str]] = None,
    extra_meta: Optional[dict] = None,
) -> Path:
    """Export + serialize to ``path`` (suffix ``.jaxcorr`` appended if bare)
    with a ``<path>.json`` sidecar describing the I/O contract."""
    exp = export_corrector(corrector, volume_shape, in_dtype, platforms)
    path = Path(path)
    if path.suffix != ARTIFACT_SUFFIX:
        path = path.with_name(path.name + ARTIFACT_SUFFIX)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(exp.serialize())
    out_aval = jax.tree.leaves(exp.out_avals)[0]
    meta = {
        "volume_shape": [int(s) for s in volume_shape],
        "in_dtype": np.dtype(in_dtype).name,
        "out_shape": [int(s) for s in out_aval.shape],
        "out_dtype": str(out_aval.dtype),
        "platforms": list(exp.platforms),
        "calling_convention_version": exp.calling_convention_version,
    }
    if extra_meta:
        meta.update(extra_meta)
    path.with_suffix(path.suffix + ".json").write_text(
        json.dumps(meta, indent=2) + "\n"
    )
    return path


class ExportedCorrector:
    """A deserialized correction artifact: validates inputs against the
    baked contract, then dispatches the AOT program."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.volume_shape: Tuple[int, ...] = tuple(meta["volume_shape"])
        self.in_dtype = np.dtype(meta["in_dtype"])
        self.platforms = tuple(meta["platforms"])

    def __call__(self, volume) -> jax.Array:
        volume = jnp.asarray(volume)
        if tuple(volume.shape) != self.volume_shape:
            raise ValueError(
                f"artifact was exported for volume shape {self.volume_shape}, "
                f"got {tuple(volume.shape)} — export one artifact per served "
                "(z-bucketed) shape"
            )
        if volume.dtype != self.in_dtype:
            if jnp.issubdtype(self.in_dtype, jnp.integer) and jnp.issubdtype(
                volume.dtype, jnp.floating
            ):
                # round (astype truncates toward 0) AND saturate: an
                # out-of-range float would otherwise WRAP in the integer
                # cast (40000.0 -> ~-25536 HU), silently corrupting voxels
                info = jnp.iinfo(self.in_dtype)
                volume = jnp.clip(jnp.round(volume), info.min, info.max)
            volume = volume.astype(self.in_dtype)
        return self._exported.call(volume)


class ArtifactBundle:
    """A directory of shape-specialized artifacts served as ONE corrector —
    the AOT counterpart of the live corrector's ``z_bucket`` recompile
    bounding: real CCTA cohorts share in-plane 512×512 but vary in z, so a
    bundle carries one artifact per z bucket. ``__call__`` picks the
    artifact matching (W, H) with the smallest exported depth >= the
    volume's, edge-pads z up to it (exactly like
    ``CCTAContrastCorrector.__call__``), corrects, and crops back."""

    def __init__(self, artifacts: Sequence[ExportedCorrector]):
        if not artifacts:
            raise ValueError("empty artifact bundle")
        self.artifacts = sorted(artifacts, key=lambda a: a.volume_shape)

    @classmethod
    def from_dir(cls, path) -> "ArtifactBundle":
        files = sorted(Path(path).glob(f"*{ARTIFACT_SUFFIX}"))
        return cls([load_exported_corrector(f) for f in files])

    def pick(self, shape: Sequence[int]) -> ExportedCorrector:
        w, h, d = shape
        fits = [
            a
            for a in self.artifacts
            if a.volume_shape[:2] == (w, h) and a.volume_shape[2] >= d
        ]
        if not fits:
            raise ValueError(
                f"no artifact serves shape {tuple(shape)}; bundle has "
                f"{[a.volume_shape for a in self.artifacts]} — export one "
                "with scripts/export_corrector.py"
            )
        return min(fits, key=lambda a: a.volume_shape[2])

    def __call__(self, volume) -> jax.Array:
        volume = jnp.asarray(volume)
        if volume.ndim != 3:
            raise ValueError(f"bundle serves (W, H, D) volumes, got {volume.shape}")
        art = self.pick(volume.shape)
        d = volume.shape[2]
        pad = art.volume_shape[2] - d
        if pad:
            volume = jnp.pad(volume, ((0, 0), (0, 0), (0, pad)), mode="edge")
        out = art(volume)
        return out[:, :, :d] if pad else out

    def warmup(self):
        """Run every artifact once (deserialized StableHLO still pays one
        backend compile on first call)."""
        for art in self.artifacts:
            np.asarray(art(np.zeros(art.volume_shape, art.in_dtype)))


def load_exported_corrector(path) -> ExportedCorrector:
    """Load ``save_exported_corrector`` output. Needs only jax — no model
    code, params, or framework config."""
    path = Path(path)
    if not path.exists() and path.suffix != ARTIFACT_SUFFIX:
        path = path.with_name(path.name + ARTIFACT_SUFFIX)
    exported = jax_export.deserialize(path.read_bytes())
    meta_path = path.with_suffix(path.suffix + ".json")
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    else:  # artifact without sidecar: reconstruct the contract from avals
        in_aval = jax.tree.leaves(exported.in_avals)[0]
        meta = {
            "volume_shape": [int(s) for s in in_aval.shape],
            "in_dtype": str(in_aval.dtype),
            "platforms": list(exported.platforms),
        }
    return ExportedCorrector(exported, meta)

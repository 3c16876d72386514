"""Full-volume CCTA contrast corrector (inference entry point).

Capability parity with reference ``contrast_gan_3D/eval/CCTAContrastCorrector.py``:
load a trained generator from a checkpoint, correct whole 512x512xZ volumes
and write them back as .mhd/.nii.gz. TPU-native re-design: the sliding-window
tiling + aggregation that the reference delegates to patchly + a torch
DataLoader worker pool is one jitted XLA program
(``ops/sliding_window.make_volume_corrector``) with Gaussian blending; the 2D
model variant batches axial slices through a single jitted apply instead of a
per-slice python loop (reference :83-99).
"""

import threading
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler, Scaler
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.ops.sliding_window import make_volume_corrector
from contrast_gan_3d_tpu.utils import io_utils
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


class CCTAContrastCorrector:
    """Correct the contrast of whole CCTA volumes with a trained generator.

    3D: jitted sliding window over ``inference_patch_size`` patches with
    Gaussian-weighted attenuation blending. 2D: batched axial slices.
    """

    def __init__(
        self,
        generator: nn.Module,
        generator_params,
        generator_stats=None,
        inference_patch_size: Tuple[int, ...] = (128, 128, 128),
        overlap: float = 0.5,
        # None -> 24 for the packed sliding window (fastest of {4..32},
        # fits HBM — PERF.md), 8 for the direct fallback (16+ OOMs there)
        batch_size: int | None = None,
        scaler: Scaler = FactorZeroCenterScaler(),
        dtype=jnp.float32,
        layout: str = "auto",
        z_bucket: int = 0,
    ):
        self.generator = generator
        self.scaler = scaler
        self.is_2d = len(inference_patch_size) == 2
        # jitted correction retraces per distinct volume shape (slow first
        # hits for a warm daemon / mixed cohorts): z_bucket > 0 edge-pads the
        # z extent up to the next multiple before correcting and crops back,
        # bounding the number of compiled programs. Off by default: the
        # padded extent changes the z patch grid, i.e. the Gaussian blend
        # weights — irrelevant for trained (smooth) attenuation fields (same
        # argument as the 25-vs-50%-overlap study, PERF.md) but not
        # bit-identical to the unpadded grid.
        self.z_bucket = int(z_bucket)
        # distinct (W, H, z_eff) shapes dispatched so far == compiled
        # program count (the jitted window retraces per shape); read by
        # serving /stats from other threads — guard with the lock
        self.dispatched_shapes: set = set()
        self._shapes_lock = threading.Lock()

        variables = {"params": generator_params}
        if generator_stats:
            variables["batch_stats"] = generator_stats

        def apply_fn(x):
            return generator.apply(variables, x, train=False)

        # the params-baked apply — reusable by the sharded corrector
        self.apply_fn = apply_fn
        self.inference_patch_size = tuple(inference_patch_size)
        self.overlap = overlap

        # layout="auto": run the sliding window in block space (ops/packed —
        # 0.616 s @ 25% / 1.540 s @ 50% overlap per 512x512x400 volume vs
        # 1.82 / 5.11 s direct) whenever the generator supports it; "direct"
        # forces the reference-shaped path. Numerics are identical
        # (tests/test_packed.py).
        if not self.is_2d and isinstance(generator, ResnetGenerator) and (
            generator.packed_input or generator.packed_output
        ):
            raise ValueError(
                "pass the plain full-resolution generator module — the "
                "corrector adds packed_input/packed_output itself"
            )
        stride_ok = all(
            int(round(p * (1.0 - overlap))) >= 4 for p in inference_patch_size
        )
        packed = (
            layout in ("auto", "packed")
            and not self.is_2d
            and isinstance(generator, ResnetGenerator)
            and generator.layout in ("direct", "packed")
            and generator.norm == "batch"
            and generator.ndim == 3
            and generator.n_updownsample_blocks >= 1
            and stride_ok
            and all(
                p % max(4, 2**generator.n_updownsample_blocks) == 0
                # the packed reflect pad builds from (L+1)-block slabs
                and p >= 8
                for p in inference_patch_size
            )
        )
        if layout == "packed" and not packed:
            raise ValueError("layout='packed' unsupported for this generator/patch")
        # 2D: the slice-batched forward only saturates the chip from ~128
        # slices per dispatch (512^2 x 400 sweep: 0.82 s @ 8 -> 0.185 s @ 128,
        # flat beyond — PERF.md); _correct_2d caps the effective batch at the
        # padded slice count so short volumes don't pay 128x padding. The
        # saturation default is accelerator-only: on the CPU backend a
        # 128-slice 512^2 dispatch holds ~16x the activations of the old
        # batch 8 for no latency benefit.
        if batch_size is not None:
            self.batch_size = batch_size
        elif self.is_2d:
            self.batch_size = 128 if jax.default_backend() != "cpu" else 8
        else:
            self.batch_size = 24 if packed else 8
        batch_size = self.batch_size
        # kept for shard_over (mesh re-targeting preserves the layout choice)
        self._packed = packed
        self._dtype = dtype

        self._apply_packed = None
        if self.is_2d:
            self._apply_2d = jax.jit(apply_fn)
            # whole-volume 2D correction as ONE compiled program per volume
            # shape, like the 3D sliding window (scale + slice batching +
            # scan + unscale fuse; eager ran ~10 separate dispatches and
            # re-cast the volume per op)
            self._correct_2d = jax.jit(self._correct_2d)
        elif packed:
            # (the XLA f2->f4 projection is the measured-fastest end-to-end
            # path — the Pallas projection variant lost the A/B at batch 8
            # AND batch 24 and was removed; PERF.md "Pallas findings")
            gen_p = generator.clone(
                layout="packed", packed_input=True, packed_output=True
            )
            # kept for shard_over: the mesh corrector reuses the same
            # packed apply so both paths stay numerically in lockstep
            self._apply_packed = lambda x: gen_p.apply(variables, x, train=False)
            self.correct_volume = make_volume_corrector(
                self._apply_packed,
                patch_size=tuple(inference_patch_size),
                overlap=overlap,
                batch_size=batch_size,
                scaler=scaler,
                dtype=dtype,
                packed_io=True,
            )
        else:
            self.correct_volume = make_volume_corrector(
                apply_fn,
                patch_size=tuple(inference_patch_size),
                overlap=overlap,
                batch_size=batch_size,
                scaler=scaler,
                dtype=dtype,
            )

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir,
        generator: Optional[nn.Module] = None,
        iteration: Optional[int] = None,
        **kwargs,
    ) -> "CCTAContrastCorrector":
        """Build from a saved training checkpoint (reference :55-56 loads only
        ``ckpt["generator"]`` — here the generator params + BatchNorm stats).

        With no explicit ``generator`` module the architecture is derived
        from the checkpoint's parameter tree (block counts, stem width, ndim)
        and non-derivable semantics (``tconv_placement``, ``norm``) come from
        the checkpoint's ``<step>.meta.json`` sidecar — so non-default
        architectures and torch-imported checkpoints load correctly without
        the caller reciting construction flags."""
        from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib

        payload = ckpt_lib.load_generator(checkpoint_dir, iteration=iteration)
        if generator is None:
            from contrast_gan_3d_tpu.models.utils import derive_generator_arch

            gen_kwargs = derive_generator_arch(payload["params"])
            gen_kwargs.update(payload.get("meta", {}).get("generator", {}))
            generator = ResnetGenerator(**gen_kwargs)
            logger.info("Auto-derived generator architecture: %s", gen_kwargs)
        logger.info(
            "Loaded generator from '%s' @ iteration %s", checkpoint_dir, payload["step"]
        )
        return cls(generator, payload["params"], payload.get("stats"), **kwargs)

    @classmethod
    def from_reference_checkpoint(
        cls,
        pt_path,
        n_resnet_blocks: Optional[int] = None,
        n_updownsample_blocks: Optional[int] = None,
        init_channels_out: Optional[int] = None,
        ndim: Optional[int] = None,
        dtype=jnp.float32,
        **kwargs,
    ) -> "CCTAContrastCorrector":
        """Build directly from a REFERENCE ``<iteration>.pt`` torch
        checkpoint (reference trainer/Trainer.py:321-327 format): users of
        the reference can correct volumes with their existing checkpoints.
        Architecture hyper-parameters default to what the saved state_dict
        contains (explicit values that disagree raise — never a silent
        truncation). The generator is constructed with
        ``tconv_placement='torch'`` so the ported weights reproduce the
        torch model exactly (utils/torch_port)."""
        from contrast_gan_3d_tpu.utils.torch_port import load_reference_checkpoint

        payload = load_reference_checkpoint(
            pt_path, n_resnet_blocks, n_updownsample_blocks
        )
        arch = payload["generator_arch"]
        for name, given in (("init_channels_out", init_channels_out), ("ndim", ndim)):
            if given is not None and given != arch[name]:
                raise ValueError(
                    f"{name}={given} does not match the checkpoint "
                    f"(found {arch[name]})"
                )
        generator = ResnetGenerator(
            n_resnet_blocks=arch["n_resnet_blocks"],
            n_updownsample_blocks=arch["n_updownsample_blocks"],
            init_channels_out=arch["init_channels_out"],
            ndim=arch["ndim"],
            tconv_placement="torch",
            dtype=dtype,
        )
        variables = payload["generator"]
        logger.info(
            "Ported reference checkpoint '%s' @ iteration %d",
            pt_path, payload["iteration"],
        )
        return cls(
            generator,
            variables["params"],
            variables.get("batch_stats"),
            dtype=dtype,
            **kwargs,
        )

    # ------------------------------------------------------------------
    def _correct_2d(self, volume: jax.Array) -> jax.Array:
        """Axial-slice batched 2D correction: (W, H, D) -> (W, H, D)."""
        W, H, D = volume.shape
        vol = self.scaler(volume.astype(jnp.float32))
        slices = jnp.moveaxis(vol, -1, 0)[..., None]  # (D, W, H, 1)
        # a volume shorter than the configured batch runs as ONE full-volume
        # dispatch (padded to a multiple of 8) instead of padding up to the
        # saturation batch
        bs = min(self.batch_size, -(-D // 8) * 8)
        pad = (-D) % bs
        if pad:
            slices = jnp.concatenate([slices, jnp.zeros((pad, W, H, 1), slices.dtype)])

        def body(_, batch):
            atten = self._apply_2d(batch)
            return None, batch - atten

        _, out = jax.lax.scan(body, None, slices.reshape(-1, bs, W, H, 1))
        out = out.reshape(-1, W, H)[:D]
        return self.scaler.unscale(jnp.moveaxis(out, 0, -1))

    def __call__(self, volume) -> jax.Array:
        """Correct one (W, H, D) HU volume (int16/float); float32 HU out."""
        volume = jnp.asarray(volume)
        # z_bucket applies to BOTH families (a warm daemon on a mixed-z
        # cohort otherwise recompiles per distinct extent). For 2D it is
        # exactly output-preserving: padded slices are corrected
        # independently and cropped away (in 3D it changes the blend grid —
        # see the constructor note). ``pad`` is the single source of truth
        # for both the dispatch-shape record and the actual padding.
        d = volume.shape[2]
        pad = (
            self.z_bucket - d % self.z_bucket
            if self.z_bucket > 0 and d % self.z_bucket else 0
        )
        if pad:
            padded = jnp.pad(volume, ((0, 0), (0, 0), (0, pad)), mode="edge")
            corrected = (
                self._correct_2d(padded) if self.is_2d
                else self.correct_volume(padded)
            )
            corrected = corrected[:, :, :d]
        elif self.is_2d:
            corrected = self._correct_2d(volume)
        else:
            corrected = self.correct_volume(volume)
        # one XLA program per distinct dispatched (post-bucketing) shape:
        # recorded AFTER the dispatch returns, so a shape whose dispatch
        # fails (e.g. OOM on an oversized volume) never inflates the
        # compiled-program count serving /stats reports (daemons/tests
        # observe compile growth on mixed cohorts; /stats reads this from
        # another thread — mutate only under the lock)
        with self._shapes_lock:
            self.dispatched_shapes.add(
                (volume.shape[0], volume.shape[1], d + pad)
            )
        return corrected

    # ------------------------------------------------------------------
    def shard_over(self, mesh, axis: Optional[str] = None) -> "CCTAContrastCorrector":
        """Re-target this corrector to a multi-chip mesh: the patch grid of
        every volume is split across ``mesh`` (``parallel/inference``, the
        TPU-native analogue of the reference's ``mp.Pool`` fan-out) while the
        layout choice carries over — a packed corrector runs the packed
        psum_scatter slab path. Returns ``self`` for chaining."""
        if self.is_2d:
            raise ValueError("shard_over applies to the 3D sliding window only")
        from contrast_gan_3d_tpu.parallel.inference import (
            make_sharded_volume_corrector,
        )
        from contrast_gan_3d_tpu.parallel.mesh import DATA_AXIS

        self.correct_volume = make_sharded_volume_corrector(
            self._apply_packed if self._packed else self.apply_fn,
            mesh,
            patch_size=self.inference_patch_size,
            overlap=self.overlap,
            batch_size=self.batch_size,
            scaler=self.scaler,
            dtype=self._dtype,
            axis=axis or DATA_AXIS,
            packed_io=self._packed,
        )
        return self

    # ------------------------------------------------------------------
    def correct_file(self, scan_path, out_path=None, meta=None) -> np.ndarray:
        """Load a scan file, correct it, optionally save (reference :101-116:
        unscale, cast int16, WHD->DHW transpose, write)."""
        volume, file_meta = io_utils.load_scan(scan_path)
        corrected = np.asarray(self(volume))
        if out_path is not None:
            self.save(corrected, out_path, meta or file_meta)
        return corrected

    @staticmethod
    def save(corrected: np.ndarray, out_path, meta: dict):
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        corrected = np.asarray(corrected)
        if corrected.dtype == np.int16:
            # already converted (eval.utils.device_int16 fetch) — the
            # round/clip below would be a no-op at the cost of 2-3
            # full-volume copies on the streaming writer thread
            vol = corrected
        else:
            vol = np.clip(
                np.round(corrected), np.iinfo(np.int16).min,
                np.iinfo(np.int16).max,
            ).astype(np.int16)
        io_utils.save_scan(
            vol, meta.get("offset"), meta.get("spacing"), out_path,
            direction=meta.get("direction"),
        )
        logger.info("Saved corrected scan to '%s'", str(out_path))

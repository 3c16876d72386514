"""Pluggable experiment logging (strategy pattern).

Capability parity with reference ``trainer/logger/``: a ``LoggerInterface``
with scalar + image logging hooks; a threaded wrapper that moves rendering /
uploading off the training path (reference ``MultiThreadedLogger``,
LoggerInterface.py:64-107 — one named daemon thread per image-log event,
joined at ``end_hook``); a wandb backend (``WandbLogger.py``) gated on the
wandb package; a dependency-free ``FileLogger`` (JSONL scalars + PNG image
grids — for TPU pods without external network access); and console / no-op
fallbacks. Image logs render a random sample's axial slices with HU
colorbars, centerline overlays and an RdBu attenuation grid via
``utils.visualization``.
"""

import json
import threading
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from contrast_gan_3d_tpu.data.scaler import Scaler
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)

try:  # optional dependency
    import wandb  # type: ignore

    HAS_WANDB = True
except Exception:  # pragma: no cover - environment without wandb
    wandb = None
    HAS_WANDB = False


class LoggerInterface:
    """Base logger: scalars go out immediately, images may render off-path."""

    # consumers (Trainer) check this BEFORE computing/fetching image batches:
    # a logger that drops images should not cost a preview dispatch + D2H
    logs_images: bool = True

    def log_scalars(self, scalars: Dict[str, float], step: int, stage: str = "train"):
        raise NotImplementedError

    def log_images(
        self,
        sample: np.ndarray,
        reconstruction: Optional[np.ndarray],
        attenuation: Optional[np.ndarray],
        masks: Optional[np.ndarray],
        names: Optional[List[str]],
        step: int,
        stage: str = "train",
    ):
        raise NotImplementedError

    def end_hook(self):
        """Flush/join any pending asynchronous work."""


class NoopLogger(LoggerInterface):
    logs_images = False

    def log_scalars(self, scalars, step, stage="train"):
        pass

    def log_images(self, *args, **kwargs):
        pass


class ConsoleLogger(LoggerInterface):
    """Scalar-only logging to the module logger (images are skipped)."""

    logs_images = False

    def log_scalars(self, scalars, step, stage="train"):
        msg = " ".join(f"{k}={float(v):.4f}" for k, v in scalars.items())
        logger.info("[%s %d] %s", stage, step, msg)

    def log_images(self, *args, **kwargs):
        pass


def _render_sample_figs(
    scaler, sample, reconstruction, attenuation, masks, names, step, stage,
    max_slices, rng,
):
    """Yield (tag, matplotlib figure) for ONE random sample's axial-slice
    grids (reference WandbLogger.py:52-132 rendering). Caller closes figs."""
    from contrast_gan_3d_tpu.utils import visualization as viz

    idx = int(rng.integers(0, len(sample)))
    # names can be shorter than the batch (a loader without "name"s)
    name = names[idx] if names and idx < len(names) else str(idx)
    mask = np.asarray(masks[idx]).squeeze() if masks is not None else None
    trios = [("sample", sample), ("reconstruction", reconstruction), ("attenuation", attenuation)]
    for tag, batch in trios:
        if batch is None:
            continue
        vol = np.asarray(batch[idx]).squeeze()
        is_atten = tag == "attenuation"
        img = vol if is_atten else np.asarray(scaler.unscale(vol))
        fig = viz.plot_axial_slices(
            img,
            mask=None if is_atten else mask,
            cmap="RdBu" if is_atten else "gray",
            max_slices=max_slices,
            title=f"{stage}/{tag} {name} @ {step}",
        )
        yield tag, fig


def _render_batch_figs(scaler, sample, reconstruction, attenuation, step, stage, max_slices, rng):
    """2D variant (reference ``WandbLogger2D``, WandbLogger.py:150-156): the
    batch axis IS the slice axis, so render the batch as one grid."""
    from contrast_gan_3d_tpu.utils import visualization as viz

    for tag, batch in [
        ("sample", sample), ("reconstruction", reconstruction),
        ("attenuation", attenuation),
    ]:
        if batch is None:
            continue
        imgs = np.asarray(batch)  # (B, W, H[, 1]) -> axial stack
        if imgs.ndim == 4:
            imgs = imgs[..., 0]
        # NOT a bare squeeze(): a B=1 batch would lose its batch axis and
        # moveaxis would then TRANSPOSE the lone slice instead of stacking
        is_atten = tag == "attenuation"
        vol = np.moveaxis(imgs, 0, -1)
        img = vol if is_atten else np.asarray(scaler.unscale(vol))
        fig = viz.plot_axial_slices(
            img,
            cmap="RdBu" if is_atten else "gray",
            max_slices=max_slices,
            title=f"{stage}/{tag} @ {step}",
            rng=rng,
        )
        yield tag, fig


class WandbLogger(LoggerInterface):
    """wandb scalars with an explicit step metric + axial-slice image grids
    (reference ``WandbLogger.py:38-132``)."""

    def __init__(
        self,
        scaler: Scaler,
        run=None,
        max_slices: int = 64,
        rng: Optional[np.random.Generator] = None,
    ):
        if not HAS_WANDB:
            raise ImportError("wandb is not installed; use ConsoleLogger/NoopLogger")
        self.scaler = scaler
        # an explicit run wins; otherwise the ACTIVE global run is resolved
        # lazily per log call (construction may precede wandb.init)
        self._run = run
        self.max_slices = max_slices
        self.rng = rng or np.random.default_rng()
        self._metrics_defined = False
        self._warned_no_run = False
        if self.run is not None:
            self._define_metrics()

    @property
    def run(self):
        return self._run if self._run is not None else wandb.run

    def _define_metrics(self):
        # custom step metric so resumed runs keep a monotonic x-axis
        self.run.define_metric("iteration")
        self.run.define_metric("*", step_metric="iteration")
        self._metrics_defined = True

    def _resolve_run(self):
        """The run to log into, or None (+ one warning) when wandb.init
        failed/never ran — a dead experiment tracker must not kill the
        training run at the first log point."""
        run = self.run
        if run is None:
            if not self._warned_no_run:
                self._warned_no_run = True
                logger.warning(
                    "WandbLogger has no active run (wandb.init failed or was "
                    "never called) — dropping metrics"
                )
            return None
        if not self._metrics_defined:
            self._define_metrics()
        return run

    def log_scalars(self, scalars, step, stage="train"):
        run = self._resolve_run()
        if run is None:
            return
        run.log({f"{stage}/{k}": float(v) for k, v in scalars.items()} | {"iteration": step})

    def log_images(
        self, sample, reconstruction, attenuation, masks, names, step, stage="train"
    ):
        from contrast_gan_3d_tpu.utils import visualization as viz

        run = self._resolve_run()
        if run is None:
            return
        payload = {"iteration": step}
        for tag, fig in _render_sample_figs(
            self.scaler, sample, reconstruction, attenuation, masks, names,
            step, stage, self.max_slices, self.rng,
        ):
            payload[f"{stage}/{tag}"] = wandb.Image(fig)
            viz.close(fig)
        run.log(payload)


class WandbLogger2D(WandbLogger):
    """2D variant (reference ``WandbLogger2D``, WandbLogger.py:150-156): the
    batch axis IS the slice axis, so render the batch as one grid."""

    def log_images(
        self, sample, reconstruction, attenuation, masks, names, step, stage="train"
    ):
        from contrast_gan_3d_tpu.utils import visualization as viz

        run = self._resolve_run()
        if run is None:
            return
        payload = {"iteration": step}
        for tag, fig in _render_batch_figs(
            self.scaler, sample, reconstruction, attenuation, step, stage,
            self.max_slices, self.rng,
        ):
            payload[f"{stage}/{tag}"] = wandb.Image(fig)
            viz.close(fig)
        run.log(payload)


class FileLogger(LoggerInterface):
    """Dependency-free on-disk experiment logging: scalars append to
    ``<out_dir>/scalars.jsonl`` (one JSON object per log call — stage,
    iteration, values) and image grids save as PNGs under
    ``<out_dir>/images/``. The offline counterpart of :class:`WandbLogger`
    for TPU-pod / air-gapped runs where the wandb service is unreachable
    (reference capability: trainer/logger/WandbLogger.py; same rendered
    figures, local sink)."""

    def __init__(
        self,
        scaler: Scaler,
        out_dir,
        max_slices: int = 64,
        rng: Optional[np.random.Generator] = None,
        save_images: bool = True,
    ):
        self.scaler = scaler
        self.out_dir = Path(out_dir)
        self.max_slices = max_slices
        self.rng = rng or np.random.default_rng()
        self.save_images = save_images
        # tell consumers (Trainer._can_log_images) not to pay the preview
        # dispatch + D2H for images this logger would drop anyway
        self.logs_images = save_images
        self.out_dir.mkdir(parents=True, exist_ok=True)
        # append mode: a resumed run continues the same scalar stream
        self._scalar_path = self.out_dir / "scalars.jsonl"
        self._lock = threading.Lock()  # image threads may interleave

    def log_scalars(self, scalars, step, stage="train"):
        rec = {"stage": stage, "iteration": int(step)}
        # NaN/Infinity are not valid JSON tokens — a diverged loss must not
        # make the whole JSONL line unparseable for strict consumers (jq,
        # pandas.read_json); encode non-finite values as null
        rec.update({
            k: (v if np.isfinite(v) else None)
            for k, v in ((k, float(v)) for k, v in scalars.items())
        })
        line = json.dumps(rec, allow_nan=False) + "\n"
        with self._lock, open(self._scalar_path, "a") as fh:
            fh.write(line)

    def _figs(self, sample, reconstruction, attenuation, masks, names, step, stage):
        return _render_sample_figs(
            self.scaler, sample, reconstruction, attenuation, masks, names,
            step, stage, self.max_slices, self.rng,
        )

    def log_images(
        self, sample, reconstruction, attenuation, masks, names, step, stage="train"
    ):
        if not self.save_images:
            return
        from contrast_gan_3d_tpu.utils import visualization as viz

        img_dir = self.out_dir / "images"
        img_dir.mkdir(parents=True, exist_ok=True)
        for tag, fig in self._figs(
            sample, reconstruction, attenuation, masks, names, step, stage
        ):
            fig.savefig(img_dir / f"{stage}_{tag}_{int(step):08d}.png", dpi=100)
            viz.close(fig)


class FileLogger2D(FileLogger):
    """2D variant: the batch renders as one slice grid (cf. WandbLogger2D)."""

    def _figs(self, sample, reconstruction, attenuation, masks, names, step, stage):
        return _render_batch_figs(
            self.scaler, sample, reconstruction, attenuation, step, stage,
            self.max_slices, self.rng,
        )


class TensorBoardLogger(LoggerInterface):
    """TensorBoard experiment logging via ``tensorboardX.SummaryWriter``:
    scalars as ``<stage>/<key>`` curves, the axial-slice figure grids as
    image summaries. The LIVE-backend counterpart of :class:`WandbLogger`
    (reference capability: trainer/logger/WandbLogger.py:38-132) for
    environments without the wandb service — TPU pods universally have
    TensorBoard (the XProf traces from --profiler-dir land in the same
    logdir, so curves and profiles share one UI)."""

    _SEQ = 0  # per-process writer counter (see filename_suffix below)

    def __init__(
        self,
        scaler: Scaler,
        out_dir,
        max_slices: int = 64,
        rng: Optional[np.random.Generator] = None,
    ):
        import os

        from tensorboardX import SummaryWriter  # baked into the image

        self.scaler = scaler
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        # a resumed run APPENDS a new event file in the same dir — readers
        # merge them on the shared step axis, keeping the x-axis monotonic.
        # filename_suffix makes the file unique per writer INSTANCE:
        # tensorboardX names files by second-resolution timestamp + hostname
        # only, so two writers in the same dir within one second (fast
        # restart, tests) silently OVERWRITE each other without it.
        TensorBoardLogger._SEQ += 1
        self.writer = SummaryWriter(
            logdir=str(self.out_dir),
            filename_suffix=f".{os.getpid()}.{TensorBoardLogger._SEQ}",
        )
        self.max_slices = max_slices
        self.rng = rng or np.random.default_rng()
        self._lock = threading.Lock()  # image threads may interleave

    def log_scalars(self, scalars, step, stage="train"):
        with self._lock:
            for k, v in scalars.items():
                self.writer.add_scalar(f"{stage}/{k}", float(v), int(step))
            self.writer.flush()

    def _figs(self, sample, reconstruction, attenuation, masks, names, step, stage):
        return _render_sample_figs(
            self.scaler, sample, reconstruction, attenuation, masks, names,
            step, stage, self.max_slices, self.rng,
        )

    def log_images(
        self, sample, reconstruction, attenuation, masks, names, step, stage="train"
    ):
        from contrast_gan_3d_tpu.utils import visualization as viz

        for tag, fig in self._figs(
            sample, reconstruction, attenuation, masks, names, step, stage
        ):
            with self._lock:
                self.writer.add_figure(f"{stage}/{tag}", fig, int(step), close=False)
            viz.close(fig)
        with self._lock:
            self.writer.flush()

    def end_hook(self):
        with self._lock:
            self.writer.close()


class TensorBoardLogger2D(TensorBoardLogger):
    """2D variant: the batch renders as one slice grid (cf. WandbLogger2D)."""

    def _figs(self, sample, reconstruction, attenuation, masks, names, step, stage):
        return _render_batch_figs(
            self.scaler, sample, reconstruction, attenuation, step, stage,
            self.max_slices, self.rng,
        )


class MultiThreadedLogger(LoggerInterface):
    """Wrap a logger; image logging (host fetch + matplotlib render + upload)
    runs on a named daemon thread per event, joined at ``end_hook``."""

    def __init__(self, inner: LoggerInterface):
        self.inner = inner
        self._threads: List[threading.Thread] = []
        # ONE rendering thread at a time: pyplot's figure manager (and the
        # logger's shared np rng) are not thread-safe — a train-image and a
        # validation-image event landing on the same iteration would
        # otherwise render concurrently (still off the training path)
        self._render_lock = threading.Lock()

    @property
    def logs_images(self) -> bool:
        return self.inner.logs_images

    def log_scalars(self, scalars, step, stage="train"):
        self.inner.log_scalars(scalars, step, stage)

    def log_images(self, sample, reconstruction, attenuation, masks, names, step, stage="train"):
        args = tuple(
            np.asarray(a) if a is not None and not isinstance(a, (list, type(None))) else a
            for a in (sample, reconstruction, attenuation, masks)
        )

        def _render():
            with self._render_lock:
                self.inner.log_images(*args, names, step, stage)

        t = threading.Thread(
            target=_render,
            name=f"log-images-{stage}-{step}",
            daemon=True,
        )
        t.start()
        # prune finished threads: end_hook only runs once per fit, so a long
        # run would otherwise accumulate thousands of dead Thread objects
        self._threads = [x for x in self._threads if x.is_alive()]
        self._threads.append(t)

    def end_hook(self):
        for t in self._threads:
            t.join(timeout=60)
        self._threads = []
        self.inner.end_hook()

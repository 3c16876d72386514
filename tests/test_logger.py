"""Experiment-logging strategies (reference capability: trainer/logger/).

Covers the dependency-free :class:`FileLogger` (JSONL scalars + PNG image
grids — the offline counterpart of the reference's WandbLogger), its 2D
variant, the threaded wrapper, and the builder wiring for
``logger="file"``.
"""

import json

import numpy as np

from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler
from contrast_gan_3d_tpu.trainer.logger import (
    FileLogger,
    FileLogger2D,
    MultiThreadedLogger,
)


def test_file_logger_scalars_jsonl(tmp_path):
    lg = FileLogger(FactorZeroCenterScaler(), tmp_path / "m")
    lg.log_scalars({"D": -0.5, "G": np.float32(1.25)}, step=10)
    lg.log_scalars({"sim": -0.9}, step=20, stage="validation")
    lines = [
        json.loads(l)
        for l in (tmp_path / "m" / "scalars.jsonl").read_text().splitlines()
    ]
    assert lines == [
        {"stage": "train", "iteration": 10, "D": -0.5, "G": 1.25},
        {"stage": "validation", "iteration": 20, "sim": -0.9},
    ]


def test_file_logger_nonfinite_scalars_stay_parseable(tmp_path):
    """A diverged loss (NaN/inf) must not poison the JSONL stream — NaN is
    not a valid JSON token, so non-finite values encode as null."""
    lg = FileLogger(FactorZeroCenterScaler(), tmp_path / "m")
    lg.log_scalars({"D": float("nan"), "G": float("inf"), "sim": 0.5}, step=3)
    [line] = (tmp_path / "m" / "scalars.jsonl").read_text().splitlines()
    assert json.loads(line) == {
        "stage": "train", "iteration": 3, "D": None, "G": None, "sim": 0.5,
    }


def test_file_logger_appends_across_instances(tmp_path):
    """A resumed run (fresh logger, same dir) continues the scalar stream."""
    out = tmp_path / "m"
    FileLogger(FactorZeroCenterScaler(), out).log_scalars({"D": 1.0}, 1)
    FileLogger(FactorZeroCenterScaler(), out).log_scalars({"D": 2.0}, 2)
    lines = (out / "scalars.jsonl").read_text().splitlines()
    assert len(lines) == 2


def test_file_logger_images(tmp_path, rng):
    lg = FileLogger(FactorZeroCenterScaler(), tmp_path / "m", max_slices=4, rng=rng)
    sample = rng.normal(0, 0.3, (2, 8, 8, 6)).astype(np.float32)
    mask = (rng.random((2, 8, 8, 6)) < 0.05).astype(np.float32)
    lg.log_images(sample, sample, sample, mask, ["a", "b"], step=42)
    pngs = sorted(p.name for p in (tmp_path / "m" / "images").glob("*.png"))
    assert pngs == [
        "train_attenuation_00000042.png",
        "train_reconstruction_00000042.png",
        "train_sample_00000042.png",
    ]


def test_file_logger_2d_images(tmp_path, rng):
    lg = FileLogger2D(FactorZeroCenterScaler(), tmp_path / "m", max_slices=4, rng=rng)
    batch = rng.normal(0, 0.3, (5, 8, 8)).astype(np.float32)  # (B, W, H)
    lg.log_images(batch, batch, None, None, None, step=7, stage="validation")
    pngs = sorted(p.name for p in (tmp_path / "m" / "images").glob("*.png"))
    assert pngs == [
        "validation_reconstruction_00000007.png",
        "validation_sample_00000007.png",
    ]


def test_multithreaded_file_logger_end_hook(tmp_path, rng):
    lg = MultiThreadedLogger(
        FileLogger(FactorZeroCenterScaler(), tmp_path / "m", max_slices=2, rng=rng)
    )
    sample = rng.normal(0, 0.3, (1, 8, 8, 4)).astype(np.float32)
    lg.log_images(sample, None, None, None, None, step=1)
    lg.log_scalars({"D": 0.0}, 1)
    lg.end_hook()  # joins the render thread
    assert (tmp_path / "m" / "images" / "train_sample_00000001.png").exists()
    assert (tmp_path / "m" / "scalars.jsonl").exists()


def test_builder_wires_file_logger(tmp_path):
    from contrast_gan_3d_tpu.experiments import ExperimentConfig
    from contrast_gan_3d_tpu.experiments.builder import build

    cfg = ExperimentConfig(logger="file")
    built = build(cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    assert isinstance(built.logger_interface, MultiThreadedLogger)
    inner = built.logger_interface.inner
    assert type(inner) is FileLogger
    assert inner.out_dir == tmp_path / "ckpt" / "metrics"

    cfg2d = ExperimentConfig(name="conf_2d", logger="file", is_2d=True)
    built2d = build(cfg2d, checkpoint_dir=str(tmp_path / "ckpt2"))
    assert type(built2d.logger_interface.inner) is FileLogger2D


def test_file_logger_save_images_false_disables_gate(tmp_path):
    """save_images=False must also flip logs_images so the Trainer skips the
    preview dispatch + D2H entirely (the gate exists for exactly this)."""
    log = FileLogger(FactorZeroCenterScaler(), tmp_path, save_images=False)
    assert log.logs_images is False
    assert MultiThreadedLogger(log).logs_images is False
    assert FileLogger(FactorZeroCenterScaler(), tmp_path).logs_images is True


def test_2d_batch_of_one_keeps_orientation(tmp_path, rng):
    """B=1 2D image logs must not transpose the lone slice (a bare squeeze()
    used to drop the batch axis before the slice-stack moveaxis)."""
    log = FileLogger2D(FactorZeroCenterScaler(), tmp_path, rng=np.random.default_rng(0))
    sample = rng.normal(size=(1, 8, 12, 1)).astype(np.float32)  # W != H
    log.log_images(sample, None, None, None, None, step=1)
    assert (tmp_path / "images" / "train_sample_00000001.png").exists()


def test_wandb_logger_survives_missing_run(monkeypatch):
    """wandb.init failing (train.py logs and continues) must not crash the
    run at the first log point: with no active run the logger warns once and
    drops; an explicit run routes logs to THAT run, not the global one."""
    import types

    import contrast_gan_3d_tpu.trainer.logger as logger_mod
    from contrast_gan_3d_tpu.trainer.logger import WandbLogger

    fake_wandb = types.SimpleNamespace(run=None, Image=lambda fig: fig)
    monkeypatch.setattr(logger_mod, "wandb", fake_wandb)
    monkeypatch.setattr(logger_mod, "HAS_WANDB", True)

    log = WandbLogger(FactorZeroCenterScaler())
    log.log_scalars({"D": 1.0}, 1)  # no run: dropped, no raise
    log.log_scalars({"D": 2.0}, 2)

    class FakeRun:
        def __init__(self):
            self.logged, self.metrics = [], []

        def define_metric(self, *a, **k):
            self.metrics.append((a, k))

        def log(self, payload):
            self.logged.append(payload)

    mine = FakeRun()
    log2 = WandbLogger(FactorZeroCenterScaler(), run=mine)
    fake_wandb.run = FakeRun()  # a DIFFERENT global run must not be used
    log2.log_scalars({"D": 3.0}, 5)
    assert mine.logged and mine.logged[0]["iteration"] == 5
    assert not fake_wandb.run.logged
    assert mine.metrics  # step metric defined against the explicit run


def _tb_acc(path):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(path), size_guidance={"scalars": 0, "images": 0})
    acc.Reload()
    return acc


def test_tensorboard_logger_scalars_and_images(tmp_path, rng):
    """Live TensorBoard backend (tensorboardX): real event files a
    TensorBoard UI loads — scalars as <stage>/<key> curves, the axial-slice
    grids as image summaries (reference capability:
    trainer/logger/WandbLogger.py:38-132, local live backend)."""
    from contrast_gan_3d_tpu.trainer.logger import TensorBoardLogger

    lg = TensorBoardLogger(
        FactorZeroCenterScaler(), tmp_path / "tb", max_slices=4, rng=rng
    )
    lg.log_scalars({"D": -0.5, "G": np.float32(1.25)}, step=10)
    lg.log_scalars({"D": -0.25}, step=20)
    lg.log_scalars({"sim": -0.9}, step=20, stage="validation")
    sample = rng.normal(0, 0.3, (2, 8, 8, 6)).astype(np.float32)
    mask = (rng.random((2, 8, 8, 6)) < 0.05).astype(np.float32)
    lg.log_images(sample, sample, sample, mask, ["a", "b"], step=42)
    lg.end_hook()

    acc = _tb_acc(tmp_path / "tb")
    tags = acc.Tags()
    assert {"train/D", "train/G", "validation/sim"} <= set(tags["scalars"])
    d = acc.Scalars("train/D")
    assert [(e.step, e.value) for e in d] == [(10, -0.5), (20, -0.25)]
    assert {"train/sample", "train/reconstruction", "train/attenuation"} <= set(
        tags["images"]
    )
    img = acc.Images("train/sample")[0]
    assert img.step == 42 and len(img.encoded_image_string) > 100


def test_tensorboard_logger_2d_and_resume_appends(tmp_path, rng):
    """2D variant renders the batch as one grid; a fresh logger on the same
    dir (resume) appends events that merge on the shared step axis."""
    from contrast_gan_3d_tpu.trainer.logger import TensorBoardLogger2D

    out = tmp_path / "tb"
    lg = TensorBoardLogger2D(FactorZeroCenterScaler(), out, max_slices=4, rng=rng)
    batch = rng.normal(0, 0.3, (5, 8, 8)).astype(np.float32)
    lg.log_scalars({"D": 1.0}, 1)
    lg.log_images(batch, batch, None, None, None, step=7)
    lg.end_hook()
    lg2 = TensorBoardLogger2D(FactorZeroCenterScaler(), out, max_slices=4, rng=rng)
    lg2.log_scalars({"D": 2.0}, 2)
    lg2.end_hook()

    # read the event FILES directly: EventAccumulator's out-of-order purge
    # can drop the second writer's events when both files land in the same
    # wall-clock second — the claim under test is that both files carry
    # their events on a shared step axis (what the TensorBoard UI merges)
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )
    from tensorboard.util import tensor_util

    scalars, images = [], []
    for f in sorted(out.glob("events.out.tfevents.*")):
        for ev in EventFileLoader(str(f)).Load():
            for v in getattr(ev.summary, "value", []):
                # tensorboardX writes tensor protos (the accumulator's
                # data_compat migrates them; raw reads decode here)
                if v.tag == "train/D":
                    val = (
                        float(tensor_util.make_ndarray(v.tensor))
                        if v.WhichOneof("value") == "tensor"
                        else v.simple_value
                    )
                    scalars.append((ev.step, val))
                if v.tag == "train/sample":
                    images.append(ev.step)
    assert sorted(scalars) == [(1, 1.0), (2, 2.0)]
    assert images == [7]


def test_builder_wires_tensorboard_logger(tmp_path):
    from dataclasses import replace

    from contrast_gan_3d_tpu.experiments import load_config
    from contrast_gan_3d_tpu.experiments.builder import build
    from contrast_gan_3d_tpu.trainer.logger import TensorBoardLogger

    cfg = replace(load_config("basic_3d"), logger="tensorboard")
    built = build(cfg, checkpoint_dir=str(tmp_path / "ck"))
    assert isinstance(built.logger_interface, MultiThreadedLogger)
    assert isinstance(built.logger_interface.inner, TensorBoardLogger)
    assert built.logger_interface.logs_images is True
    built.logger_interface.end_hook()
    assert (tmp_path / "ck" / "tb").is_dir()


def test_project_logs_to_stderr_retargets_and_spares_files(tmp_path):
    """bench.py's stdout is a machine-parsed JSON stream: the redirect must
    flip existing+future stdout handlers to stderr while leaving file
    handlers (a StreamHandler subclass) untouched."""
    import logging
    import sys

    from contrast_gan_3d_tpu.utils import logging_utils

    # self-contained: an earlier test may already have flipped the default
    # stream (test_bench_smoke imports bench.py, which calls the redirect)
    old_default = logging_utils._DEFAULT_STREAM
    logging_utils._DEFAULT_STREAM = sys.stdout
    # snapshot every project handler currently on stdout so the finally
    # block can undo the redirect's flips exactly
    was_stdout = [
        (h, h.stream)
        for name, other in logging.root.manager.loggerDict.items()
        if name.startswith("contrast_gan_3d_tpu")
        and isinstance(other, logging.Logger)
        for h in other.handlers
        if type(h) is logging.StreamHandler
        and getattr(h, "stream", None) is sys.stdout
    ]
    lg = logging_utils.create_logger(name="contrast_gan_3d_tpu._t_stderr")
    lg.handlers[0].setStream(sys.stdout)  # idempotent if freshly created
    fh = logging.FileHandler(tmp_path / "side.log")
    lg.addHandler(fh)
    assert lg.handlers[0].stream is sys.stdout

    try:
        logging_utils.project_logs_to_stderr()
        assert lg.handlers[0].stream is sys.stderr
        assert fh.stream is not sys.stderr  # file handler untouched
        lg2 = logging_utils.create_logger(
            name="contrast_gan_3d_tpu._t_stderr_late"
        )
        assert lg2.handlers[0].stream is sys.stderr  # future loggers too
    finally:
        logging_utils._DEFAULT_STREAM = old_default
        # undo the redirect's flips on OTHER pre-existing loggers too — a
        # partial run must not leave them retargeted for later tests
        # (commit e68eca5's ordering-dependency class)
        for h, stream in was_stdout:
            h.setStream(stream)
        fh.close()

"""train.py CLI end-to-end smoke (reference capability: train.py argparse +
TrainManager per-fold orchestration)."""

import pickle
import sys

import numpy as np

import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))  # repo root (train.py lives there)

from tests.synth import make_dataset

OVERRIDE = """
from dataclasses import replace

def config(base):
    return replace(
        base,
        name="cli_smoke",
        train_iterations=2,
        validate_every=None,
        checkpoint_every=2,
        log_every=1,
        log_images_every=None,
        train_patch_size=(16, 16, 16),
        train_batch_size={0: 2, -1: 1, 1: 1},
        generator_args={"n_resnet_blocks": 1, "n_updownsample_blocks": 1,
                        "init_channels_out": 2},
        critic_args={"init_channels_out": 2, "discriminator_depth": 1},
        num_workers=(1, 1),
        prefetch_depth=1,
        augment=False,
        logger="none",
    )
"""


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path, rng):
    import train as train_cli

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    splits = {"train": [fold], "test": [fold]}
    splits_path = tmp_path / "splits.pkl"
    with open(splits_path, "wb") as fd:
        pickle.dump(splits, fd)
    conf_path = tmp_path / "conf.py"
    conf_path.write_text(OVERRIDE)

    train_cli.main([
        "--conf", str(conf_path),
        "--cval-splits", str(splits_path),
        "--checkpoint-root", str(tmp_path / "ckpts"),
    ])

    ckpts = list((tmp_path / "ckpts" / "cli_smoke-fold0").glob("*.msgpack"))
    assert any(p.name == "2.msgpack" for p in ckpts), ckpts


@pytest.mark.slow
def test_train_cli_spatial_partitioning(tmp_path, rng):
    """--sp-devices: the CLI builds a dp x sp mesh and the whole train loop
    (loaders -> sharded steps -> checkpoint) runs with each patch's first dim
    halo-exchanged across the ``space`` axis."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    import train as train_cli

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    splits = {"train": [fold], "test": [fold]}
    splits_path = tmp_path / "splits.pkl"
    with open(splits_path, "wb") as fd:
        pickle.dump(splits, fd)
    conf_path = tmp_path / "conf.py"
    conf_path.write_text(OVERRIDE)

    train_cli.main([
        "--conf", str(conf_path),
        "--cval-splits", str(splits_path),
        "--checkpoint-root", str(tmp_path / "ckpts"),
        "--dp-devices", "2",
        "--sp-devices", "2",
    ])

    ckpts = list((tmp_path / "ckpts" / "cli_smoke-fold0").glob("*.msgpack"))
    assert any(p.name == "2.msgpack" for p in ckpts), ckpts


@pytest.mark.slow
def test_train_cli_sp_devices_from_config_file(tmp_path, rng):
    """sp_devices set in the config FILE (no --sp-devices / --dp-devices CLI
    flags) must still build the dp x sp mesh instead of being silently
    ignored; a val_patch_size not divisible by sp_devices must be refused at
    startup, not at the first mid-run validation."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    import train as train_cli

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    splits = {"train": [fold], "test": [fold]}
    splits_path = tmp_path / "splits.pkl"
    with open(splits_path, "wb") as fd:
        pickle.dump(splits, fd)

    conf_path = tmp_path / "conf.py"
    conf_path.write_text(
        OVERRIDE.replace('logger="none",', 'logger="none", sp_devices=2,')
    )
    train_cli.main([
        "--conf", str(conf_path),
        "--cval-splits", str(splits_path),
        "--checkpoint-root", str(tmp_path / "ckpts"),
    ])
    ckpts = list((tmp_path / "ckpts" / "cli_smoke-fold0").glob("*.msgpack"))
    assert any(p.name == "2.msgpack" for p in ckpts), ckpts

    bad_conf = tmp_path / "bad_conf.py"
    bad_conf.write_text(OVERRIDE.replace(
        'logger="none",', 'logger="none", sp_devices=2, val_patch_size=(15, 16, 16),'
    ))
    with pytest.raises(SystemExit, match="val_patch_size.*divisible"):
        train_cli.main([
            "--conf", str(bad_conf),
            "--cval-splits", str(splits_path),
            "--checkpoint-root", str(tmp_path / "ckpts2"),
        ])


def test_profiler_schedule_windows(monkeypatch):
    """skip/wait/warmup/active/repeat cycling: traces exactly the last
    `active` steps of each cycle after `skip_first` (reference
    train.py:39-47 torch.profiler schedule semantics)."""
    import jax

    import train as train_cli

    events = []
    monkeypatch.setattr(jax.profiler, "start_trace", lambda d: events.append("start"))
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda: events.append("stop"))

    prof = train_cli.JaxProfiler(
        "/tmp/x", skip_first=5, wait=1, warmup=2, active=3, repeat=2
    )
    starts, stops = [], []
    prof.begin()
    for i in range(30):
        n_before = len(events)
        prof.step()
        for e in events[n_before:]:
            (starts if e == "start" else stops).append(i)
    # cycle length 6 after 5 skipped: cycle 1 = steps 5-10, active 8-10;
    # cycle 2 = steps 11-16, active 14-16. step() is a POST-dispatch
    # boundary, so the start fires at the end of the step BEFORE the first
    # active one (7 and 13) and the trace covers exactly the active steps.
    assert starts == [7, 13]
    assert stops == [10, 16]
    prof.stop()  # idempotent: nothing active
    assert len(events) == 4


def test_profiler_active_one_traces_a_full_step(monkeypatch):
    """active=1 must trace one whole step — the pre-fix behavior started and
    stopped inside the same boundary call (an empty trace)."""
    import jax

    import train as train_cli

    events = []
    monkeypatch.setattr(jax.profiler, "start_trace", lambda d: events.append("start"))
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda: events.append("stop"))
    prof = train_cli.JaxProfiler("/tmp/x", skip_first=0, active=1, repeat=1)
    prof.begin()
    assert events == ["start"]  # iteration 0 is the active step
    prof.step()  # iteration 0 dispatched -> stop AFTER it
    assert events == ["start", "stop"]
    for _ in range(3):
        prof.step()
    assert events == ["start", "stop"]  # repeat budget respected


def test_profiler_from_spec():
    import train as train_cli

    prof = train_cli.JaxProfiler.from_spec(
        "/tmp/x", "skip_first=500,active=10,repeat=1"
    )
    assert (prof.skip_first, prof.active, prof.wait, prof.warmup, prof.repeat) == (
        500, 10, 0, 0, 1,
    )


def test_wandb_resume_restores_group_and_fold(monkeypatch, tmp_path):
    """Resuming by run-id restores the experiment group + starting fold from
    the wandb API (reference train.py:80-92), faked here."""
    import types

    import train as train_cli
    from contrast_gan_3d_tpu.experiments import load_config

    class FakeRun:
        group = "exp-group-7"
        config = {"fold": 2}

    class FakeApi:
        def run(self, path):
            assert path == "ent/proj/runid123"
            return FakeRun()

    fake_wandb = types.ModuleType("wandb")
    fake_wandb.Api = FakeApi
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)

    from dataclasses import replace

    cfg = replace(load_config(None), logger="wandb")
    mgr = train_cli.TrainManager(
        cfg, [], [], run_id="runid123",
        wandb_project="proj", wandb_entity="ent",
    )
    mgr.maybe_restore_wandb_run()
    assert mgr.group == "exp-group-7"
    assert mgr.starting_fold == 2


def test_wandb_resume_lookup_failure_is_soft(monkeypatch):
    import types

    import train as train_cli
    from contrast_gan_3d_tpu.experiments import load_config
    from dataclasses import replace

    class FakeApi:
        def run(self, path):
            raise RuntimeError("offline")

    fake_wandb = types.ModuleType("wandb")
    fake_wandb.Api = FakeApi
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)

    cfg = replace(load_config(None), logger="wandb")
    mgr = train_cli.TrainManager(cfg, [], [], run_id="x")
    mgr.maybe_restore_wandb_run()
    assert mgr.starting_fold == 0 and mgr.group is None


def test_round_train_batches_minimal():
    """Mesh rounding satisfies opt % n and (LOW+HIGH) % n with the MINIMAL
    inflation — per-stream rounding doubled the batch and skewed the
    reference opt:subopt balance."""
    import train as train_cli
    from contrast_gan_3d_tpu.alias import ScanType

    OPT, LOW, HIGH = ScanType.OPT.value, ScanType.LOW.value, ScanType.HIGH.value
    # reference 6+3+3 on 8 devices: {8, 4, 4} (total 16), NOT {8, 8, 8}
    out = train_cli.round_train_batches({OPT: 6, LOW: 3, HIGH: 3}, 8)
    assert out == {OPT: 8, LOW: 4, HIGH: 4}
    assert out[OPT] % 8 == 0 and (out[LOW] + out[HIGH]) % 8 == 0
    # already divisible: untouched
    assert train_cli.round_train_batches({OPT: 8, LOW: 4, HIGH: 4}, 4) == {
        OPT: 8, LOW: 4, HIGH: 4,
    }
    # subopt already divides even though streams individually don't
    assert train_cli.round_train_batches({OPT: 4, LOW: 3, HIGH: 1}, 4) == {
        OPT: 4, LOW: 3, HIGH: 1,
    }


def test_effective_logger_multihost_single_sink():
    """Multi-host runs keep one experiment logger: non-zero hosts downgrade
    wandb/file to none; console/noop stay per-host; single-host unchanged."""
    from train import effective_logger

    assert effective_logger("wandb", 0, 4) == "wandb"
    assert effective_logger("wandb", 3, 4) == "none"
    assert effective_logger("tensorboard", 0, 4) == "tensorboard"
    assert effective_logger("tensorboard", 2, 4) == "none"
    assert effective_logger("file", 1, 2) == "none"
    assert effective_logger("console", 1, 2) == "console"
    assert effective_logger("none", 1, 2) == "none"
    assert effective_logger("wandb", 0, 1) == "wandb"
    assert effective_logger("file", 0, 1) == "file"


@pytest.mark.slow
def test_train_cli_max_hours_budget_stops_gracefully(tmp_path, rng, monkeypatch):
    """--max-hours: an expired wall-clock budget requests the same graceful
    stop as a preemption signal — the run checkpoints at the break step and
    main() returns (exit 0) long before the iteration horizon. The manager's
    start time is rewound at fold entry so ~15 s of budget remain no matter
    how long dataset/build startup took (patching time.monotonic globally
    would corrupt other consumers — queue.get timeouts, thread waits)."""
    import time as time_mod

    import train as train_cli

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    splits_path = tmp_path / "splits.pkl"
    with open(splits_path, "wb") as fd:
        pickle.dump({"train": [fold], "test": [fold]}, fd)
    conf_path = tmp_path / "conf.py"
    conf_path.write_text(
        OVERRIDE.replace("train_iterations=2", "train_iterations=100000")
    )

    class PinnedBudgetManager(train_cli.TrainManager):
        def run_fold(self, *a, **k):
            self._t0 = time_mod.monotonic() - self.max_hours * 3600.0 + 15.0
            return super().run_fold(*a, **k)

    monkeypatch.setattr(train_cli, "TrainManager", PinnedBudgetManager)

    train_cli.main([
        "--conf", str(conf_path),
        "--cval-splits", str(splits_path),
        "--checkpoint-root", str(tmp_path / "ckpts"),
        "--max-hours", "1.0",
    ])

    ckpts = sorted(
        (tmp_path / "ckpts" / "cli_smoke-fold0").glob("*.msgpack"),
        key=lambda p: int(p.stem),
    )
    assert ckpts, "no checkpoint written at the budget stop"
    assert int(ckpts[-1].stem) < 100000  # stopped on budget, not the horizon


def test_max_hours_exhausted_skips_fold_side_effect_free(tmp_path, rng, monkeypatch):
    """An already-exhausted budget skips the fold BEFORE any fold state
    exists: no loaders/trainer/checkpoint dir, and the process signal
    handlers are untouched (the early return used to fire after
    install_preemption_handler + wandb.init, leaking stale handlers and an
    unfinished wandb run that the next fold's init would merge into)."""
    import signal as sig
    import time as time_mod

    import train as train_cli

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    splits_path = tmp_path / "splits.pkl"
    with open(splits_path, "wb") as fd:
        pickle.dump({"train": [fold], "test": [fold]}, fd)
    conf_path = tmp_path / "conf.py"
    conf_path.write_text(
        OVERRIDE.replace("train_iterations=2", "train_iterations=100000")
    )

    class ExhaustedManager(train_cli.TrainManager):
        def run_fold(self, *a, **k):
            self._t0 = time_mod.monotonic() - self.max_hours * 3600.0 - 1.0
            return super().run_fold(*a, **k)

    monkeypatch.setattr(train_cli, "TrainManager", ExhaustedManager)
    before = {s: sig.getsignal(s) for s in (sig.SIGTERM, sig.SIGINT)}
    train_cli.main([
        "--conf", str(conf_path),
        "--cval-splits", str(splits_path),
        "--checkpoint-root", str(tmp_path / "ckpts"),
        "--max-hours", "1.0",
    ])  # returns promptly: the fold is skipped, not trained
    for s, h in before.items():
        assert sig.getsignal(s) is h, f"leaked handler for {s}"
    assert not (tmp_path / "ckpts" / "cli_smoke-fold0").exists()


TB_OVERRIDE = OVERRIDE.replace('logger="none"', 'logger="tensorboard"').replace(
    "log_images_every=None", "log_images_every=2"
)


@pytest.mark.slow
def test_train_cli_tensorboard_live(tmp_path, rng):
    """The LIVE TensorBoard logging path end-to-end: production CLI ->
    tensorboardX event files -> read back with the real tensorboard reader.
    Unlike the wandb path (wandb isn't installable in this image), nothing
    here is faked — the exact bytes a TensorBoard UI would load are written
    and parsed (reference capability: live experiment logging,
    reference train.py:184-203 / trainer/logger/WandbLogger.py)."""
    import train as train_cli

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    splits_path = tmp_path / "splits.pkl"
    with open(splits_path, "wb") as fd:
        pickle.dump({"train": [fold], "test": [fold]}, fd)
    conf_path = tmp_path / "conf.py"
    conf_path.write_text(TB_OVERRIDE)

    train_cli.main([
        "--conf", str(conf_path),
        "--cval-splits", str(splits_path),
        "--checkpoint-root", str(tmp_path / "ckpts"),
    ])

    tb_dir = tmp_path / "ckpts" / "cli_smoke-fold0" / "tb"
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events, f"no event files in {tb_dir}"

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tb_dir), size_guidance={"scalars": 0, "images": 0})
    acc.Reload()
    tags = acc.Tags()
    # the WGAN scalar curves (critic loss logged every iteration) + the
    # per-phase time budget scalars
    assert "train/D" in tags["scalars"], tags["scalars"]
    d_vals = acc.Scalars("train/D")
    assert len(d_vals) >= 2 and all(np.isfinite(e.value) for e in d_vals)
    assert any(t.startswith("train/tb/") for t in tags["scalars"])
    # the axial-slice image grids (sample/reconstruction/attenuation at the
    # log_images_every boundary)
    assert any(t.startswith("train/") for t in tags["images"]), tags["images"]
    img = acc.Images(tags["images"][0])[0]
    assert img.width > 0 and img.height > 0 and len(img.encoded_image_string) > 100

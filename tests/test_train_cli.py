"""train.py CLI end-to-end smoke (reference capability: train.py argparse +
TrainManager per-fold orchestration)."""

import pickle
import sys

import pytest

sys.path.insert(0, ".")  # repo root (train.py lives there)

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
    for i in range(30):
        n_before = len(events)
        prof.step()
        for e in events[n_before:]:
            (starts if e == "start" else stops).append(i)
    # cycle length 6 after 5 skipped: cycle 1 = steps 5-10 (trace 8-10),
    # cycle 2 = steps 11-16 (trace 14-16), then repeat budget exhausted
    assert starts == [8, 14]
    assert stops == [10, 16]
    prof.stop()  # idempotent: nothing active
    assert len(events) == 4


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

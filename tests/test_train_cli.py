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

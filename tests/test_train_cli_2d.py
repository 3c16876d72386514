"""2D train CLI end-to-end smoke (conf_2D capability: 2D models, slice
sampling, 2D augmentation, 2D validation)."""

import pickle
import sys

import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))  # repo root

from tests.synth import make_dataset

OVERRIDE = """
from dataclasses import replace
from contrast_gan_3d_tpu.experiments.config import conf_2d

def config(base):
    return replace(
        conf_2d(),
        name="cli2d_smoke",
        train_iterations=2,
        validate_every=2,
        val_iterations=1,
        checkpoint_every=2,
        log_every=1,
        log_images_every=None,
        train_patch_size=(16, 16),
        val_patch_size=(16, 16),
        train_batch_size={0: 2, -1: 1, 1: 1},
        val_batch_size={0: 1, -1: 1, 1: 1},
        generator_args={"n_resnet_blocks": 1, "n_updownsample_blocks": 1,
                        "init_channels_out": 2, "ndim": 2},
        critic_args={"init_channels_out": 2, "discriminator_depth": 1, "ndim": 2},
        num_workers=(1, 1),
        prefetch_depth=1,
        compute_dtype="float32",
        logger="none",
    )
"""


@pytest.mark.slow
def test_train_cli_2d_end_to_end(tmp_path, rng):
    import train as train_cli

    fold = make_dataset(tmp_path / "data", rng, n_per_label=1)
    with open(tmp_path / "splits.pkl", "wb") as fd:
        pickle.dump({"train": [fold], "test": [fold]}, fd)
    conf_path = tmp_path / "conf2d.py"
    conf_path.write_text(OVERRIDE)

    train_cli.main([
        "--conf", str(conf_path),
        "--cval-splits", str(tmp_path / "splits.pkl"),
        "--checkpoint-root", str(tmp_path / "ckpts"),
    ])
    ckpts = list((tmp_path / "ckpts" / "cli2d_smoke-fold0").glob("*.msgpack"))
    assert any(p.name == "2.msgpack" for p in ckpts), ckpts

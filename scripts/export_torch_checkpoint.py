#!/usr/bin/env python
"""Convert one of this framework's checkpoints into a REFERENCE torch .pt.

Inverse of ``import_torch_checkpoint.py``: takes a msgpack checkpoint
(``<step>.msgpack`` file or a checkpoint dir) and writes the torch.save dict
layout the reference expects (reference ``trainer/Trainer.py:321-327``), so
its eval stack — ``CCTAContrastCorrector`` reads ``ckpt["generator"]``
(reference ``eval/CCTAContrastCorrector.py:55-56``) — runs on generators
trained here. The critic IS included — under ``critic_state_dict``, a key
the reference Trainer resume tolerates (its loader crashes on a non-None
``discriminator`` entry since the attribute is named ``critic``); genuine
reference checkpoints never manage to save a critic at all.

NOTE: exact torch equivalence requires the checkpoint to come from a run
with ``tconv_placement="torch"`` (e.g. one imported from the reference and
fine-tuned); the faster "same" training default places transpose-conv
windows one voxel off torch's (utils/torch_port.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", type=Path, help=".msgpack file or checkpoint dir")
    p.add_argument("out_path", type=Path, help="output .pt file")
    p.add_argument("--iteration", type=int, default=None,
                   help="checkpoint step to export when a dir is given")
    p.add_argument("--n-resnet-blocks", type=int, default=None,
                   help="cross-check only (auto-derived from the checkpoint)")
    p.add_argument("--n-updownsample-blocks", type=int, default=None,
                   help="cross-check only (auto-derived from the checkpoint)")
    p.add_argument("--discriminator-depth", type=int, default=None,
                   help="cross-check only (auto-derived from the checkpoint)")
    p.add_argument("--no-critic", action="store_true",
                   help="export the generator only")
    args = p.parse_args()

    from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
    from contrast_gan_3d_tpu.utils.torch_port import save_reference_checkpoint

    path = args.checkpoint
    if path.is_dir():
        path = (
            ckpt_lib.checkpoint_path(path, args.iteration)
            if args.iteration is not None
            else ckpt_lib.find_latest_checkpoint(path)
        )
        if path is None or not path.exists():
            raise SystemExit(f"no checkpoint found in {args.checkpoint}")
    raw = ckpt_lib.load_checkpoint(path)
    step = int(raw["step"])
    gv = {"params": raw["gen_params"]}
    if raw.get("gen_stats"):
        gv["batch_stats"] = raw["gen_stats"]
    cv = None
    if not args.no_critic and raw.get("critic_params"):
        cv = {"params": raw["critic_params"]}
        if raw.get("critic_stats"):
            cv["batch_stats"] = raw["critic_stats"]
    args.out_path.parent.mkdir(parents=True, exist_ok=True)
    save_reference_checkpoint(
        args.out_path, gv, cv, iteration=step,
        n_resnet_blocks=args.n_resnet_blocks,
        n_updownsample_blocks=args.n_updownsample_blocks,
        discriminator_depth=args.discriminator_depth,
    )
    print(f"wrote {args.out_path} (iteration {step}, critic={'no' if cv is None else 'yes'})")


if __name__ == "__main__":
    main()

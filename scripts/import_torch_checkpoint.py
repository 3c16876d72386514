#!/usr/bin/env python
"""Convert a REFERENCE torch checkpoint (.pt) into this framework's format.

The reference writes ``torch.save({"iteration", "generator", "optimizer_G",
..., "discriminator"})`` files (reference ``trainer/Trainer.py:321-327``;
note its ``discriminator`` entry is None — the critic was silently never
saved). This script ports the generator (and critic, when present) weights +
BatchNorm stats into a full :class:`GANTrainState` msgpack checkpoint that
``Trainer``/``CCTAContrastCorrector.from_checkpoint`` load natively.
Optimizer states restart fresh (torch Adam moments don't transfer across the
layout mapping meaningfully).

The written ``<step>.meta.json`` sidecar records ``tconv_placement="torch"``
(see utils/torch_port.py); ``CCTAContrastCorrector.from_checkpoint`` and
``Trainer`` consumers that build their own module must construct it with
that placement — the corrector does so automatically from the sidecar.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pt_path", type=Path, help="reference <iteration>.pt file")
    p.add_argument("out_dir", type=Path, help="checkpoint dir for the .msgpack")
    p.add_argument("--n-resnet-blocks", type=int, default=4)
    p.add_argument("--n-updownsample-blocks", type=int, default=2)
    p.add_argument("--init-channels-out", type=int, default=16)
    p.add_argument("--critic-init-channels", type=int, default=8)
    p.add_argument("--discriminator-depth", type=int, default=3)
    p.add_argument("--patch", type=int, nargs="+", default=(128, 128, 128))
    args = p.parse_args()

    import jax

    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import init_state
    from contrast_gan_3d_tpu.utils.torch_port import load_reference_checkpoint

    ndim = len(args.patch)
    payload = load_reference_checkpoint(
        args.pt_path, args.n_resnet_blocks, args.n_updownsample_blocks,
        args.discriminator_depth,
    )
    gen = ResnetGenerator(
        n_resnet_blocks=args.n_resnet_blocks,
        n_updownsample_blocks=args.n_updownsample_blocks,
        init_channels_out=args.init_channels_out,
        ndim=ndim,
        tconv_placement="torch",
    )
    critic = PatchGANDiscriminator(
        init_channels_out=args.critic_init_channels,
        discriminator_depth=args.discriminator_depth,
        ndim=ndim,
    )
    tx = make_optimizer()
    state = init_state(gen, critic, tx, tx, jax.random.key(0), tuple(args.patch))
    gvars = payload["generator"]
    state = state.replace(
        step=state.step + payload["iteration"],
        gen_params=gvars["params"],
        gen_stats=gvars.get("batch_stats", {}),
    )
    if payload["critic"] is not None:
        cvars = payload["critic"]
        state = state.replace(
            critic_params=cvars["params"],
            critic_stats=cvars.get("batch_stats", {}),
        )
    else:
        print("NOTE: no critic in the reference checkpoint (its known "
              "save bug) — critic stays freshly initialized")
    path = ckpt_lib.save_checkpoint(
        state, args.out_dir, step=payload["iteration"],
        # recorded so inference (CCTAContrastCorrector.from_checkpoint,
        # serve.py) rebuilds the generator with the torch conv placement —
        # without it the default 'same' placement loads the same param tree
        # but shifts transpose-conv outputs by one voxel
        meta={"generator": {"tconv_placement": "torch", "norm": gen.norm}},
    )
    print(f"wrote {path} (iteration {payload['iteration']})")


if __name__ == "__main__":
    main()

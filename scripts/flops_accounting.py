#!/usr/bin/env python
"""Analytic FLOPs for the production training/inference programs.

XLA compiled-HLO cost analysis (``Compiled.cost_analysis()``) of the exact
programs the bench dispatches, CPU-lowered so it runs anywhere: HLO flop
counts are algorithmic (conv/matmul math, forward + backward + optimizer as
actually compiled — the "conv FLOPs x3 for bwd" rule included by
construction, GP's critic double-backward included in the gp program).
Used by PERF.md's MFU table: achieved TFLOPS = flops / measured sec/step
on the bench chip vs the measured ~98 TFLOPS bf16 ceiling.

The "bytes" figure is the HLO-level bytes-accessed estimate of the
CPU-lowered module — an UNFUSED UPPER BOUND on real TPU HBM traffic (TPU
fusion materializes far fewer intermediates), reported for arithmetic-
intensity context only.

Run: ``python scripts/flops_accounting.py [--json]`` (~3 min of CPU
compiles, cached afterwards).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()


def _cost(compiled) -> dict:
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed_unfused_upper_bound": float(
            ca.get("bytes accessed", float("nan"))
        ),
    }


_SMOKE = False


def _setup(use_gp: bool, is_2d: bool):
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import (
        StepConfig, build_train_steps, init_state,
    )

    kw = {"n_resnet_blocks": 1, "init_channels_out": 4} if _SMOKE else {}
    ckw = {"init_channels_out": 4, "discriminator_depth": 2} if _SMOKE else {}
    if is_2d:
        patch = (32, 32) if _SMOKE else (128, 128)
        gen = ResnetGenerator(
            ndim=2, dtype=jnp.bfloat16,
            **(kw if _SMOKE else {"n_resnet_blocks": 6}),
        )
        critic = PatchGANDiscriminator(ndim=2, dtype=jnp.bfloat16, **ckw)
        n_opt = n_sub = 2 if _SMOKE else 256
    else:
        patch = (16, 16, 16) if _SMOKE else (128, 128, 128)
        gen = ResnetGenerator(dtype=jnp.bfloat16, layout="packed", **kw)
        critic = PatchGANDiscriminator(dtype=jnp.bfloat16, **ckw)
        n_opt = n_sub = 2 if _SMOKE else 6
    tx = make_optimizer()
    cfg = StepConfig(
        weight_clip=None if use_gp else 0.01, augment=None, dtype=jnp.bfloat16
    )
    state = init_state(gen, critic, tx, tx, jax.random.key(0), patch)
    steps = build_train_steps(gen, critic, tx, tx, cfg)
    rng = np.random.default_rng(0)
    opt = jnp.asarray(rng.integers(-1024, 1500, (n_opt, *patch), dtype=np.int16))
    sub = jnp.asarray(rng.integers(-1024, 1500, (n_sub, *patch), dtype=np.int16))
    msk = jnp.asarray((rng.random((n_sub, *patch)) < 0.001).astype(np.int16))
    return state, steps, (opt, sub, msk)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", action="store_true", help="one JSON object")
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes/models — executability rot-guard only "
                        "(tests); the counts are meaningless")
    args = p.parse_args()
    global _SMOKE
    _SMOKE = args.smoke

    out = {}
    state, steps, batch = _setup(use_gp=False, is_2d=False)
    out["combined_wc_128c_b12"] = _cost(steps.combined_step.lower(state, *batch).compile())
    out["critic_only_128c_b12"] = _cost(steps.critic_step.lower(state, *batch).compile())
    state, steps, batch = _setup(use_gp=True, is_2d=False)
    out["combined_gp_128c_b12"] = _cost(steps.combined_step.lower(state, *batch).compile())
    state, steps, batch = _setup(use_gp=False, is_2d=True)
    out["combined_wc_128sq_b512"] = _cost(steps.combined_step.lower(state, *batch).compile())

    # production inference forward: packed-IO generator, corrector batch 24
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    kw = {"n_resnet_blocks": 1, "init_channels_out": 4} if _SMOKE else {}
    gen = ResnetGenerator(dtype=jnp.bfloat16, **kw)
    pe = 16 if _SMOKE else 128
    b = 2 if _SMOKE else 24
    x0 = jnp.zeros((1, pe, pe, pe, 1), jnp.bfloat16)
    variables = gen.init(jax.random.key(0), x0, train=False)
    gen_p = gen.clone(layout="packed", packed_input=True, packed_output=True)
    xp = jnp.zeros((b, pe // 2, pe // 2, pe // 2, 8), jnp.bfloat16)
    fwd = jax.jit(lambda v: gen_p.apply(variables, v, train=False))
    out["inference_fwd_packed_128c_b24"] = _cost(fwd.lower(xp).compile())

    if args.json:
        print(json.dumps(out, indent=2))
    else:
        for k, v in out.items():
            print(f"{k}: {v['flops'] / 1e12:.4f} TFLOP "
                  f"(bytes upper bound {v['bytes_accessed_unfused_upper_bound'] / 1e9:.1f} GB)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""On-chip attribution + A/B driver for the saturated batch-96 train step
(VERDICT r4 next #2: "attack (or bury with receipts) the b96 backward-path
MFU gap").

Modes (composable, default both):
- ``--attrib``: program-level decomposition of the 48+48 combined step into
  its existing compiled branches — forward-only, critic_step (gen fwd +
  critic update), generator_only_step (gen fwd + gen bwd + both updates),
  combined — so the backward/optimizer share at the roofline point is
  measured, not inferred from parity-batch numbers.
- ``--stages``: prefix-truncated gradient attribution of the GENERATOR
  backward at batch 96: the loss reads a captured intermediate after stage
  K (flax ``capture_intermediates``), so every later stage is dead code
  and XLA DCEs it — consecutive deltas give per-stage fwd+bwd cost at the
  b96 shape (the round-2 methodology, re-run at the shape where the
  backward dominates).

A/B levers run via the bench instead (same program construction —
``bench._train_setup``): ``BENCH_MODE=train BENCH_OPT=48 BENCH_SUB=48``
with BENCH_SPLIT / BENCH_REMAT / BENCH_LAYOUT / XLA_FLAGS variations.
Results are tabulated in PERF.md "b96 backward accounting".

Timing uses completion-forcing scalar fetches (block_until_ready is a
no-op under the axon tunnel — PERF.md header note).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import os

import numpy as np

import jax
import jax.numpy as jnp

# honor an explicit JAX_PLATFORMS request (tiny CPU smoke runs; the axon
# sitecustomize otherwise overrides it back to the tunnel)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()


def _time(fn, reps=3):
    fn()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--attrib", action="store_true")
    p.add_argument("--stages", action="store_true")
    p.add_argument("--xla-option", action="append", default=[],
                   help="KEY=VALUE TPU compiler option, repeatable: AOT-"
                        "compiles the combined step with these "
                        "``compiler_options`` and times it (the A/B lever "
                        "path — env XLA_FLAGS can't carry TPU-only flags "
                        "on this rig, the local parser rejects them)")
    p.add_argument("--n-opt", type=int, default=48)
    p.add_argument("--n-sub", type=int, default=48)
    p.add_argument("--patch", type=int, nargs=3, default=(128, 128, 128))
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()
    do_attrib = args.attrib or not (args.stages or args.xla_option)
    do_stages = args.stages or not (args.attrib or args.xla_option)
    patch = tuple(args.patch)

    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import (
        StepConfig, build_train_steps, init_state,
    )

    gen = ResnetGenerator(dtype=jnp.bfloat16, layout="packed")
    critic = PatchGANDiscriminator(dtype=jnp.bfloat16)
    tx = make_optimizer()
    cfg = StepConfig(weight_clip=0.01, augment=None, dtype=jnp.bfloat16)
    state = init_state(gen, critic, tx, tx, jax.random.key(0), patch)
    steps = build_train_steps(gen, critic, tx, tx, cfg)

    rng = np.random.default_rng(0)
    n_opt, n_sub = args.n_opt, args.n_sub
    opt = jnp.asarray(rng.integers(-1024, 1500, (n_opt, *patch), np.int16))
    sub = jnp.asarray(rng.integers(-1024, 1500, (n_sub, *patch), np.int16))
    msk = jnp.asarray((rng.random((n_sub, *patch)) < 0.001).astype(np.int16))

    def emit(name, sec):
        print(json.dumps({
            "probe": name, "sec": round(sec, 4),
            "batch": [n_opt, n_sub], "patch": list(patch),
        }), flush=True)

    if args.xla_option:
        # "CONTROL" = AOT compile with NO options: isolates any effect of
        # the AOT path itself from the option under test
        opts = dict(
            kv.split("=", 1) for kv in args.xla_option if kv != "CONTROL"
        )
        compiled = steps.combined_step.lower(state, opt, sub, msk).compile(
            compiler_options=opts
        )
        holder = {"s": state}

        def run():
            holder["s"], m = compiled(holder["s"], opt, sub, msk)
            float(next(iter(m.values())))

        emit(f"combined_step[{','.join(args.xla_option)}]",
             _time(run, args.reps))

    if do_attrib:
        # forward only (eval-path construction: scale + apply, bf16)
        scaler = cfg.scaler
        x = scaler(sub.astype(jnp.float32)).astype(jnp.bfloat16)[..., None]
        variables = {"params": state.gen_params}
        if state.gen_stats:
            variables["batch_stats"] = state.gen_stats

        fwd = jax.jit(lambda v: gen.apply(
            {"params": state.gen_params, **(
                {"batch_stats": state.gen_stats} if state.gen_stats else {}
            )}, v, train=False))
        emit("gen_forward_only", _time(
            lambda: np.asarray(fwd(x)[0, 0, 0, 0, 0]), args.reps
        ))

        # the three schedule branches (state donated -> rebind per call;
        # each branch gets a fresh holder so timings stay independent)
        for name, branch, bargs in (
            ("critic_step", steps.critic_step, (opt, sub, msk)),
            ("generator_only_step", steps.generator_only_step, (opt, sub, msk)),
            ("combined_step", steps.combined_step, (opt, sub, msk)),
        ):
            holder = {"s": init_state(gen, critic, tx, tx, jax.random.key(1), patch)}

            def run(branch=branch, holder=holder, bargs=bargs):
                holder["s"], m = branch(holder["s"], *bargs)
                float(next(iter(m.values())))

            emit(name, _time(run, args.reps))

    if do_stages:
        # prefix-truncated generator grads: loss on the captured output of
        # stage K -> later stages DCE'd out of forward AND backward
        stage_order = (
            ["first"]
            + [f"down_{i}" for i in range(gen.n_updownsample_blocks)]
            + [f"resnet_{i}" for i in range(gen.n_resnet_blocks)]
            + [f"up_{i}" for i in range(gen.n_updownsample_blocks - 1, -1, -1)]
            + ["last_conv"]
        )
        scaler = cfg.scaler
        x = scaler(sub.astype(jnp.float32)).astype(jnp.bfloat16)[..., None]
        stats = state.gen_stats

        def make_loss(stage):
            def loss(params):
                variables = {"params": params}
                if stats:
                    variables["batch_stats"] = stats
                _, mut = gen.apply(
                    variables, x, train=True,
                    mutable=["batch_stats", "intermediates"],
                    capture_intermediates=(
                        lambda mdl, method: mdl.name == stage
                    ),
                )
                inter = mut["intermediates"]
                leaves = jax.tree_util.tree_leaves(inter)
                assert leaves, f"stage {stage!r} captured nothing"
                return jnp.sum(leaves[0].astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss))

        prev = 0.0
        for stage in stage_order:
            g = make_loss(stage)

            def run(g=g):
                out = g(state.gen_params)
                float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

            try:
                sec = _time(run, args.reps)
            except Exception as e:  # a stage not present in this layout
                print(json.dumps({"probe": f"prefix:{stage}",
                                  "error": str(e)[:200]}), flush=True)
                continue
            print(json.dumps({
                "probe": f"prefix_through_{stage}", "sec": round(sec, 4),
                "delta_vs_prev": round(sec - prev, 4),
            }), flush=True)
            prev = sec


if __name__ == "__main__":
    main()

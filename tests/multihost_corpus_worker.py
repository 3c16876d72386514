"""Worker for the sharded-HDF5-corpus multi-host training test.

BASELINE.json config #5 ("data-parallel training: sharded HDF5 CT corpus,
async host prefetch") run for real: each of N processes (2 virtual CPU
devices, gloo collectives) takes ITS OWN per-label shard of a corpus-file
fold (``multihost.host_fold_shard``), feeds it through the production
prefetch loaders, assembles the globally-sharded batch and runs one
data-parallel WGAN step. Writes metrics + the patient names it actually
sampled + its local batch arrays (so the test can replay the global batch
on one device).

Usage: python multihost_corpus_worker.py <coordinator> <nprocs> <pid> \
           <corpus_dir> <out.json>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()  # scoped per platform+CPU features (utils/cache.py)

GLOBAL_BATCH = {0: 4, -1: 2, 1: 2}


def main():
    coordinator, nprocs, pid, corpus_dir, out_path = sys.argv[1:6]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import json

    import numpy as np

    from contrast_gan_3d_tpu.data.pipeline import create_loaders
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.parallel import multihost
    from contrast_gan_3d_tpu.parallel.mesh import data_mesh, put_replicated
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import (
        StepConfig,
        build_train_steps,
        init_state,
    )

    multihost.initialize(coordinator, int(nprocs), int(pid))
    mesh = data_mesh()

    # per-ScanType corpus files -> THIS host's disjoint per-label shard
    fold = [
        (os.path.join(corpus_dir, fname), label)
        for label, fname in ((0, "opt.h5"), (-1, "low.h5"), (1, "high.h5"))
    ]
    shard = multihost.host_fold_shard(fold)

    host_batch = {
        label: size // jax.process_count() for label, size in GLOBAL_BATCH.items()
    }
    loaders = create_loaders(
        shard, (16, 16, 16), host_batch,
        np.random.default_rng(100 + jax.process_index()),
        num_threads=1, to_device=False,
    )
    try:
        opt_b = next(loaders[0])
        low_b, high_b = next(loaders[-1]), next(loaders[1])
    finally:
        for loader in loaders.values():
            loader.stop()
    local = {
        "opt": opt_b["data"],
        "sub": np.concatenate([low_b["data"], high_b["data"]]),
        "msk": np.concatenate([low_b["seg"], high_b["seg"]]),
    }
    np.savez(out_path + ".npz", **local)

    opt = multihost.make_global_batch(local["opt"], mesh)
    sub = multihost.make_global_batch(local["sub"], mesh)
    msk = multihost.make_global_batch(local["msk"], mesh)

    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    state = put_replicated(
        init_state(gen, critic, tx, tx, jax.random.key(0), (16, 16, 16)), mesh
    )
    steps = build_train_steps(gen, critic, tx, tx, StepConfig(augment=None), mesh=mesh)
    state, metrics = steps.combined_step(state, opt, sub, msk)

    out = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    out["global_devices"] = jax.device_count()
    out["process_index"] = jax.process_index()
    out["sampled"] = sorted(
        set(opt_b["name"]) | set(low_b["name"]) | set(high_b["name"])
    )
    out["shard_paths"] = sorted(p for p, _ in shard)
    with open(out_path, "w") as fd:
        json.dump(out, fd)
    print("corpus worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()

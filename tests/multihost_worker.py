"""Worker process for the real multi-process (multi-host) test.

Each process owns 2 virtual CPU devices; ``jax.distributed`` (gloo
collectives) wires N of them into one runtime spanning 2N global devices —
the same topology as one process per TPU host. Runs ONE data-parallel WGAN
train step through the production code path (``parallel/multihost.py`` +
``parallel/mesh.py`` + ``trainer/steps.py``) on its host-local batch shard
and writes the resulting metrics as JSON.

Usage: python multihost_worker.py <coordinator> <nprocs> <pid> <batch.npz> <out.json>
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


def main():
    coordinator, nprocs, pid, batch_path, out_path = sys.argv[1:6]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import json

    import numpy as np

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
    assert jax.process_count() == int(nprocs)
    mesh = data_mesh()

    blob = np.load(batch_path)
    opt_g, sub_g, msk_g = blob["opt"], blob["sub"], blob["msk"]
    sl = multihost.host_local_batch_slice(opt_g.shape[0])
    opt = multihost.make_global_batch(opt_g[sl], mesh)
    sub = multihost.make_global_batch(sub_g[sl], mesh)
    msk = multihost.make_global_batch(msk_g[sl], mesh)

    patch = opt_g.shape[1:]
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    state = put_replicated(
        init_state(gen, critic, tx, tx, jax.random.key(0), patch), mesh
    )
    steps = build_train_steps(gen, critic, tx, tx, StepConfig(augment=None), mesh=mesh)
    state, metrics = steps.combined_step(state, opt, sub, msk)
    host = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    host["global_devices"] = jax.device_count()
    host["process_index"] = jax.process_index()
    with open(out_path, "w") as fd:
        json.dump(host, fd)
    print("worker", pid, "ok", host, flush=True)


if __name__ == "__main__":
    main()

"""Worker for the coordinated graceful-stop multi-host test.

Two processes train through the real ``Trainer.fit``; ONLY process 0
requests a graceful stop mid-run (simulating a preemption signal that
reached one host first). The stop decision must be collective
(``Trainer._stop_due`` all-gathers local flags every ``stop_sync_every``
iterations) so BOTH processes break at the same iteration boundary — a
host breaking alone would deadlock its peer in the next step's
collectives. Writes ``{final_step, process_index}`` to ``out.json``.

Usage: python multihost_stop_worker.py <coordinator> <nprocs> <pid> \
           <data_dir> <ckpt_dir> <out.json>
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

PATCH = (16, 16, 16)


def main():
    coordinator, nprocs, pid, data_dir, ckpt_dir, out_path = sys.argv[1:7]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import json

    import numpy as np

    from contrast_gan_3d_tpu.data.pipeline import create_loaders
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.parallel import multihost
    from contrast_gan_3d_tpu.parallel.mesh import data_mesh
    from contrast_gan_3d_tpu.trainer.logger import LoggerInterface
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import StepConfig
    from contrast_gan_3d_tpu.trainer.trainer import Trainer, TrainerConfig
    from tests.synth import make_dataset

    multihost.initialize(coordinator, int(nprocs), int(pid))
    mesh = data_mesh()

    # per-host synthetic patients + host-local batch shares (global 4/2/2)
    host_dir = os.path.join(data_dir, f"host{pid}")
    fold = make_dataset(host_dir, np.random.default_rng(50 + int(pid)), n_per_label=1)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1},
        np.random.default_rng(100 + int(pid)),
        num_threads=1, prefetch=1, to_device=False,
    )

    holder = {}

    class StopAt(LoggerInterface):
        """Process 0 'receives the preemption signal' at train step 3."""

        logs_images = False

        def log_scalars(self, scalars, step, stage="train"):
            if stage == "train" and step >= 3 and int(pid) == 0:
                holder["t"].request_stop("simulated preemption on host 0")

        def log_images(self, *a, **k):
            pass

    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
    )
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=None),
        TrainerConfig(
            train_iterations=40, train_critic_every=1, train_generator_every=2,
            val_every=None, log_every=1, log_images_every=None,
            checkpoint_every=10**6, checkpoint_dir=ckpt_dir,
            stop_sync_every=2,
        ),
        jax.random.key(0), PATCH, logger_interface=StopAt(), mesh=mesh,
    )
    holder["t"] = trainer
    state = trainer.fit(loaders)

    with open(out_path, "w") as fd:
        json.dump(
            {"final_step": int(jax.device_get(state.step)),
             "process_index": int(pid),
             "stop_requested": trainer.stop_requested},
            fd,
        )
    print("stop worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()

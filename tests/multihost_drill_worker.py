"""Worker for the pod-scale failure drill (VERDICT r4 #6).

FOUR processes (x2 virtual CPU devices = an 8-device pod) train through the
real ``Trainer.fit`` with the production preemption wiring
(``install_preemption_handler``): host 2 delivers itself a REAL ``SIGTERM``
mid-run — the exact signal a pod scheduler sends ahead of eviction — and the
coordinated-stop collective (``Trainer._stop_due``) must break ALL FOUR
hosts at the same iteration boundary, with end-of-fit persistence writing
one model checkpoint (process 0) plus a per-host data sidecar each. The
parent test then resumes that checkpoint on a DIFFERENT process count
through the elastic-resume detection.

Usage: python multihost_drill_worker.py <coordinator> <nprocs> <pid> \
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
SIGNAL_HOST = 2  # the host the "scheduler" preempts
SIGNAL_STEP = 3


def main():
    coordinator, nprocs, pid, data_dir, ckpt_dir, out_path = sys.argv[1:7]

    import json
    import signal as sig

    import jax.numpy as jnp
    import numpy as np

    from contrast_gan_3d_tpu.data.pipeline import create_loaders
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.parallel import multihost
    from contrast_gan_3d_tpu.parallel.mesh import data_mesh
    from contrast_gan_3d_tpu.trainer.logger import LoggerInterface
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import StepConfig
    from contrast_gan_3d_tpu.trainer.trainer import (
        Trainer, TrainerConfig, install_preemption_handler,
    )
    from tests.synth import make_dataset

    multihost.initialize(coordinator, int(nprocs), int(pid))
    mesh = data_mesh()

    # establish the gloo clique BEFORE the heavyweight train-step compiles:
    # a trivial cross-process sum compiles in seconds, so worker skew at
    # the first collective stays far below gloo's 30 s context-init
    # timeout (4 cold WGAN-step compiles time-sharing one core otherwise
    # blow it — observed in this test's first run); the barrier then
    # aligns workers again before the big compiles start
    from contrast_gan_3d_tpu.parallel.mesh import put_batch

    probe = put_batch(
        np.ones((jax.local_device_count(),), np.float32), mesh
    )
    np.testing.assert_allclose(float(jnp.sum(probe)), jax.device_count())
    # ... and the one-device-per-process clique the stop-sync collective
    # uses (Trainer._stop_due: process_allgather) — a DIFFERENT gloo
    # context than the all-devices one above; its first real use otherwise
    # lands right after the big train-step compile, where worker skew
    # blows the same 30 s window (the second observed failure mode)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.zeros((1,), np.int32))
    assert flags.shape[0] == int(nprocs)
    jax._src.distributed.global_state.client.wait_at_barrier(
        "drill_warmup", timeout_in_ms=600_000
    )

    host_dir = os.path.join(data_dir, f"host{pid}")
    fold = make_dataset(
        host_dir, np.random.default_rng(70 + int(pid)), n_per_label=1
    )
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1},
        np.random.default_rng(170 + int(pid)),
        num_threads=1, prefetch=1, to_device=False,
    )

    class PreemptAt(LoggerInterface):
        """Host SIGNAL_HOST receives a real SIGTERM at train step 3 — the
        production preemption path, not a direct request_stop call. Sent
        ONCE: the preemption handler deliberately escalates on a second
        signal (production semantics), so re-sending at every log
        boundary would hard-kill the worker mid-fit and deadlock its
        peers in the next collective (the drill's first failure mode)."""

        logs_images = False
        _sent = False

        def log_scalars(self, scalars, step, stage="train"):
            if (
                stage == "train" and step >= SIGNAL_STEP
                and int(pid) == SIGNAL_HOST and not PreemptAt._sent
            ):
                PreemptAt._sent = True
                os.kill(os.getpid(), sig.SIGTERM)

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
        jax.random.key(0), PATCH, logger_interface=PreemptAt(), mesh=mesh,
    )
    install_preemption_handler(trainer)

    # staggered precompile: process 0 AOT-compiles the two schedule-branch
    # programs into the shared persistent compile cache; peers sit at
    # coordination-service barriers (no gloo) and then load from disk at
    # fit time. Removes (a) 4 redundant concurrent compiles time-sharing
    # one core and (b) the compile-skew that otherwise puts the first
    # worker inside a gloo collective 30 s+ before its slowest peer.
    client = jax._src.distributed.global_state.client
    if int(pid) == 0:
        b_opt, b_sub = 2 * int(nprocs), 2 * int(nprocs)
        opt_s = jax.ShapeDtypeStruct((b_opt, *PATCH), np.int16)
        sub_s = jax.ShapeDtypeStruct((b_sub, *PATCH), np.int16)
        msk_s = jax.ShapeDtypeStruct((b_sub, *PATCH), np.int16)
        for branch in (trainer.steps.combined_step, trainer.steps.critic_step):
            branch.lower(trainer.state, opt_s, sub_s, msk_s).compile()
    client.wait_at_barrier("drill_precompiled", timeout_in_ms=600_000)

    state = trainer.fit(loaders)

    with open(out_path, "w") as fd:
        json.dump(
            {"final_step": int(jax.device_get(state.step)),
             "process_index": int(pid),
             "stop_requested": trainer.stop_requested},
            fd,
        )
    print("drill worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()

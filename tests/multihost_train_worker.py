"""Worker for the two-process train.py CLI test: joins the distributed
runtime, then runs the PRODUCTION CLI end to end (TrainManager -> per-host
fold shards + per-host batch division -> mesh-sharded steps -> process-0
model checkpoint + per-host data-stream sidecars).

Usage: python multihost_train_worker.py <coordinator> <nprocs> <pid> \
           <conf.py> <splits.pkl> <ckpt_root>
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
    coordinator, nprocs, pid, conf, splits, ckpt_root = sys.argv[1:7]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from contrast_gan_3d_tpu.parallel import multihost

    multihost.initialize(coordinator, int(nprocs), int(pid))

    import train as train_cli

    train_cli.main([
        "--conf", conf,
        "--cval-splits", splits,
        "--checkpoint-root", ckpt_root,
        "--logger", "none",
    ])
    print("train worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()

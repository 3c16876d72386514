"""Multi-host (multi-process) initialization helpers.

Scaling beyond one host follows the standard JAX recipe: every host runs the
same program, ``jax.distributed.initialize`` wires the processes into one
runtime, ``jax.devices()`` then spans the whole pod, and the SAME mesh /
sharding code used single-host (``parallel/mesh.py``) compiles programs whose
collectives ride ICI within a slice and DCN across slices — no NCCL/MPI
analogue to manage (SURVEY.md §2.2). Data feeding is per-host: each process
loads only the batch shard for its addressable devices
(``host_local_batch_slice``).

Tested for real in ``tests/test_multihost.py``: two OS processes (2 virtual
CPU devices each, gloo collectives) run one data-parallel WGAN step through
these helpers and match a single-device run — the same program shape as one
process per TPU host with collectives riding DCN.
"""

from typing import Optional

import jax
import numpy as np

from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join this process into the distributed JAX runtime. With no arguments,
    cluster auto-detection (TPU metadata / env vars) is used — the normal
    path on Cloud TPU pods."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def host_local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-indexed batch this host should load: batches
    shard over the leading axis in process order (matches ``put_batch``'s
    mesh layout built from ``jax.devices()``)."""
    per = global_batch // jax.process_count()
    assert global_batch % jax.process_count() == 0, (global_batch, jax.process_count())
    start = jax.process_index() * per
    return slice(start, start + per)


def host_fold_shard(fold) -> list:
    """This host's share of a fold's (path, label) entries — the "sharded
    HDF5 CT corpus" layout (BASELINE.json config #5): every process samples
    a disjoint patient subset (HDF5 corpus FILES in the fold expand to their
    members first, ``data/labeling.divide_scans_in_fold``), so no host reads
    another host's shard. Round-robin keeps per-label mixes balanced."""
    from contrast_gan_3d_tpu.data.hdf5 import shard_members
    from contrast_gan_3d_tpu.data.labeling import divide_scans_in_fold

    pi, pc = jax.process_index(), jax.process_count()
    shard = []
    for label, paths in divide_scans_in_fold(fold).items():
        mine = shard_members(paths, pi, pc)
        # every host needs every ScanType stream (one loader per label)
        assert mine, (
            f"label {label} has {len(paths)} patients — not enough for "
            f"{pc} hosts (process {pi} would have an empty stream)"
        )
        shard.extend((p, label) for p in mine)
    return shard


def make_global_batch(host_local: np.ndarray, mesh) -> jax.Array:
    """Assemble a globally-sharded device array from this host's local shard.
    Thin alias of ``parallel.mesh.put_batch``, which is process-aware — the
    Trainer's own feed path therefore works multi-host unchanged."""
    from contrast_gan_3d_tpu.parallel.mesh import put_batch

    return put_batch(host_local, mesh)

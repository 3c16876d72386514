"""Mesh construction + sharding helpers.

Scaling recipe (jax-ml scaling-book style): pick a mesh, annotate shardings,
let XLA insert the collectives. For this framework the natural axes are
``data`` (batch / patch-grid parallelism — the only parallelism the model
needs at ~1.2M total params, SURVEY.md §2.2) laid out over ICI.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over ``n_devices`` (default: all local)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def put_replicated(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh.

    Works on multi-process (multi-host) meshes too: ``device_put`` only
    accepts fully-addressable shardings, so there each process contributes
    its (identical) copy via ``make_array_from_process_local_data`` — for a
    replicated spec the process-local data IS the global data. Host-local
    *batch* shards go through ``multihost.make_global_batch`` instead."""
    sharding = replicate(mesh)
    if sharding.is_fully_addressable:
        return jax.device_put(tree, sharding)

    def _leaf(x):
        if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            raw = jax.make_array_from_process_local_data(
                sharding, np.asarray(jax.random.key_data(x))
            )
            return jax.random.wrap_key_data(raw, impl=jax.random.key_impl(x))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(_leaf, tree)


def put_batch(tree, mesh: Mesh):
    """Place host batches sharded on their leading axis."""
    return jax.device_put(tree, shard_batch(mesh))


def pad_batch_to_multiple(batch: np.ndarray, n: int) -> np.ndarray:
    """Pad a host batch's leading dim up to a multiple of ``n`` by repeating
    the first element (GSPMD requires evenly divisible shards for the simple
    layout). EVALUATION-path helper: the val steps carry (B,) 0/1 validity
    weights and run in eval mode, so the padding is exactly masked out.
    TRAIN batches must instead divide the mesh (Trainer._assemble raises) —
    repeated samples would bias the unmasked loss means and the BatchNorm
    batch statistics."""
    b = batch.shape[0]
    pad = (-b) % n
    if pad == 0:
        return batch
    return np.concatenate([batch, np.repeat(batch[:1], pad, axis=0)])

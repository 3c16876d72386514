"""Mesh construction + sharding helpers.

Scaling recipe (jax-ml scaling-book style): pick a mesh, annotate shardings,
let XLA insert the collectives. For this framework the natural axes are
``data`` (batch / patch-grid parallelism — the dominant axis at ~1.2M total
params, SURVEY.md §2.2) and optionally ``space`` (spatial partitioning of
the patch volume itself: GSPMD splits every conv with halo exchanges over
ICI, so patch sizes whose activations overflow one chip's HBM train on a
mesh — the training-side analogue of the sharded sliding-window inference,
SURVEY.md §2.3's "volume size is the long-context axis").
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def data_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over ``n_devices`` (default: all local)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):  # same contract as dp_sp_mesh
                raise ValueError(
                    f"data_mesh(n_devices={n_devices}): only "
                    f"{len(devices)} devices available"
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def dp_sp_mesh(
    n_data: int, n_space: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D mesh: ``data`` (batch) x ``space`` (first spatial dim of every
    patch). ``n_data=1`` gives pure spatial partitioning — one giant patch
    spread over all chips. Keep ``space`` the minor (fastest-varying) axis so
    conv halo exchanges ride neighbor ICI links."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)[: n_data * n_space]
    if devices.size != n_data * n_space:
        raise ValueError(
            f"need {n_data * n_space} devices for a ({n_data},{n_space}) "
            f"dp x sp mesh, have {devices.size}"
        )
    return Mesh(devices.reshape(n_data, n_space), (DATA_AXIS, SPACE_AXIS))


def mesh_axis_size(mesh: Mesh, axis: str) -> int:
    """Size of a named mesh axis (1 if the mesh does not have it)."""
    return mesh.shape.get(axis, 1)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(mesh: Mesh, axis: str = DATA_AXIS, ndim: Optional[int] = None) -> P:
    """PartitionSpec for a (B, W, ...) batch on ``mesh``: batch over ``axis``
    plus — when the mesh has a ``space`` axis — the first spatial dim over
    it. ``ndim`` truncates the spec for low-rank leaves (e.g. (B,) weights)."""
    axes = [axis]
    if SPACE_AXIS in mesh.axis_names and axis != SPACE_AXIS:
        axes.append(SPACE_AXIS)
    if ndim is not None:
        axes = axes[:ndim]
    return P(*axes)


def shard_batch(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis (and, on a
    dp x sp mesh, the first spatial dimension over the space axis)."""
    return NamedSharding(mesh, batch_spec(mesh, axis))


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
    """Place host batches sharded on their leading axis (and first spatial
    dim on a dp x sp mesh). Rank-aware: (B,) leaves (validity weights) only
    shard over ``data``.

    Multi-process meshes: each process passes its HOST-LOCAL batch shard
    (``multihost.host_fold_shard`` feeds per-host loaders) and the global
    array is assembled via ``make_array_from_process_local_data`` — the
    same call sites work single- and multi-host."""
    multiprocess = not NamedSharding(mesh, batch_spec(mesh)).is_fully_addressable

    def _leaf(x):
        sharding = NamedSharding(mesh, batch_spec(mesh, ndim=np.ndim(x)))
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    # rank-aware per leaf even on a 1-D mesh: a whole-tree device_put with
    # P('data') would reject rank-0/mixed-rank leaves that batch_spec handles
    return jax.tree.map(_leaf, tree)


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

"""Spatially-sharded sliding-window inference (multi-chip).

The reference fans inference out with a host ``mp.Pool`` of whole-model
replicas (``eval/utils.py:27-39``). The TPU-native analogue shards the PATCH
GRID of one volume across the mesh: every chip holds the (replicated) volume
in HBM and the generator params, processes its share of the Gaussian-blended
patch grid with the same scan/gather/scatter program as the single-chip path,
then the partial attenuation accumulators ``psum_scatter`` into per-chip
z-slabs over ICI and the normalization/subtraction run sharded. Near-linear
scaling in chips for the generator FLOPs; the collective moves ~1 volume of
bytes (half an all-reduce).
"""

import math
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler, Scaler
from contrast_gan_3d_tpu.ops.sliding_window import (
    _plan_grid,
    gaussian_weights,
    plan_stride,
    weight_field,
    weight_vectors,
)
from contrast_gan_3d_tpu.parallel.mesh import DATA_AXIS


def make_sharded_volume_corrector(
    generator_apply: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    patch_size: Tuple[int, int, int] = (128, 128, 128),
    overlap: float = 0.5,
    batch_size: int = 4,
    scaler: Scaler = FactorZeroCenterScaler(),
    sigma_scale: float = 0.125,
    dtype=jnp.float32,
    axis: str = DATA_AXIS,
    packed_io: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Build a jitted multi-chip ``correct(volume) -> corrected_volume``.

    ``packed_io=True`` mirrors the single-chip block-space corrector
    (``ops/sliding_window.make_volume_corrector``): the replicated volume is
    space-to-depth packed once, ``generator_apply`` consumes f2-packed
    patches and emits the f4-packed attenuation, each chip accumulates into
    a packed f4 accumulator, and the ``psum_scatter`` moves PACKED z-block
    slabs over ICI (same bytes, lane-friendly layout); each chip unpacks
    only its own slab."""
    # ONE definition of the stride/alignment rules, shared with the
    # single-chip corrector (ops/sliding_window.plan_stride) — the sharded
    # grid must never diverge from the weight_vectors normalization math
    patch_size, stride = plan_stride(patch_size, overlap, packed_io)
    n_dev = mesh.shape[axis]
    gw_np = gaussian_weights(patch_size, sigma_scale)

    @partial(jax.jit, static_argnums=1)
    def _correct(volume: jax.Array, shape: Tuple[int, int, int]) -> jax.Array:
        pad_cfg = [
            (
                max(0, patch_size[i] - shape[i]) // 2,
                max(0, patch_size[i] - shape[i]) - max(0, patch_size[i] - shape[i]) // 2,
            )
            for i in range(3)
        ]
        # the patch grid plans on the patch-size-padded shape (identical to
        # the single-chip corrector); z additionally pads to a device
        # multiple ONLY for the slab reduce-scatter — those tail rows are
        # touched by no patch and are cropped away
        if packed_io:
            # block-aligned dims so starts stay % 4 (slab granularity is
            # then a Z-BLOCK per chip: z pads to 4 * n_dev)
            for i in range(3):
                d = shape[i] + pad_cfg[i][0] + pad_cfg[i][1]
                extra = (-d) % 4
                pad_cfg[i] = (pad_cfg[i][0], pad_cfg[i][1] + extra)
        grid_shape = tuple(
            shape[i] + pad_cfg[i][0] + pad_cfg[i][1] for i in range(3)
        )
        z_extra = (-grid_shape[2]) % ((4 * n_dev) if packed_io else n_dev)
        pad_cfg[2] = (pad_cfg[2][0], pad_cfg[2][1] + z_extra)
        vol = scaler(volume.astype(jnp.float32))
        if any(p != (0, 0) for p in pad_cfg):
            vol = jnp.pad(vol, pad_cfg, mode="edge")
        padded_shape = tuple(vol.shape)

        grid = _plan_grid(grid_shape, patch_size, stride)
        n = grid.shape[0]
        # pad so batches split evenly over devices
        n_batches = math.ceil(n / batch_size)
        n_batches = math.ceil(n_batches / n_dev) * n_dev
        n_padded = n_batches * batch_size
        valid = np.zeros((n_padded,), np.float32)
        valid[:n] = 1.0
        starts = np.concatenate([grid, np.zeros((n_padded - n, 3), np.int32)])
        starts_b = jnp.asarray(starts.reshape(n_batches, batch_size, 3))
        valid_b = jnp.asarray(valid.reshape(n_batches, batch_size))
        gw = jnp.asarray(gw_np)

        def local(vol, starts_b, valid_b):
            """Per-chip scan over its share of patch batches — the batch body
            is the SAME make_*_patch_loop the single-chip corrector runs
            (with per-patch validity weights for the grid padding); the
            partial accumulators reduce-scatter into per-chip z-slabs (half
            the ICI bytes of an all-reduce, and the downstream
            normalization / subtraction run sharded)."""
            from contrast_gan_3d_tpu.ops.sliding_window import (
                make_direct_patch_loop,
                make_packed_patch_loop,
                scan_patch_batches_masked,
            )

            if packed_io:
                from contrast_gan_3d_tpu.ops.s2d_conv import (
                    depth_to_space, space_to_depth,
                )

                vp = space_to_depth(vol[None, ..., None].astype(dtype), 2)[0]
                gw_p = space_to_depth(gw[None, ..., None], 4)[0]
                acc_shape = tuple(d // 4 for d in padded_shape)
                run_batch = make_packed_patch_loop(
                    vp, patch_size, gw_p, generator_apply
                )
                atten_acc = jax.lax.pcast(
                    jnp.zeros((*acc_shape, 64), jnp.float32), (axis,), to="varying"
                )
                atten_acc = scan_patch_batches_masked(
                    run_batch, atten_acc, starts_b, valid_b
                )
                slab = jax.lax.psum_scatter(
                    atten_acc, axis, scatter_dimension=2, tiled=True
                )
                # unpack ONLY the local z-slab back to full resolution
                return depth_to_space(slab[None], 4)[0, ..., 0]

            # accumulator is device-varying (each chip sums its own share)
            run_batch = make_direct_patch_loop(
                vol, patch_size, gw, generator_apply, dtype
            )
            atten_acc = jax.lax.pcast(
                jnp.zeros(padded_shape, jnp.float32), (axis,), to="varying"
            )
            atten_acc = scan_patch_batches_masked(
                run_batch, atten_acc, starts_b, valid_b
            )
            return jax.lax.psum_scatter(
                atten_acc, axis, scatter_dimension=2, tiled=True
            )

        atten_acc = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(None, None, axis),
        )(vol, starts_b, valid_b)

        # normalization field as a separable outer product (ops/
        # sliding_window.weight_vectors): grid planned on grid_shape; the
        # z slab-padding tail (touched by no patch, cropped below) extends
        # with 1s — any positive value works there since atten_acc is 0
        wx, wy, wz = weight_vectors(grid_shape, patch_size, stride, sigma_scale)
        z_extra = padded_shape[2] - grid_shape[2]
        if z_extra:
            wz = np.concatenate([wz, np.ones(z_extra, np.float32)])
        # sharded elementwise tail: GSPMD keeps it z-slab-parallel
        corrected = vol - atten_acc / weight_field((wx, wy, wz))
        corrected = jax.lax.dynamic_slice(
            corrected, tuple(p[0] for p in pad_cfg), shape
        )
        return scaler.unscale(corrected)

    def correct(volume: jax.Array) -> jax.Array:
        return _correct(volume, tuple(volume.shape))

    return correct

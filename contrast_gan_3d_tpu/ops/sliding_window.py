"""Jitted sliding-window full-volume correction with Gaussian patch blending.

TPU-native re-design of the reference's patchly ``GridSampler`` +
``Aggregator`` + torch DataLoader inference stack
(``contrast_gan_3D/eval/CCTAContrastCorrector.py:60-81``): instead of a host
process tiling the volume, a worker pool shipping patches one batch at a time
and a scatter aggregator on device, the ENTIRE correction — patch gather,
HU scaling, generator forward, Gaussian-weighted attenuation accumulation and
final normalization — is ONE compiled XLA program. The volume lives in HBM;
a ``lax.scan`` walks the (static) patch grid in batches, gathering patches
with ``dynamic_slice`` and accumulating weighted attenuation with
read-modify-write ``dynamic_update_slice`` — XLA pipelines the generator
convs (MXU) against the gather/scatter (HBM DMA) with no host round-trips.

Numerics: we aggregate the *attenuation map* (not the corrected patches) and
subtract once at the end — ``corrected = volume - sum(w*atten)/sum(w)`` — so
a zero generator yields the exact identity and blending never touches the
raw HU values. Gaussian blending weights (sigma = patch/8, nnU-Net style)
down-weight patch borders, removing the seam artifacts of patchly's uniform
averaging (reference aggregates with equal weights).
"""

from functools import lru_cache, partial
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler, Scaler


@lru_cache(maxsize=32)
def weight_vectors(
    padded_shape: Tuple[int, ...],
    patch_size: Tuple[int, ...],
    stride: Tuple[int, ...],
    sigma_scale: float,
) -> Tuple[np.ndarray, ...]:
    """Per-axis window-sum vectors whose outer product IS the blending
    normalization field sum_patches(window).

    The patch grid is a Cartesian product of per-axis starts
    (:func:`_plan_grid`) and the Gaussian window a product of per-axis
    windows (:func:`gaussian_weights`), so the full normalization field is
    exactly separable: field[x, y, z] = wx[x] * wy[y] * wz[z] with
    w_i = sum over that axis' starts of the shifted 1-D window. The callers
    therefore never materialize (or cache, or — in ``eval/export.py``
    artifacts — embed as a 100s-of-MB constant) the dense (W, H, D) field:
    the outer product fuses into the final normalize/subtract for free.
    Host numpy: a few KB per shape, trace-safe constants under jit/export."""
    vecs = []
    for dim, p, s in zip(padded_shape, patch_size, stride):
        g = gaussian_weights_1d(p, sigma_scale)
        acc = np.zeros(dim, np.float64)
        for start in grid_starts(dim, p, s):
            acc[start : start + p] += g
        vecs.append(acc.astype(np.float32))
    return tuple(vecs)


def weight_field(
    weight_vecs: Sequence[jax.Array], extra_dims: int = 0
) -> jax.Array:
    """Broadcasted outer product of the per-axis vectors (rank = len(vecs) +
    ``extra_dims`` trailing axes, e.g. the packed (..., 64) block channel).
    Returns a lazily-fused expression — never materialized on its own."""
    n = len(weight_vecs) + extra_dims
    out = 1.0
    for i, v in enumerate(weight_vecs):
        shape = [1] * n
        shape[i] = -1
        out = out * jnp.asarray(v).reshape(shape)
    return out


def grid_starts(dim: int, patch: int, stride: int) -> List[int]:
    """Start offsets covering [0, dim) with a final clamped-to-edge window
    (every voxel covered, last window ends exactly at ``dim``)."""
    if dim <= patch:
        return [0]
    starts = list(range(0, dim - patch, stride))
    starts.append(dim - patch)
    return starts


def gaussian_weights_1d(p: int, sigma_scale: float = 0.125) -> np.ndarray:
    """One axis of the blending window: peak-normalized Gaussian, floored at
    1e-2 per axis (so the 3-D product floors at 1e-6, like the historical
    3-D clamp, WITHOUT breaking the separability :func:`weight_vectors`
    relies on — a clamp applied to the 3-D product would not factor)."""
    center = (p - 1) / 2.0
    sigma = max(p * sigma_scale, 1e-8)
    x = np.arange(p, dtype=np.float64)
    g = np.exp(-0.5 * ((x - center) / sigma) ** 2)
    return np.maximum(g / g.max(), 1e-2)


def gaussian_weights(patch_size: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Separable Gaussian blending window (product of per-axis
    :func:`gaussian_weights_1d`), peak-normalized, strictly > 0. The SAME
    per-axis windows feed :func:`weight_vectors`, so scatter weights and the
    normalization field cancel exactly on single-covered voxels."""
    ws = [gaussian_weights_1d(p, sigma_scale) for p in patch_size]
    w = ws[0]
    for g in ws[1:]:
        w = w[..., None] * g
    return w.astype(np.float32)


def plan_stride(
    patch_size: Sequence[int], overlap: float, packed_io: bool
) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """(patch_size, stride) for a sliding-window corrector — THE single
    definition of the stride/alignment rules shared by the single-chip
    (``make_volume_corrector``) and sharded (``parallel/inference``)
    builders: stride = round(p * (1 - overlap)); packed grids additionally
    require patch % 4 == 0 and snap strides DOWN to multiples of 4 (never
    less overlap than requested)."""
    patch_size = tuple(int(p) for p in patch_size)
    stride = tuple(max(1, int(round(p * (1.0 - overlap)))) for p in patch_size)
    if packed_io:
        if any(p % 4 for p in patch_size):
            raise ValueError(
                f"packed_io requires patch_size % 4 == 0, got {patch_size}"
            )
        if any(s < 4 for s in stride):
            raise ValueError(
                f"packed_io needs stride >= 4 (got {stride}): overlap "
                f"{overlap} is too extreme for block-aligned gathers — use "
                "the direct corrector"
            )
        stride = tuple(s - s % 4 for s in stride)
    return patch_size, stride


def _plan_grid(
    shape: Tuple[int, int, int], patch_size: Tuple[int, int, int], stride: Tuple[int, int, int]
) -> np.ndarray:
    """(N, 3) int32 array of patch start corners covering ``shape``."""
    axes = [grid_starts(shape[i], patch_size[i], stride[i]) for i in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    return grid.astype(np.int32)


def make_direct_patch_loop(vol, patch_size, gw, generator_apply, dtype):
    """The ONE definition of the direct-layout gather/forward/scatter batch
    body, shared by the single-chip corrector and the sharded corrector
    (``parallel/inference``). Returns ``run_batch(acc, starts, valid=None)``
    — ``valid`` is a per-patch 0/1 weight vector for grids padded to uniform
    batches (the sharded path); ``None`` skips the multiply entirely."""

    def gather_one(start):
        return jax.lax.dynamic_slice(vol, start, patch_size)

    def run_batch(atten_acc, starts, valid=None):
        patches = jax.vmap(gather_one)(starts)  # (B, *patch)
        atten = generator_apply(patches.astype(dtype)[..., None])[..., 0]
        if atten.shape[1:] != patch_size:
            # non-divisible patch sizes: the generator ceil-rounds its
            # output; resize back (reference auto-inserts nn.Upsample,
            # CCTAContrastCorrector.py:42-52)
            atten = jax.image.resize(
                atten, (atten.shape[0], *patch_size), method="trilinear"
            )
        atten = atten.astype(jnp.float32)

        def scatter(i, a_acc):
            s = starts[i]
            w = gw if valid is None else gw * valid[i]
            cur_a = jax.lax.dynamic_slice(a_acc, s, patch_size)
            return jax.lax.dynamic_update_slice(a_acc, cur_a + atten[i] * w, s)

        return jax.lax.fori_loop(0, starts.shape[0], scatter, atten_acc)

    return run_batch


def make_packed_patch_loop(vp, patch_size, gw_p, generator_apply):
    """Block-space counterpart of :func:`make_direct_patch_loop`: ``vp`` is
    the f2-packed volume, ``generator_apply`` consumes f2-packed patches and
    emits the f4-packed attenuation, and the accumulator/blending window
    (``gw_p``) live f4-packed. Shared by both correctors."""
    p2 = tuple(p // 2 for p in patch_size)
    p4 = tuple(p // 4 for p in patch_size)

    def gather_one(start):
        s2 = start // 2
        return jax.lax.dynamic_slice(vp, (s2[0], s2[1], s2[2], 0), (*p2, 8))

    def run_batch(atten_acc, starts, valid=None):
        patches = jax.vmap(gather_one)(starts)  # (B, *p2, 8)
        atten = generator_apply(patches).astype(jnp.float32)  # (B, *p4, 64)

        def scatter(i, a_acc):
            s4 = starts[i] // 4
            pos = (s4[0], s4[1], s4[2], 0)
            w = gw_p if valid is None else gw_p * valid[i]
            cur = jax.lax.dynamic_slice(a_acc, pos, (*p4, 64))
            return jax.lax.dynamic_update_slice(a_acc, cur + atten[i] * w, pos)

        return jax.lax.fori_loop(0, starts.shape[0], scatter, atten_acc)

    return run_batch


def scan_patch_batches(run_batch, atten_acc, starts_b, rem_starts=None):
    """Drive ``run_batch`` over the batched grid: a ``lax.scan`` over the
    full batches, then the trailing remainder (if any) as ONE smaller
    program instead of a zero-weighted padded batch."""
    if starts_b.shape[0]:
        atten_acc, _ = jax.lax.scan(
            lambda a, s: (run_batch(a, s), None), atten_acc, starts_b
        )
    if rem_starts is not None and rem_starts.shape[0]:
        atten_acc = run_batch(atten_acc, rem_starts)
    return atten_acc


def scan_patch_batches_masked(run_batch, atten_acc, starts_b, valid_b):
    """Masked-grid variant (the sharded corrector): uniform batches with a
    per-patch 0/1 validity vector instead of a remainder batch."""
    atten_acc, _ = jax.lax.scan(
        lambda a, inp: (run_batch(a, inp[0], inp[1]), None),
        atten_acc, (starts_b, valid_b),
    )
    return atten_acc


def make_volume_corrector(
    generator_apply: Callable[[jax.Array], jax.Array],
    patch_size: Tuple[int, int, int] = (128, 128, 128),
    overlap: float = 0.5,
    batch_size: int = 4,
    scaler: Scaler = FactorZeroCenterScaler(),
    sigma_scale: float = 0.125,
    dtype=jnp.float32,
    packed_io: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Build a jitted ``correct(volume) -> corrected_volume`` function.

    ``generator_apply``: params-baked apply, (B, *patch, 1) scaled -> (B,
    *patch, 1) attenuation in (-1, 1). Retraces once per distinct volume
    shape (pad volumes to canonical shapes host-side to avoid recompiles).

    ``packed_io=True`` runs the whole loop in space-to-depth block space
    (``ops/packed``): the volume is packed f=2 ONCE, patches are gathered as
    block slices, ``generator_apply`` must then consume f2-packed patches
    ((B, p/2, p/2, p/2, 8)) and emit the f4-packed attenuation ((B, p/4,
    p/4, p/4, 64)) — i.e. be built from ``ResnetGenerator(layout="packed",
    packed_input=True, packed_output=True)`` — and blending/scatter happen
    on the f4 accumulator. Patch sizes must divide 4; strides are snapped
    DOWN to multiples of 4 (never less overlap than requested).
    """
    patch_size, stride = plan_stride(patch_size, overlap, packed_io)
    gw_np = gaussian_weights(patch_size, sigma_scale)

    @partial(jax.jit, static_argnums=1)
    def _correct(volume: jax.Array, shape: Tuple[int, int, int]) -> jax.Array:
        # pad dims smaller than the patch (centered, edge values)
        pad_cfg = [
            (
                max(0, patch_size[i] - shape[i]) // 2,
                max(0, patch_size[i] - shape[i]) - max(0, patch_size[i] - shape[i]) // 2,
            )
            for i in range(3)
        ]
        vol = scaler(volume.astype(jnp.float32))
        if any(p != (0, 0) for p in pad_cfg):
            vol = jnp.pad(vol, pad_cfg, mode="edge")
        padded_shape = tuple(vol.shape)

        grid = _plan_grid(padded_shape, patch_size, stride)
        # full batches scan; the trailing n % batch_size patches run as ONE
        # smaller program instead of a zero-weighted padded batch (up to
        # (batch_size-1)/n of the generator FLOPs were wasted on padding)
        n = grid.shape[0]
        n_full = n // batch_size
        rem = n - n_full * batch_size
        starts_b = jnp.asarray(grid[: n_full * batch_size].reshape(n_full, batch_size, 3))

        run_batch = make_direct_patch_loop(
            vol, patch_size, jnp.asarray(gw_np), generator_apply, dtype
        )
        atten_acc = scan_patch_batches(
            run_batch,
            jnp.zeros(padded_shape, jnp.float32),
            starts_b,
            jnp.asarray(grid[n_full * batch_size :]) if rem else None,
        )
        wvecs = weight_vectors(padded_shape, patch_size, stride, sigma_scale)
        corrected = vol - atten_acc / weight_field(wvecs)
        # crop padding back off
        corrected = jax.lax.dynamic_slice(
            corrected, tuple(p[0] for p in pad_cfg), shape
        )
        return scaler.unscale(corrected)

    @partial(jax.jit, static_argnums=1)
    def _correct_packed(
        volume: jax.Array, shape: Tuple[int, int, int]
    ) -> jax.Array:
        from contrast_gan_3d_tpu.ops.s2d_conv import depth_to_space, space_to_depth

        tgt = _packed_padded_shape(shape)
        pad_cfg = [
            ((tgt[i] - shape[i]) // 2, (tgt[i] - shape[i]) - (tgt[i] - shape[i]) // 2)
            for i in range(3)
        ]
        vol = scaler(volume.astype(jnp.float32))
        if any(p != (0, 0) for p in pad_cfg):
            vol = jnp.pad(vol, pad_cfg, mode="edge")
        padded_shape = tuple(vol.shape)

        grid = _plan_grid(padded_shape, patch_size, stride)  # all starts % 4 == 0
        n = grid.shape[0]
        n_full = n // batch_size
        rem = n - n_full * batch_size
        starts_b = jnp.asarray(grid[: n_full * batch_size].reshape(n_full, batch_size, 3))

        # the volume, the blending window and the accumulator all live packed
        vp = space_to_depth(vol[None, ..., None].astype(dtype), 2)[0]
        gw_p = space_to_depth(jnp.asarray(gw_np)[None, ..., None], 4)[0]  # (*p4, 64)
        acc_shape = tuple(d // 4 for d in padded_shape)
        run_batch = make_packed_patch_loop(vp, patch_size, gw_p, generator_apply)
        atten_acc = scan_patch_batches(
            run_batch,
            jnp.zeros((*acc_shape, 64), jnp.float32),
            starts_b,
            jnp.asarray(grid[n_full * batch_size :]) if rem else None,
        )
        atten_full = depth_to_space(atten_acc[None], 4)[0, ..., 0]
        wvecs = weight_vectors(padded_shape, patch_size, stride, sigma_scale)
        corrected = vol - atten_full / weight_field(wvecs)
        corrected = jax.lax.dynamic_slice(
            corrected, tuple(p[0] for p in pad_cfg), shape
        )
        return scaler.unscale(corrected)

    def _packed_padded_shape(shape: Tuple[int, int, int]) -> Tuple[int, int, int]:
        # >= patch on every axis AND divisible by 4 (block-aligned grid)
        return tuple(-(-max(s, p) // 4) * 4 for s, p in zip(shape, patch_size))

    def correct(volume: jax.Array) -> jax.Array:
        """Correct one (W, H, D) HU volume; returns float32 HU volume."""
        shape = tuple(volume.shape)
        if packed_io:
            return _correct_packed(volume, shape)
        return _correct(volume, shape)

    return correct


def num_patches(
    shape: Sequence[int],
    patch_size: Sequence[int],
    overlap: float = 0.5,
    packed_io: bool = False,
) -> int:
    """Patch count the corrector will run for a given volume shape. With
    ``packed_io`` (the production default layout) the stride snaps DOWN to a
    multiple of 4 and dims edge-pad up to block multiples — pass it to count
    the grid that corrector actually executes."""
    stride = [max(1, int(round(p * (1.0 - overlap)))) for p in patch_size]
    padded = [max(s, p) for s, p in zip(shape, patch_size)]
    if packed_io:
        if any(s < 4 for s in stride):  # the corrector refuses this config
            raise ValueError(
                f"packed_io needs stride >= 4 (got {tuple(stride)}): overlap "
                f"{overlap} is too high for patch {tuple(patch_size)}"
            )
        stride = [s - s % 4 for s in stride]
        padded = [d + ((-d) % 4) for d in padded]
    return int(
        np.prod([len(grid_starts(padded[i], patch_size[i], stride[i])) for i in range(3)])
    )

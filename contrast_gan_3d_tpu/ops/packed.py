"""Block-space ("packed") 3D convolution pipeline — layout-pure TPU execution.

Why this exists (measured on the bench chip, see PERF.md): the generator's
full-resolution stages dominate its forward latency, and the cost is NOT the
MXU math — it is the *glue*: 3-axis reflect pads (~14 ms per 537 MB tensor),
XLA's lowering of small-channel strided convs (~10x over the memory+FLOP
roofline for the 16->32 stride-2 conv at 128^3), and repeated
space-to-depth/depth-to-space round trips between stages. This module keeps
activations in space-to-depth block layout (``ops/s2d_conv.space_to_depth``
order) ACROSS stage boundaries and expresses every full-resolution conv as a
dense VALID block-space conv with an MXU-shaped contraction:

- ``packed_conv3d``: general block conv. Input packed ``f_in``, output packed
  ``f_out``, original stride ``s`` (block stride ``s*f_out/f_in`` must be a
  positive integer). Torch-style zero padding ``p`` per side is exact: the
  input is left/right-padded with whole zero blocks and the sub-block
  alignment offset ``o = L*f_in - p`` is folded into the transformed kernel
  (``A[q,d,r,T] = [f_in*q + d == s*r + T + o]`` per axis) — taps that would
  read beyond the true ``p``-pad have zero weight by construction, so whole-
  block padding never changes the math.
- ``reflect_pad_packed``: reflect padding constructed *in packed space* — the
  pad slabs are channel-axis flips + block-level slices of the first/last
  blocks (a reflected voxel's value lives at a known (block, within-block)
  coordinate), so no full-resolution round trip is needed.
- ``packed_affine``: per-true-channel scale/shift (BatchNorm inference
  collapse) on a packed tensor via a (f^3, C) channel view.

The transformed kernels are linear (0/1 scatter) functions of the true conv
weights, built at trace time — parameters keep their reference shapes, and
autodiff through the transform yields exact true-weight gradients, so the
packed path is usable in training steps too.

Numerical parity with the direct convs is to fp associativity; locked by
tests/test_packed.py. Replaces nothing: the direct path stays the reference
implementation (reference semantics: contrast_gan_3D/model/generator.py:9-90).
"""

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _axis_map_packed(
    k: int, f_in: int, f_out: int, s: int, o: int
) -> Tuple[np.ndarray, int]:
    """(K, f_in, f_out, k) 0/1 tensor A[q, d, r, T] = [f_in*q + d == s*r + T + o].

    Derivation: out voxel x = f_out*X + r reads padded-input index
    j = s*x + T + o; j's block is B = b*X + q with b = s*f_out/f_in and
    q = (s*r + T + o) // f_in in [0, K).
    """
    K = (s * (f_out - 1) + k - 1 + o) // f_in + 1
    A = np.zeros((K, f_in, f_out, k), np.float32)
    for q in range(K):
        for d in range(f_in):
            for r in range(f_out):
                T = f_in * q + d - s * r - o
                if 0 <= T < k:
                    A[q, d, r, T] = 1.0
    return A, K


def transform_kernel_packed(
    w: jax.Array,
    f_in: int,
    f_out: int,
    s: int = 1,
    o: Sequence[int] = (0, 0, 0),
) -> jax.Array:
    """(kx,ky,kz,Ci,Co) true kernel -> (Kx,Ky,Kz, f_in^3*Ci, f_out^3*Co)
    block-space kernel. Channel layouts follow ``space_to_depth``: input
    (dx,dy,dz,ci) d-major, output (rx,ry,rz,co) r-major."""
    kx, ky, kz, ci, co = w.shape
    Ax, _ = _axis_map_packed(kx, f_in, f_out, s, int(o[0]))
    Ay, _ = _axis_map_packed(ky, f_in, f_out, s, int(o[1]))
    Az, _ = _axis_map_packed(kz, f_in, f_out, s, int(o[2]))
    # W'[qx,dx,rx, qy,dy,ry, qz,dz,rz, ci,co]
    wp = jnp.einsum(
        "adrx,besy,cftz,xyzio->adrbescftio",
        jnp.asarray(Ax), jnp.asarray(Ay), jnp.asarray(Az), w,
    )
    # -> (qx,qy,qz, dx,dy,dz,ci, rx,ry,rz,co)
    wp = wp.transpose(0, 3, 6, 1, 4, 7, 9, 2, 5, 8, 10)
    Kx, Ky, Kz = Ax.shape[0], Ay.shape[0], Az.shape[0]
    return wp.reshape(Kx, Ky, Kz, f_in**3 * ci, f_out**3 * co)


def _block_flip(xp: jax.Array, f: int, c: int, axis: int) -> jax.Array:
    """Full-resolution flip of a packed tensor along spatial ``axis``
    (0/1/2): reverse the block order AND the within-block position on that
    axis (a channel-dim permutation through a (fx,fy,fz,c) view)."""
    xp = jnp.flip(xp, axis=1 + axis)
    v = xp.reshape(*xp.shape[:4], f, f, f, c)
    v = jnp.flip(v, axis=4 + axis)
    return v.reshape(*xp.shape[:4], f**3 * c)


def reflect_pad_packed(
    xp: jax.Array, f: int, p: int, axes: Sequence[int] = (0, 1, 2)
) -> Tuple[jax.Array, int]:
    """Reflect-pad a packed (B, X, Y, Z, f^3*C) tensor by ``p`` full-res
    voxels per side along each axis, entirely in packed space.

    Pads whole blocks: L = ceil(p/f) blocks per side; the leading ``o =
    L*f - p`` full-res positions of the left pad hold values that a
    subsequent ``packed_conv3d(..., o=o)`` provably never reads. Returns
    (padded, o).

    Construction per axis operates on (L+1)-block BOUNDARY SLABS only (the
    pad content is a function of the first/last L+1 blocks; flipping or
    rolling the whole tensor — the original implementation — cost 200+ ms
    at f=4/1024 ch on the bench chip, the slabs are ~1 ms):

      left pad[j]  = x[L*f - j]   (j = 0..Lf-1; leading o entries unused)
                   = flip(head)[f-1 + j]          head = x[:L+1 blocks]
                   = roll_fwd(flip(head))[f + j]  -> blocks [1, 1+L)
      right pad[j] = x[N*f - 2 - j]
                   = flip(tail)[j + 1]            tail = x[-(L+1):]
                   = roll_bwd(flip(tail))[j]      -> blocks [0, L)
    """
    c = xp.shape[-1] // f**3
    L = -(-p // f)
    o = L * f - p
    for axis in axes:
        n_blocks = xp.shape[1 + axis]
        if n_blocks < L + 1:
            raise ValueError(f"axis {axis}: {n_blocks} blocks < L+1={L + 1}")
        head = jax.lax.slice_in_dim(xp, 0, L + 1, axis=1 + axis)
        tail = jax.lax.slice_in_dim(xp, n_blocks - (L + 1), n_blocks, axis=1 + axis)
        left = jax.lax.slice_in_dim(
            _roll_one(_block_flip(head, f, c, axis), f, c, axis),
            1, 1 + L, axis=1 + axis,
        )
        right = jax.lax.slice_in_dim(
            _roll_one(_block_flip(tail, f, c, axis), f, c, axis, backward=True),
            0, L, axis=1 + axis,
        )
        xp = jnp.concatenate([left, xp, right], axis=1 + axis)
    return xp, o


def _roll_one(
    xp: jax.Array, f: int, c: int, axis: int, backward: bool = False
) -> jax.Array:
    """Shift a packed tensor by ONE full-res voxel along ``axis`` (circular
    at block granularity — callers only consume regions where the wrap is
    never read). Forward: out[pos] = x[pos-1]."""
    v = xp.reshape(*xp.shape[:4], f, f, f, c)
    pax, vax = 1 + axis, 4 + axis
    if not backward:
        # within-block: position r takes value from r-1; r=0 takes f-1 of
        # the previous block
        shifted = jnp.roll(v, 1, axis=vax)  # r -> r+1, r=0 gets old r=f-1
        # the r=0 entries must come from the PREVIOUS block's r=f-1, which
        # jnp.roll placed there only within the same block — fix by rolling
        # the r=0 slice one block forward
        idx = [slice(None)] * v.ndim
        idx[vax] = slice(0, 1)
        first = shifted[tuple(idx)]
        first = jnp.roll(first, 1, axis=pax)
        shifted = _set_slice(shifted, first, vax, 0)
    else:
        shifted = jnp.roll(v, -1, axis=vax)  # r -> r-1; r=f-1 gets old r=0
        idx = [slice(None)] * v.ndim
        idx[vax] = slice(f - 1, f)
        last = shifted[tuple(idx)]
        last = jnp.roll(last, -1, axis=pax)
        shifted = _set_slice(shifted, last, vax, f - 1)
    return shifted.reshape(*xp.shape[:4], f**3 * c)


def _set_slice(v: jax.Array, val: jax.Array, axis: int, index: int) -> jax.Array:
    parts = []
    n = v.shape[axis]
    if index > 0:
        parts.append(jax.lax.slice_in_dim(v, 0, index, axis=axis))
    parts.append(val)
    if index + 1 < n:
        parts.append(jax.lax.slice_in_dim(v, index + 1, n, axis=axis))
    return jnp.concatenate(parts, axis=axis)


def packed_conv3d(
    xp: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    f_in: int,
    f_out: int,
    stride: int = 1,
    pad: int = 0,
    out_blocks: Tuple[int, int, int],
    o: Optional[Sequence[int]] = None,
    precision=None,
) -> jax.Array:
    """SAME/torch-padded 3D conv executed as a VALID block-space conv.

    xp: (B, Xb, Yb, Zb, f_in^3*Ci) packed input (``space_to_depth`` layout).
    w:  (k, k, k, Ci, Co) TRUE conv kernel (reference parameter shape).
    pad: torch-style zero padding per side at full resolution. Ignored when
    ``o`` is given (the input is then already padded, e.g. by
    :func:`reflect_pad_packed`, and ``o`` is that pad's alignment offset).
    ``out_blocks``: the output's block-space spatial dims (the caller knows
    the intended full-res output extent; the padded input may overhang it).
    Output: (B, Xb', Yb', Zb', f_out^3*Co) packed with f_out.
    """
    b_stride = stride * f_out
    assert b_stride % f_in == 0, (stride, f_in, f_out)
    b_stride //= f_in

    if o is None:
        # zero-pad whole blocks; fold the offset into the kernel
        L = -(-pad // f_in)
        off = L * f_in - pad
        if L:
            pads = [(0, 0), (L, L), (L, L), (L, L), (0, 0)]
            xp = jnp.pad(xp, pads)
        o3 = (off, off, off)
    else:
        o3 = tuple(int(v) for v in o)

    wp = transform_kernel_packed(w, f_in, f_out, stride, o3).astype(xp.dtype)
    K = wp.shape[:3]

    # right-extend with zero blocks if the VALID conv needs more input
    # (extension blocks are never read with nonzero weight — see module doc)
    need = [
        (out_blocks[i] - 1) * b_stride + K[i] for i in range(3)
    ]
    extra = [max(0, need[i] - xp.shape[1 + i]) for i in range(3)]
    if any(extra):
        xp = jnp.pad(
            xp, [(0, 0)] + [(0, e) for e in extra] + [(0, 0)]
        )

    out = jax.lax.conv_general_dilated(
        xp, wp,
        window_strides=(b_stride,) * 3,
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
        preferred_element_type=xp.dtype,
    )
    out = out[:, : out_blocks[0], : out_blocks[1], : out_blocks[2]]
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), f_out**3)
    return out


def packed_tconv3d(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 2,
    convention: str = "same",
    precision=None,
) -> jax.Array:
    """Stride-s transpose conv with UNPACKED input, PACKED (f=s) output: the
    dense stride-1 conv of ``ops/s2d_conv.d2s_tconv3d`` with the final
    depth-to-space omitted — the packed output channel layout (rx,ry,rz,co)
    r-major IS the ``space_to_depth`` f=s layout of the full-res result.

    Under the "torch" convention the placement shift (full[1:sN+1]) is a
    one-voxel roll, applied in packed space via the same channel-view
    machinery as :func:`_roll_one` (backward shift).
    """
    from contrast_gan_3d_tpu.ops.s2d_conv import _tconv_axis_map

    kx, ky, kz, ci, co = w.shape
    s = stride
    A = _tconv_axis_map(kx, s)
    wp = jnp.einsum(
        "jrx,ksy,ltz,xyzio->jklirsto",
        jnp.asarray(A), jnp.asarray(_tconv_axis_map(ky, s)),
        jnp.asarray(_tconv_axis_map(kz, s)), w,
    )
    K = A.shape[0]
    wp = wp.reshape(K, K, K, ci, s**3 * co).astype(x.dtype)
    hi = 1 if convention == "torch" else 0
    xpad = jnp.pad(x, ((0, 0), (K - 1, hi), (K - 1, hi), (K - 1, hi), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xpad, wp, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
        preferred_element_type=x.dtype,
    )
    if convention == "torch":
        n = x.shape[1:4]
        # full[1 : sN+1] in packed space: shift one full-res voxel backward
        # per axis, then drop the trailing extra block
        for axis in range(3):
            out = _roll_one(out, s, co, axis, backward=True)
        out = out[:, : n[0], : n[1], : n[2]]
    elif convention != "same":
        raise ValueError(f"unknown convention {convention!r}")
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), s**3)
    return out


def _tconv_f4_axis_map(k: int, s: int, torch: bool) -> np.ndarray:
    """(K4, 2s, k) composite map for a stride-s transpose conv emitting
    2s-packed output directly: C[t, d, T] accumulates the base tconv map
    A[j, r, T] at block tap t = a + j where the 2s-digit position
    pos = d (+1 under the torch one-voxel shift) splits as (a, r) =
    divmod(pos, s). K4 = K + 1 (+1 more for torch's cross-block carry)."""
    A = _np_tconv_axis_map(k, s)
    K = A.shape[0]
    K4 = K + 1 + (1 if torch else 0)
    C = np.zeros((K4, 2 * s, k), np.float32)
    for d in range(2 * s):
        a, r = divmod(d + (1 if torch else 0), s)
        for j in range(K):
            C[a + j, d, :] += A[j, r, :]
    return C


def _np_tconv_axis_map(k: int, s: int) -> np.ndarray:
    from contrast_gan_3d_tpu.ops.s2d_conv import _tconv_axis_map

    return _tconv_axis_map(k, s)


def packed_tconv3d_f4(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 2,
    convention: str = "same",
    precision=None,
) -> jax.Array:
    """Stride-s transpose conv with UNPACKED input and f=2s-PACKED output:
    like :func:`packed_tconv3d` but absorbing a 2^3 neighbourhood of
    s-blocks into the channels (a stride-2 block conv), so the consumer gets
    the f4 layout WITHOUT a repack transpose (measured 35 ms for the
    128^3/batch-8 up_0 output on the bench chip). Spatial dims must be even.
    Output: (B, X/2, Y/2, Z/2, (2s)^3 * Co)."""
    kx, ky, kz, ci, co = w.shape
    s = stride
    if any(d % 2 for d in x.shape[1:4]):
        raise ValueError(f"spatial dims {x.shape[1:4]} must be even")
    torch = convention == "torch"
    if not torch and convention != "same":
        raise ValueError(f"unknown convention {convention!r}")
    K = (kx - 1) // s + 1
    Cx = jnp.asarray(_tconv_f4_axis_map(kx, s, torch))
    Cy = jnp.asarray(_tconv_f4_axis_map(ky, s, torch))
    Cz = jnp.asarray(_tconv_f4_axis_map(kz, s, torch))
    wp = jnp.einsum("aux,bvy,cwz,xyzio->abciuvwo", Cx, Cy, Cz, w)
    K4 = Cx.shape[0]
    f3 = (2 * s) ** 3
    wp = wp.reshape(K4, K4, K4, ci, f3 * co).astype(x.dtype)
    hi = 1 if torch else 0
    xpad = jnp.pad(x, ((0, 0), (K - 1, hi), (K - 1, hi), (K - 1, hi), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xpad, wp, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), f3)
    return out


def repack(xp: jax.Array, f: int, m: int, c: int) -> jax.Array:
    """(B, mX, mY, mZ, f^3*c) f-packed -> (B, X, Y, Z, (m*f)^3*c) mf-packed:
    absorb an m^3 block neighbourhood into the channel dim (pure transpose —
    the full-res coordinate (m*f)*X + f*a + d maps block a, within-block d to
    the mf-block digit f*a + d, keeping the d-major (dx, dy, dz, c) layout)."""
    b, Xm, Ym, Zm, _ = xp.shape
    X, Y, Z = Xm // m, Ym // m, Zm // m
    v = xp.reshape(b, X, m, Y, m, Z, m, f, f, f, c)
    # -> (b, X, Y, Z, ax, dx, ay, dy, az, dz, c)
    v = v.transpose(0, 1, 3, 5, 2, 7, 4, 8, 6, 9, 10)
    return v.reshape(b, X, Y, Z, (m * f) ** 3 * c)


def unpack_repack(xp: jax.Array, f: int, m: int, c: int) -> jax.Array:
    """Inverse of :func:`repack`: mf-packed -> f-packed."""
    b, X, Y, Z, _ = xp.shape
    v = xp.reshape(b, X, Y, Z, m, f, m, f, m, f, c)
    # -> (b, X, ax, Y, ay, Z, az, dx, dy, dz, c)
    v = v.transpose(0, 1, 4, 2, 6, 3, 8, 5, 7, 9, 10)
    return v.reshape(b, X * m, Y * m, Z * m, f**3 * c)


def packed_affine(xp: jax.Array, f: int, mult: jax.Array, add: jax.Array) -> jax.Array:
    """Per-true-channel y = x*mult + add on a packed tensor (BatchNorm
    inference collapse): broadcast the (C,) vectors over the f^3 packed
    positions."""
    m = jnp.tile(mult.astype(xp.dtype), f**3)
    a = jnp.tile(add.astype(xp.dtype), f**3)
    return xp * m + a

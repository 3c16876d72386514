"""Space-to-depth 3D convolution — MXU-efficient conv for tiny channel counts.

The generator's 7x7x7 stem (1->16 ch) and projection (16->1 ch) convs run at
full 128^3 resolution with channel counts far below the MXU's 128 lanes; XLA
lowers them at ~1% of peak (measured ~340 ms each for a batch of 8 on v5e).
This module computes the SAME convolution by rearranging f^3 spatial blocks
into channels (space-to-depth), convolving with a transformed kernel whose
contraction/output dims are f^3 larger, and rearranging back: for f=4 the
stem becomes a 3^3 conv with 64 input / 1024 output channels — near-full MXU
tiles. The kernel transform is exact (a 0/1 scatter of the original taps),
so results match the direct conv to fp associativity.

Derivation (per axis, stride 1, SAME padding p=(k-1)//2):
  o[x] = sum_T W[T] xp[x+T]          xp = pad(x, p)
with x = f*X + r, source index f*X + r + T = f*(X+q) + d:
  o_s2d[X, (r,co)] = sum_{q,d,ci} W'[q,(d,ci),(r,co)] x_s2d[X+q,(d,ci)]
  W'[q,d,ci,r,co]  = W[f*q + d - r, ci, co]   (zero when outside [0,k))
The block kernel size is K = (f-1 + k-1)//f + 1 and xp is right-padded with
zeros to a multiple of f (those voxels are provably never read).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_map(k: int, f: int, s: int = 1) -> Tuple[np.ndarray, int]:
    """(K, f, f, k) 0/1 tensor A[q, d, r, T] = [f*q + d - s*r == T].

    ``s`` is the original conv stride: in block space the conv then runs with
    stride ``s`` and kernel K = (s*(f-1) + k-1)//f + 1 (source index
    s*(f*X + r) + T = f*(s*X + q) + d)."""
    K = (s * (f - 1) + k - 1) // f + 1
    A = np.zeros((K, f, f, k), np.float32)
    for q in range(K):
        for d in range(f):
            for r in range(f):
                T = f * q + d - s * r
                if 0 <= T < k:
                    A[q, d, r, T] = 1.0
    return A, K


def transform_kernel(w: jax.Array, f: int, s: int = 1) -> jax.Array:
    """(kx,ky,kz,Ci,Co) -> (Kx,Ky,Kz, f^3*Ci, f^3*Co) space-to-depth kernel.

    Channel layouts match :func:`s2d_conv3d`'s reshapes: input (dx,dy,dz,ci)
    d-major, output (rx,ry,rz,co) r-major. The equal-block same-offset case
    of ``ops.packed.transform_kernel_packed`` — one shared derivation
    (local import: ``packed`` imports this module at top level).
    """
    from contrast_gan_3d_tpu.ops.packed import transform_kernel_packed

    return transform_kernel_packed(w, f, f, s, (0, 0, 0))


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """(B, X, Y, Z, C) -> (B, X/f, Y/f, Z/f, f^3*C), channel layout
    (dx, dy, dz, c) d-major."""
    b, X, Y, Z, c = x.shape
    x = x.reshape(b, X // f, f, Y // f, f, Z // f, f, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, X // f, Y // f, Z // f, f * f * f * c)


def depth_to_space(x: jax.Array, f: int) -> jax.Array:
    """Inverse of :func:`space_to_depth` for layout (r, co) r-major."""
    b, X, Y, Z, fc = x.shape
    c = fc // (f * f * f)
    x = x.reshape(b, X, Y, Z, f, f, f, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, X * f, Y * f, Z * f, c)


def _tconv_axis_map(k: int = 3, s: int = 2) -> np.ndarray:
    """(K, s, k) 0/1 tensor A[j, r, T] = [s*j - r == T] for the flax
    ``ConvTranspose(kernel=k, stride=s, padding='SAME')`` convention
    o[s*Y + r] = sum_j K[s*j - r] x[Y - 1 + j] (probed numerically —
    tests/test_s2d_conv.py locks it).

    Derived and verified for the k=3 s=2 window ONLY (the generator's up
    path — the single transpose-conv shape in this framework). Other
    kernels need a different output-window placement (k=5/7 match a
    different crop; even k additionally drops the T=k-1 tap under this K)
    — refuse rather than return silently wrong values."""
    if k != 3 or s != 2:
        raise NotImplementedError(
            f"d2s/packed transpose conv is derived for kernel 3 stride 2 "
            f"only (got k={k}, s={s}); use a direct ConvTranspose for other "
            "shapes"
        )
    K = (k - 1) // s + 1
    A = np.zeros((K, s, k), np.float32)
    for j in range(K):
        for r in range(s):
            T = s * j - r
            if 0 <= T < k:
                A[j, r, T] = 1.0
    return A


def d2s_tconv3d(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 2,
    precision=None,
    convention: str = "torch",
) -> jax.Array:
    """Exact stride-s transpose conv as a stride-1 conv producing s^3-packed
    channels + depth-to-space.

    The transpose conv's scattered writes become one dense conv with
    contraction k'^3*Ci and output s^3*Co channels — MXU-shaped (the
    generator's upsampling layers: 8x the output channels). x: (B, X, Y, Z,
    Ci); w: (k, k, k, Ci, Co); output (B, sX, sY, sZ, Co).

    ``convention``: window placement of the size-preserving output. The two
    placements are one voxel apart; pick the one matching your weights.
    - "torch" (this function's default): torch ``ConvTranspose(k, s,
      p=(k-1)//2, op=s-1)`` = full[1 : sN+1] — REQUIRED for weight-port
      parity with reference checkpoints (``utils/torch_port``).
    - "same": flax ``ConvTranspose(padding='SAME')`` = full[0 : sN] — what
      ``blocks.ConvBlock`` uses by DEFAULT for from-scratch training
      (``tconv_placement="same"``, ~7%% faster whole train step; PERF.md).
    """
    kx, ky, kz, ci, co = w.shape
    s = stride
    A = _tconv_axis_map(kx, s)
    # W''[jx,jy,jz, ci, rx,ry,rz, co]
    wp = jnp.einsum(
        "jrx,ksy,ltz,xyzio->jklirsto",
        jnp.asarray(A), jnp.asarray(_tconv_axis_map(ky, s)),
        jnp.asarray(_tconv_axis_map(kz, s)), w,
    )
    K = A.shape[0]
    wp = wp.reshape(K, K, K, ci, s * s * s * co).astype(x.dtype)
    # one extra trailing block position under "torch" so the shifted window
    # full[1 : sN+1] is available after depth-to-space
    hi = 1 if convention == "torch" else 0
    xp = jnp.pad(x, ((0, 0), (K - 1, hi), (K - 1, hi), (K - 1, hi), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp, wp, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
        preferred_element_type=x.dtype,
    )
    out = depth_to_space(out, s)
    if convention == "torch":
        n = x.shape[1:4]
        out = out[:, 1 : s * n[0] + 1, 1 : s * n[1] + 1, 1 : s * n[2] + 1, :]
    elif convention != "same":
        raise ValueError(f"unknown convention {convention!r}")
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def s2d_conv3d(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    f: int = 4,
    stride: int = 1,
    padding_mode: str = "zeros",
    precision=None,
) -> jax.Array:
    """SAME-style 3D convolution via space-to-depth (see module docs).

    x: (B, X, Y, Z, Ci) with X, Y, Z divisible by ``f``; w: (k,k,k,Ci,Co)
    with odd k; pre-pad is (k-1)//2 per side (torch SAME). With
    ``stride`` s the block-space conv runs at stride s and the output has
    spatial dims X//s etc. (must divide ``f``). ``padding_mode``: 'zeros' |
    'reflect' (the reference generator uses reflect at its 7^3 convs,
    blocks.py:29-53).
    """
    kx, ky, kz = w.shape[:3]
    # even kernels use torch-style padding p=(k-1)//2 (e.g. the critic's
    # k4 s2 p1 convs) — the index derivation is padding-agnostic
    b, X, Y, Z, ci = x.shape
    s = stride
    out_dims = (X // s, Y // s, Z // s)
    assert all(d % f == 0 for d in out_dims), (x.shape, f, s)

    pads = [(kx - 1) // 2, (ky - 1) // 2, (kz - 1) // 2]
    if padding_mode not in ("reflect", "zeros"):
        # a typo must not silently train/infer with zero borders (the
        # generator stem/projection depend on reflect padding)
        raise ValueError(
            f"unknown padding_mode {padding_mode!r}: expected 'zeros' | 'reflect'"
        )
    mode = "reflect" if padding_mode == "reflect" else "constant"
    xp = jnp.pad(x, ((0, 0), *[(p, p) for p in pads], (0, 0)), mode=mode)
    # right-pad with zeros so (a) length divides f and (b) the block-space
    # VALID conv yields >= out/f blocks: len >= d_in + f*(K - s). The extra
    # zeros are provably never read (max read = s*out - s + k - 1 < d_in+2p).
    Ks = [(s * (f - 1) + k - 1) // f + 1 for k in (kx, ky, kz)]
    req = [
        max(-(-(d + 2 * p) // f) * f, d + f * (K - s))
        for d, p, K in zip((X, Y, Z), pads, Ks)
    ]
    extra = [r - (d + 2 * p) for r, d, p in zip(req, (X, Y, Z), pads)]
    if any(e > 0 for e in extra):
        xp = jnp.pad(xp, ((0, 0), *[(0, max(0, e)) for e in extra], (0, 0)))

    xs = space_to_depth(xp, f)
    ws = transform_kernel(w, f, s).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        xs, ws,
        window_strides=(s, s, s),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
        preferred_element_type=x.dtype,
    )
    # VALID output may overhang the true block count — trim
    out = out[:, : out_dims[0] // f, : out_dims[1] // f, : out_dims[2] // f]
    out = depth_to_space(out, f)
    if bias is not None:
        out = out + bias
    return out

"""Pallas TPU kernel for the block-space 3^3 conv (s2d projection/stem).

The generator's space-to-depth projection conv — a 3^3 VALID conv with 1024
input channels and 64 outputs over (B, 34, 34, 34) blocks — is the hottest
op of full-volume inference. XLA reaches ~12.5 TFLOPS on it (N=64 fills half
the MXU lanes and the conv lowering adds overhead). This kernel streams one
z-row of blocks per grid step (three z-shifted views of the same operand —
halo via shifted BlockSpec index maps, no manual DMA), accumulates the 27
taps as static-sliced ``dot_general``s into a revisited f32 output block,
and splits the channel contraction over the minor grid axis so the
double-buffered input rows fit VMEM.

MEASURED RESULTS:
- round 1: 75.2 ms "identical to XLA" — WRONG interpretation: that number
  timed the s2d wrapper's layout transposes, not the kernel.
- round 2 (scan-differential, native layout): **10.6 ms / 87.7 TFLOPS** for
  the projection shape (B8, 34^3 blocks, 1024->64) — ~7x faster than XLA's
  conv lowering, whose tap loop re-reads the full input per tap. The N=64
  output width does NOT halve MXU throughput on this chip.
The kernel consumes ANY (B, A, B2, C3, Ci) layout: grid rides A, in-kernel
outer slices ride B2, sublane slices C3 — permute the WEIGHTS (e.g.
``jnp.transpose(w, (1, 2, 0, 3, 4))`` pairs (A,B2,C3)=(kx,ky,kz)) instead of
transposing data. LIBRARY CODE, not in the production path: the generator's
Pallas projection variant built on this kernel lost the end-to-end A/B at
batch 8 (88.1 vs 76.7 ms) and at the production batch 24 (199.0 vs
156.0 ms) — the f4-direct tconv FLOP inflation outweighs the kernel's
~88 TFLOPS — and was removed (PERF.md "Pallas findings"). The kernel and
its probes stay for future shapes where a 3^3 block conv dominates.

Layout contract: operands are pre-transposed so z is the leading spatial dim
and the channel dim sits in lanes: x (B, Zi, Xi, Yi, Ci); w (3, 3, 3, Ci,
Co); out (B, Zi-2, Xi-2, Yi-2, Co).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref, *, xo: int, yo: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])

    acc = jnp.zeros((xo, yo, o_ref.shape[-1]), jnp.float32)
    for qz, xref in enumerate((x0_ref, x1_ref, x2_ref)):
        x = xref[0, 0]  # (Xi, Yi, Ck)
        for qx in range(3):
            for qy in range(3):
                xa = x[qx : qx + xo, qy : qy + yo, :]
                acc = acc + jax.lax.dot_general(
                    xa,
                    w_ref[qx, qy, qz],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    o_ref[0, 0] += acc


@functools.partial(jax.jit, static_argnames=("k_splits",))
def block_conv3x3x3(x: jax.Array, w: jax.Array, k_splits: int = 0) -> jax.Array:
    """VALID 3^3 conv: x (B, Z, X, Y, Ci) -> f32 (B, Z-2, X-2, Y-2, Co).

    One grid step per (batch, output z-row, channel chunk); the three input
    z-rows arrive as shifted views of the same operand, the channel chunks
    accumulate into the revisited output block (minor grid axis).
    """
    b, zi, xi, yi, ci = x.shape
    co = w.shape[-1]
    zo, xo, yo = zi - 2, xi - 2, yi - 2
    if k_splits == 0:
        # keep double-buffered inputs + weights + f32 out under budget;
        # account Mosaic tile padding (sublane -> 8, lane -> 128)
        budget = 11 * 2**20
        pad8 = lambda v: -(-v // 8) * 8
        pad128 = lambda v: -(-v // 128) * 128
        per_chunk = lambda ks: (
            2 * 3 * xi * pad8(yi) * pad128(ci // ks) * x.dtype.itemsize
            + 2 * 27 * (ci // ks) * pad128(co) * w.dtype.itemsize
            + xo * pad8(yo) * pad128(co) * 4
        )
        k_splits = 1
        while per_chunk(k_splits) > budget and k_splits < ci // 128:
            k_splits *= 2
    ck = ci // k_splits
    assert ci % k_splits == 0, (ci, k_splits)

    row_spec = lambda dz: pl.BlockSpec(
        (1, 1, xi, yi, ck),
        lambda bi, z, ki, dz=dz: (bi, z + dz, 0, 0, ki),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_kernel, xo=xo, yo=yo),
        grid=(b, zo, k_splits),
        in_specs=[
            row_spec(0),
            row_spec(1),
            row_spec(2),
            pl.BlockSpec(
                (3, 3, 3, ck, co), lambda bi, z, ki: (0, 0, 0, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, xo, yo, co), lambda bi, z, ki: (bi, z, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, zo, xo, yo, co), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * zo * xo * yo * 27 * ci * co,
            bytes_accessed=(3 * b * zo * xi * yi * ci + b * zo * xo * yo * co)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, x, w)


def _kernel_v2(x0_ref, x1_ref, x2_ref, w_ref, o_ref, *shift_refs, xo: int, yo: int):
    """Sublane-ALIGNED tap slicing (the v1 kernel's cost center): per input
    z-row, the two misaligned x-offsets (q=1,2) are relayouted ONCE into
    scratch; all 27 tap matmuls then read aligned windows (the within-block
    y slice rides a plain outer dim; the x slice hits offset 0 of the right
    shifted copy). Dot shape per tap: (yo*xo, ck) @ (ck, Co) f32-accumulated.

    Motivation (measured, PERF.md): XLA's conv lowering re-reads the full
    input once per tap (27 x 537 MB at 128^3/batch 8) and the v1 kernel paid
    a Mosaic relayout per misaligned tap slice; this version streams each
    input row 3x total and relayouts 6x per row instead of 18x."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])

    co = o_ref.shape[-1]
    acc = jnp.zeros((yo * xo, co), jnp.float32)
    for qz, xref in enumerate((x0_ref, x1_ref, x2_ref)):
        row = xref[0, 0]  # (Yi, Xi, Ck)
        # aligned shifted copies along the sublane (x) axis
        shifts = [row[:, 0:xo, :]]
        for qx in (1, 2):
            s_ref = shift_refs[2 * qz + (qx - 1)]
            s_ref[...] = row[:, qx : qx + xo, :]
            shifts.append(s_ref[...])
        for qy in range(3):
            for qx in range(3):
                xa = shifts[qx][qy : qy + yo]  # (yo, xo, ck): outer-dim slice
                acc = acc + jax.lax.dot_general(
                    xa.reshape(yo * xo, -1),
                    w_ref[qy, qx, qz],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    o_ref[0, 0] += acc.reshape(yo, xo, co)


@functools.partial(jax.jit, static_argnames=("k_splits",))
def block_conv3x3x3_v2(x: jax.Array, w: jax.Array, k_splits: int = 0) -> jax.Array:
    """VALID 3^3 conv: x (B, Z, Y, X, Ci) -> f32 (B, Z-2, Y-2, X-2, Co).

    Layout contract: channel dim in lanes, X in sublanes, Y/Z outer. Weights
    (3, 3, 3, Ci, Co) indexed (qy, qx, qz) in-kernel via a pre-transpose.
    """
    b, zi, yi, xi, ci = x.shape
    co = w.shape[-1]
    zo, yo, xo = zi - 2, yi - 2, xi - 2
    if k_splits == 0:
        budget = 11 * 2**20
        pad8 = lambda v: -(-v // 8) * 8
        pad128 = lambda v: -(-v // 128) * 128
        per_chunk = lambda ks: (
            2 * 3 * yi * pad8(xi) * pad128(ci // ks) * x.dtype.itemsize
            + 6 * yi * pad8(xo) * pad128(ci // ks) * x.dtype.itemsize
            + 2 * 27 * (ci // ks) * pad128(co) * w.dtype.itemsize
            + 2 * yo * pad8(xo) * pad128(co) * 4
        )
        k_splits = 1
        while per_chunk(k_splits) > budget and k_splits < ci // 128:
            k_splits *= 2
    ck = ci // k_splits
    assert ci % k_splits == 0, (ci, k_splits)

    # (ky, kx, kz, ck, co) so w_ref[qy, qx, qz] is a (ck, co) lane-minor tile
    wt = jnp.transpose(w, (1, 0, 2, 3, 4))

    row_spec = lambda dz: pl.BlockSpec(
        (1, 1, yi, xi, ck),
        lambda bi, z, ki, dz=dz: (bi, z + dz, 0, 0, ki),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_kernel_v2, xo=xo, yo=yo),
        grid=(b, zo, k_splits),
        in_specs=[
            row_spec(0),
            row_spec(1),
            row_spec(2),
            pl.BlockSpec(
                (3, 3, 3, ck, co), lambda bi, z, ki: (0, 0, 0, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, yo, xo, co), lambda bi, z, ki: (bi, z, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, zo, yo, xo, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((yi, xo, ck), x.dtype) for _ in range(6)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * zo * yo * xo * 27 * ci * co,
            bytes_accessed=(3 * b * zo * yi * xi * ci + b * zo * yo * xo * co)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, x, wt)


def s2d_conv3d_pallas(
    x: jax.Array,
    w: jax.Array,
    bias=None,
    f: int = 4,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Drop-in for ``s2d_conv3d`` (stride 1, K=3 block kernels — i.e. k in
    (5..8) at f=4) backed by the Pallas block conv. Falls back to the XLA
    path for unsupported configs."""
    from contrast_gan_3d_tpu.ops.s2d_conv import (
        _axis_map,
        depth_to_space,
        s2d_conv3d,
        space_to_depth,
        transform_kernel,
    )

    kx, ky, kz = w.shape[:3]
    Ks = [_axis_map(k, f)[1] for k in (kx, ky, kz)]
    B, X, Y, Z, ci = x.shape
    if Ks != [3, 3, 3] or any(d % f for d in (X, Y, Z)):
        return s2d_conv3d(x, w, bias, f=f, padding_mode=padding_mode)

    pads = [(k - 1) // 2 for k in (kx, ky, kz)]
    if padding_mode not in ("reflect", "zeros"):
        # a typo must not silently train/infer with zero borders (the
        # generator stem/projection depend on reflect padding)
        raise ValueError(
            f"unknown padding_mode {padding_mode!r}: expected 'zeros' | 'reflect'"
        )
    mode = "reflect" if padding_mode == "reflect" else "constant"
    xp = jnp.pad(x, ((0, 0), *[(p, p) for p in pads], (0, 0)), mode=mode)
    # right-pad bound exactly as s2d_conv3d (s2d_conv.py req): the padded
    # length must both divide f AND give >= d/f + K - 1 blocks so the VALID
    # block conv yields the full output — even kernels (k=6: p=2, so
    # d+2p < d+2f) fall short of the second bound without it
    extra = [
        max((-(d + 2 * p)) % f, d + f * (K - 1) - (d + 2 * p))
        for d, p, K in zip((X, Y, Z), pads, Ks)
    ]
    if any(extra):
        xp = jnp.pad(xp, ((0, 0), *[(0, e) for e in extra], (0, 0)))
    xs = space_to_depth(xp, f)  # (B, Xb+2, Yb+2, Zb+2, f^3 ci)
    ws = transform_kernel(w, f).astype(x.dtype)

    # z-major layout for the kernel
    xs_t = jnp.transpose(xs, (0, 3, 1, 2, 4))
    out = block_conv3x3x3(xs_t, ws)  # (B, Zb', Xb', Yb', f^3 co) f32
    out = jnp.transpose(out, (0, 2, 3, 1, 4)).astype(x.dtype)
    out = out[:, : X // f, : Y // f, : Z // f]
    out = depth_to_space(out, f)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out

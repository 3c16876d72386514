"""ResNet-style attenuation generator (flax.linen, channels-last).

Capability parity with reference ``contrast_gan_3D/model/generator.py:9-90``:
7x7(x7) reflect-padded stem -> ``n_updownsample_blocks`` stride-2 downsamples
(channels doubling) -> ``n_resnet_blocks`` residual blocks -> mirrored
transpose-conv upsamples -> 7x7(x7) reflect-padded projection to 1 channel ->
tanh. The output is a bounded attenuation map in (-1, 1); the caller computes
``corrected = input - attenuation`` (residual-correction design,
reference Trainer.py:170-171) and the scaler maps it to +-MAX_HU_DELTA HU.

Default config (4 resnet blocks, 2 up/down, 16 stem channels, 3D) has exactly
1,035,297 parameters, matching the reference (BASELINE.md).
"""

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from contrast_gan_3d_tpu.models.blocks import ConvBlock, ResNetBlock


class _Params(nn.Module):
    """Raw conv parameters under a named scope — lets the packed layout own
    the SAME parameter tree as the direct nn.Conv/nn.ConvTranspose path."""

    shape: Tuple[int, ...]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        b = (
            self.param(
                "bias", nn.initializers.zeros_init(), (self.shape[-1],), jnp.float32
            )
            if self.use_bias
            else None
        )
        return k, b


class _PackedStage(nn.Module):
    """conv (executed by the module-attribute block-space ``conv_fn``) ->
    BatchNorm (on a (f_view, C) channel view of the packed tensor) ->
    activation. Parameter paths match the direct ``ConvBlock`` exactly:
    ``<name>/<conv_name>/kernel`` and ``<name>/BatchNorm_0/{scale,bias}``.
    ``conv_fn``/``f_view``/``activation`` are attributes (not call args) so
    ``nn.remat(_PackedStage, static_argnums=(2,))`` works like the direct
    layout's ConvBlock wrapper."""

    features: int
    kernel_size: int
    in_ch: int
    conv_fn: Any = None
    f_view: int = 8
    activation: Optional[str] = "relu"
    conv_name: str = "Conv_0"
    norm: bool = True
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, train: bool):
        ks = self.kernel_size
        k, b = _Params(
            (ks, ks, ks, self.in_ch, self.features),
            use_bias=self.use_bias,
            name=self.conv_name,
        )()
        y = self.conv_fn(xp, k, b)
        if self.norm:
            from contrast_gan_3d_tpu.models.norm import BatchNorm

            v = y.reshape(*y.shape[:-1], self.f_view, self.features)
            v = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="BatchNorm_0",
            )(v)
            y = v.reshape(*y.shape[:-1], self.f_view * self.features)
        if self.activation == "relu":
            y = nn.relu(y)
        elif self.activation == "tanh":
            y = nn.tanh(y)
        return y


class ResnetGenerator(nn.Module):
    n_resnet_blocks: int = 4
    n_updownsample_blocks: int = 2
    init_channels_out: int = 16
    ndim: int = 3
    resnet_dropout_prob: float = 0.0
    resnet_padding_mode: str = "zeros"
    norm: str = "batch"
    # space-to-depth factor for the full-resolution 7^3 convs (stem + last):
    # MXU-efficient equivalent conv (ops/s2d_conv); None = direct conv
    s2d_factor: Optional[int] = 4
    # rematerialize each block in the backward pass: the full train step at
    # 128^3 batch 12 otherwise overflows a 16 GB chip (activations of the
    # full-resolution stages dominate); ~zero cost for inference-only graphs
    remat: bool = False
    # transpose-conv window placement: "same" (fast; default for training
    # from scratch) or "torch" (REQUIRED when loading reference checkpoints
    # via utils/torch_port — torch's one-voxel-shifted window)
    tconv_placement: str = "same"
    # execution layout: "direct" (reference-shaped stages) or "packed"
    # (ops/packed: full-resolution stages run in space-to-depth block space
    # across stage boundaries — identical math and parameter tree; measured
    # 166.4 -> 76.7 ms per batch-8 128^3 bf16 forward on the bench chip
    # (2.2x, see PERF.md); 3D + norm="batch" only, spatial dims must
    # divide max(4, 2^n_updownsample_blocks))
    layout: str = "direct"
    # with layout="packed": return the f=4-packed (B, W/4, H/4, D/4, 64)
    # attenuation instead of unpacking — lets the sliding-window corrector
    # blend and scatter in packed space
    packed_output: bool = False
    # with layout="packed": the input is ALREADY f=2 space-to-depth packed
    # ((B, W/2, H/2, D/2, 8*C) in ``ops/s2d_conv.space_to_depth`` layout) —
    # the corrector keeps the whole volume packed and skips the per-patch
    # s2d transpose
    packed_input: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.n_resnet_blocks > 0
        if self.layout == "packed":
            return self._packed_call(x, train)
        if self.layout != "direct":
            raise ValueError(f"unknown layout {self.layout!r}")
        c0 = self.init_channels_out
        CB = nn.remat(ConvBlock, static_argnums=(2,)) if self.remat else ConvBlock
        RB = nn.remat(ResNetBlock, static_argnums=(2,)) if self.remat else ResNetBlock

        x = CB(
            c0, 7, ndim=self.ndim, padding=3, padding_mode="reflect",
            norm=self.norm, activation="relu", s2d=self.s2d_factor,
            dtype=self.dtype, name="first",
        )(x, train)

        for i in range(self.n_updownsample_blocks):
            x = CB(
                c0 * 2 ** (i + 1), 3, ndim=self.ndim, stride=2, padding=1,
                norm=self.norm, activation="relu", dtype=self.dtype,
                name=f"down_{i}",
            )(x, train)

        bottleneck = c0 * 2**self.n_updownsample_blocks
        for i in range(self.n_resnet_blocks):
            x = RB(
                bottleneck, ndim=self.ndim, dropout_prob=self.resnet_dropout_prob,
                padding_mode=self.resnet_padding_mode, norm=self.norm,
                dtype=self.dtype, name=f"resnet_{i}",
            )(x, train)

        # NOTE: d2s transpose convs (ops/s2d_conv.d2s_tconv3d) measured SLOWER
        # here (198 vs 172 ms/batch-8: the (K*s/k)^3 = 2.37x FLOP overhead
        # outweighs the MXU-shape gain at 64->32->16 channels) — direct
        # nn.ConvTranspose stays the fast path for the upsampling stage
        for i in range(self.n_updownsample_blocks, 0, -1):
            x = CB(
                c0 * 2 ** (i - 1), 3, ndim=self.ndim, stride=2, transpose=True,
                norm=self.norm, activation="relu",
                tconv_placement=self.tconv_placement, dtype=self.dtype,
                name=f"up_{i - 1}",
            )(x, train)

        # final 7x7(x7) reflect-padded conv with bias, then tanh
        x = CB(
            1, 7, ndim=self.ndim, padding=3, padding_mode="reflect",
            norm=None, activation="tanh", s2d=self.s2d_factor,
            dtype=self.dtype, name="last_conv",
        )(x, train)
        return x

    def _packed_call(self, x, train: bool):
        """Block-space execution (see ``ops/packed`` module docs): the
        full-resolution stem/downsample/upsample/projection stages keep
        activations space-to-depth packed across stage boundaries; the
        bottleneck (backbone + inner upsamples) reuses the direct modules.
        Parameter tree and numerics are identical to the direct layout
        (tests/test_packed.py locks forward, train-mode stats and grads)."""
        from contrast_gan_3d_tpu.ops.packed import (
            packed_conv3d, packed_tconv3d, reflect_pad_packed,
        )
        from contrast_gan_3d_tpu.ops.s2d_conv import (
            depth_to_space, space_to_depth,
        )

        if self.ndim != 3:
            raise ValueError("layout='packed' is 3D-only")
        if self.norm != "batch":
            raise ValueError("layout='packed' supports norm='batch' only")
        if self.n_updownsample_blocks < 1:
            # the f_out=1 unpack rides the last downsample and up_0 assumes
            # c0*2 input channels — with zero blocks the backbone would see
            # f=2-packed activations (wrong channel count)
            raise ValueError("layout='packed' needs n_updownsample_blocks >= 1")
        c0 = self.init_channels_out
        n = self.n_updownsample_blocks
        if self.packed_input:
            in_ch = x.shape[-1] // 8
            dims = tuple(d * 2 for d in x.shape[1:4])
        else:
            in_ch = x.shape[-1]
            dims = x.shape[1:4]
        if any(d % max(4, 2**n) != 0 for d in dims):
            raise ValueError(f"spatial dims {dims} must divide {max(4, 2**n)}")
        xp = x.astype(self.dtype) if self.packed_input else space_to_depth(
            x.astype(self.dtype), 2
        )
        dt = self.dtype
        # rematerialization: recompute stage activations in the backward
        # (static args: conv_fn — hashable closure —, f_view, train,
        # activation; same policy as the direct layout's CB/RB wrappers)
        PS = nn.remat(_PackedStage, static_argnums=(2,)) if self.remat else _PackedStage
        RB = nn.remat(ResNetBlock, static_argnums=(2,)) if self.remat else ResNetBlock
        CB = nn.remat(ConvBlock, static_argnums=(2,)) if self.remat else ConvBlock

        # stem: reflect-padded 7^3, f2 -> f2
        xp, o = reflect_pad_packed(xp, 2, 3)
        sb = tuple(d // 2 for d in dims)
        xp = PS(
            c0, 7, in_ch, dtype=dt, name="first", f_view=8,
            conv_fn=lambda v, k, b: packed_conv3d(
                v, k, b, f_in=2, f_out=2, stride=1, o=(o, o, o), out_blocks=sb
            ),
        )(xp, train)

        # downsamples: f2 -> f2, the last one unpacks (f_out=1) into the
        # bottleneck
        cur = c0
        for i in range(n):
            feats = c0 * 2 ** (i + 1)
            f_out = 1 if i == n - 1 else 2
            ob = tuple(d // 2 ** (i + 1) // f_out for d in dims)
            xp = PS(
                feats, 3, cur, dtype=dt, name=f"down_{i}", f_view=f_out**3,
                conv_fn=lambda v, k, b, ob=ob, fo=f_out: packed_conv3d(
                    v, k, b, f_in=2, f_out=fo, stride=2, pad=1, out_blocks=ob
                ),
            )(xp, train)
            cur = feats

        # bottleneck: direct modules (these shapes are already MXU-native)
        for i in range(self.n_resnet_blocks):
            xp = RB(
                cur, ndim=3, dropout_prob=self.resnet_dropout_prob,
                padding_mode=self.resnet_padding_mode, norm=self.norm,
                dtype=dt, name=f"resnet_{i}",
            )(xp, train)

        for i in range(n, 1, -1):
            xp = CB(
                c0 * 2 ** (i - 1), 3, ndim=3, stride=2, transpose=True,
                norm=self.norm, activation="relu",
                tconv_placement=self.tconv_placement, dtype=dt,
                name=f"up_{i - 1}",
            )(xp, train)

        # final upsample + projection: f2 tconv + f2->f4 block conv. (A
        # Pallas projection variant — f4-direct tconv + block_conv3x3x3 —
        # was measured SLOWER end-to-end at both batch 8 (88.1 vs 76.7 ms)
        # and the production batch 24 (199.0 vs 156.0 ms): the kernel itself
        # runs at ~88 TFLOPS but the f4-direct tconv's (K*f)^3/k^3 FLOP
        # inflation outweighs it; PERF.md "Pallas findings". The kernel
        # stays in ops/pallas_conv.py as library code with its probes.)
        ob = tuple(d // 4 for d in dims)
        # up_0: dense transpose conv keeping the s=2-packed output
        # (which IS the f2 space-to-depth layout of the full-res tensor)
        xp = PS(
            c0, 3, c0 * 2, conv_name="ConvTranspose_0", dtype=dt,
            name="up_0", f_view=8,
            conv_fn=lambda v, k, b: packed_tconv3d(
                v, k, b, stride=2, convention=self.tconv_placement
            ),
        )(xp, train)
        xp, o2 = reflect_pad_packed(xp, 2, 3)
        yp = PS(
            1, 7, c0, norm=False, use_bias=True, dtype=dt,
            name="last_conv", f_view=64, activation="tanh",
            conv_fn=lambda v, k, b: packed_conv3d(
                v, k, b, f_in=2, f_out=4, stride=1, o=(o2, o2, o2), out_blocks=ob
            ),
        )(xp, train)
        if self.packed_output:
            return yp
        return depth_to_space(yp, 4)

"""Conv building blocks (flax.linen, channels-last).

Capability parity with reference ``contrast_gan_3D/model/blocks.py``:
``ConvBlock`` = conv / transpose-conv + norm (batch by default; layer /
instance / none selectable) + activation (relu / leaky_relu / none), with bias
only when unnormalized; ``ResNetBlock`` = two ConvBlocks + optional dropout +
skip. TPU-first choices: channels-last (NDHWC) layout so the feature dim maps
to lanes and XLA tiles convs onto the MXU; reflect padding is an explicit
jnp.pad feeding a VALID conv (fused by XLA); a ``dtype`` knob enables bf16
compute with f32 params.
"""

from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from contrast_gan_3d_tpu.ops.s2d_conv import d2s_tconv3d, s2d_conv3d

Padding = Union[int, str]


def _pad_pairs(padding: int, ndim: int):
    return tuple((padding, padding) for _ in range(ndim))


class S2DConv(nn.Module):
    """Stride-1 SAME 3D conv computed via space-to-depth (``ops/s2d_conv``):
    MXU-efficient for tiny channel counts. Param structure ("kernel"/"bias")
    is identical to ``nn.Conv``, so checkpoints are interchangeable with the
    direct-conv path."""

    features: int
    kernel_size: Tuple[int, int, int]
    padding_mode: str = "zeros"
    f: int = 4
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        return s2d_conv3d(
            x,
            kernel.astype(self.dtype),
            None if bias is None else bias.astype(self.dtype),
            f=self.f,
            padding_mode=self.padding_mode,
        )


class D2STConv(nn.Module):
    """Stride-2 size-preserving 3D transpose conv computed as a dense
    stride-1 conv with s^3-packed output channels + depth-to-space
    (``ops/s2d_conv.d2s_tconv3d``) — MXU-shaped. Param structure identical
    to ``nn.ConvTranspose``; ``convention`` picks the window placement
    ("torch" = reference-checkpoint parity, "same" = flax SAME — one voxel
    apart, see ops/s2d_conv.d2s_tconv3d)."""

    features: int
    kernel_size: Tuple[int, int, int]
    stride: int = 2
    use_bias: bool = True
    convention: str = "torch"  # window placement (see ops/s2d_conv)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return d2s_tconv3d(
            x.astype(self.dtype), kernel.astype(self.dtype), bias,
            stride=self.stride, convention=self.convention,
        )


class ConvBlock(nn.Module):
    """conv -> norm -> activation, N-dimensional (ndim spatial dims)."""

    features: int
    kernel_size: int
    ndim: int = 3
    stride: int = 1
    padding: int = 0
    padding_mode: str = "zeros"  # zeros | reflect
    transpose: bool = False
    norm: Optional[str] = "batch"  # batch | layer | instance | None
    activation: Optional[str] = "relu"  # relu | leaky_relu | tanh | None
    negative_slope: float = 0.2
    dropout_prob: float = 0.0
    s2d: Optional[int] = None  # space-to-depth block factor (MXU-efficient path)
    # transpose-conv window placement: "same" (fast XLA lowering) or
    # "torch" (reference-checkpoint parity); see the transpose branch
    tconv_placement: str = "same"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ksize = (self.kernel_size,) * self.ndim
        strides = (self.stride,) * self.ndim
        use_bias = self.norm is None

        # space-to-depth path: stride-1 SAME 3D convs whose spatial dims
        # divide the block factor (decided statically at trace time)
        use_s2d = (
            self.s2d is not None
            and not self.transpose
            and self.ndim == 3
            and self.stride == 1
            and self.padding == (self.kernel_size - 1) // 2
            and all(d % self.s2d == 0 for d in x.shape[1:-1])
        )

        # d2s path for transpose convs: dense stride-1 conv with s^3-packed
        # output channels (MXU-shaped), exactly equal to nn.ConvTranspose
        use_d2s = self.s2d is not None and self.transpose and self.ndim == 3

        if use_s2d:
            x = S2DConv(
                self.features, ksize, padding_mode=self.padding_mode,
                f=self.s2d, use_bias=use_bias, dtype=self.dtype, name="Conv_0",
            )(x)
        elif use_d2s:
            x = D2STConv(
                self.features, ksize, stride=self.stride, use_bias=use_bias,
                convention=self.tconv_placement, dtype=self.dtype,
                name="ConvTranspose_0",
            )(x)
        elif self.transpose:
            # exact stride-x upsampling. Two window placements, both valid
            # size-preserving transpose convs differing by a one-voxel
            # shift:
            # - "same": flax ConvTranspose(padding='SAME') — the fast XLA
            #   lowering (default; ~7% faster full train step).
            # - "torch": torch ConvTranspose(k, s, p=(k-1)//2, op=s-1) via
            #   explicit (k-1-p, k-1-p+op) lax padding — REQUIRED when
            #   importing reference checkpoints (utils/torch_port.py flips
            #   torch weights into this kernel).
            if self.tconv_placement == "torch":
                p_eff = (self.kernel_size - 1) // 2
                lo = self.kernel_size - 1 - p_eff
                pad = tuple((lo, lo + self.stride - 1) for _ in range(self.ndim))
            elif self.tconv_placement == "same":
                pad = "SAME"
            else:
                raise ValueError(f"unknown tconv_placement {self.tconv_placement!r}")
            x = nn.ConvTranspose(
                self.features, ksize, strides=strides, padding=pad,
                use_bias=use_bias, dtype=self.dtype,
            )(x)
        else:
            if self.padding_mode not in ("reflect", "zeros"):
                raise ValueError(
                    f"unknown padding_mode {self.padding_mode!r}: "
                    "expected 'zeros' | 'reflect'"
                )
            pad = _pad_pairs(self.padding, self.ndim)
            if self.padding_mode == "reflect" and self.padding > 0:
                x = jnp.pad(x, ((0, 0), *pad, (0, 0)), mode="reflect")
                pad = "VALID"
            x = nn.Conv(
                self.features, ksize, strides=strides, padding=pad,
                use_bias=use_bias, dtype=self.dtype,
            )(x)

        if self.norm == "batch":
            from contrast_gan_3d_tpu.models.norm import BatchNorm

            x = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="BatchNorm_0",
            )(x)
        elif self.norm == "layer":
            # reference gp_layernorm variant: per-sample normalization over
            # the WHOLE feature map (torch LayerNorm((C, *spatial)),
            # elementwise_affine=False — gp_layernorm.py:10-13), not just
            # the channel axis
            x = nn.LayerNorm(
                reduction_axes=tuple(range(1, x.ndim)),
                use_bias=False, use_scale=False, dtype=self.dtype,
            )(x)
        elif self.norm == "instance":
            # normalize over spatial dims only, per sample per channel
            x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
        elif self.norm is not None:
            raise ValueError(f"Unknown norm {self.norm!r}")

        if self.dropout_prob > 0:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)

        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "leaky_relu":
            x = nn.leaky_relu(x, self.negative_slope)
        elif self.activation == "tanh":
            x = nn.tanh(x)
        elif self.activation is not None:
            raise ValueError(f"Unknown activation {self.activation!r}")
        return x


class ResNetBlock(nn.Module):
    """Two 3x3(x3) ConvBlocks with a residual skip (reference blocks.py:56-88).

    Reference ordering kept: block0 has no activation, dropout sits between
    the blocks, and the skip wraps both.
    """

    features: int
    ndim: int = 3
    kernel_size: int = 3
    dropout_prob: float = 0.0
    padding_mode: str = "zeros"
    norm: Optional[str] = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = ConvBlock(
            self.features, self.kernel_size, ndim=self.ndim, padding=1,
            padding_mode=self.padding_mode, norm=self.norm, activation=None,
            dropout_prob=self.dropout_prob, dtype=self.dtype,
        )(x, train=train)
        y = ConvBlock(
            self.features, self.kernel_size, ndim=self.ndim, padding=1,
            padding_mode=self.padding_mode, norm=self.norm, activation="relu",
            dtype=self.dtype,
        )(y, train=train)
        return x + y

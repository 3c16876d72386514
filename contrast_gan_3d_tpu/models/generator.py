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

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from contrast_gan_3d_tpu.models.blocks import ConvBlock, ResNetBlock


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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.n_resnet_blocks > 0
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

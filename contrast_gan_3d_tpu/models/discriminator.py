"""3D/2D PatchGAN critic (flax.linen, channels-last).

Capability parity with reference ``contrast_gan_3D/model/discriminator.py:9-84``:
k=4 s=2 ConvBlocks with LeakyReLU(0.2); the first block is unnormalized (so it
carries a bias); channel growth ``min(2^n, 8) * init``; a final k=4 s=1 conv
produces a 1-channel logit map — patch-wise realism scores with no global
pooling (the Wasserstein loss averages over the map).

Default config (in 1 ch, 8 init channels, depth 3, 3D) has exactly 176,873
parameters, matching the reference (BASELINE.md).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from contrast_gan_3d_tpu.models.blocks import ConvBlock


class PatchGANDiscriminator(nn.Module):
    init_channels_out: int = 8
    discriminator_depth: int = 3
    ndim: int = 3
    kernel_size: int = 4
    negative_slope: float = 0.2
    norm: Optional[str] = "batch"
    # rematerialize blocks in the backward (see ResnetGenerator.remat; the
    # critic additionally appears in the gradient-penalty double backward)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        CB = nn.remat(ConvBlock, static_argnums=(2,)) if self.remat else ConvBlock
        x = CB(
            self.init_channels_out, self.kernel_size, ndim=self.ndim, stride=2,
            padding=1, norm=None, activation="leaky_relu",
            negative_slope=self.negative_slope, dtype=self.dtype, name="first",
        )(x, train)

        for n in range(self.discriminator_depth):
            out = min(2 ** (n + 1), 8) * self.init_channels_out
            x = CB(
                out, self.kernel_size, ndim=self.ndim, stride=2, padding=1,
                norm=self.norm, activation="leaky_relu",
                negative_slope=self.negative_slope, dtype=self.dtype,
                name=f"middle_{n}",
            )(x, train)

        x = CB(
            1, self.kernel_size, ndim=self.ndim, stride=1, padding=1,
            norm=None, activation=None, dtype=self.dtype, name="last",
        )(x, train)
        return x

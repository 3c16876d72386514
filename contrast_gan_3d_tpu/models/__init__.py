from contrast_gan_3d_tpu.models.blocks import ConvBlock, ResNetBlock  # noqa: F401
from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator  # noqa: F401
from contrast_gan_3d_tpu.models.generator import ResnetGenerator  # noqa: F401

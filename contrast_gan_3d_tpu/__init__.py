"""contrast_gan_3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
3D WGAN contrast correction of coronary CT angiography (CCTA) volumes.

Re-designed from scratch with the capabilities of the reference PyTorch
framework ``xqz-u/contrast-gan-3D`` (see SURVEY.md): a ResNet-style 3D
generator predicts a per-voxel attenuation map that is subtracted from
sub-optimal-contrast scans; a 3D PatchGAN critic plus ZNCC-similarity and
centerline-masked HU-corridor losses drive training. The whole WGAN step
(with weight clipping or gradient penalty) is a single jitted function;
full-volume inference is a scan-based sliding window with Gaussian-weighted
patch blending; scale-out is data-parallel over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from contrast_gan_3d_tpu.alias import ScanType  # noqa: F401

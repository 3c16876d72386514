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


# lazy top-level API (heavy modules import on first access)
_API = {
    "CCTAContrastCorrector": "contrast_gan_3d_tpu.eval.corrector",
    "ResnetGenerator": "contrast_gan_3d_tpu.models.generator",
    "PatchGANDiscriminator": "contrast_gan_3d_tpu.models.discriminator",
    "Trainer": "contrast_gan_3d_tpu.trainer.trainer",
    "TrainerConfig": "contrast_gan_3d_tpu.trainer.trainer",
    "StepConfig": "contrast_gan_3d_tpu.trainer.steps",
    "build_train_steps": "contrast_gan_3d_tpu.trainer.steps",
    "init_state": "contrast_gan_3d_tpu.trainer.steps",
    "load_config": "contrast_gan_3d_tpu.experiments",
    "FactorZeroCenterScaler": "contrast_gan_3d_tpu.data.scaler",
}


def __getattr__(name):
    if name in _API:
        import importlib

        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

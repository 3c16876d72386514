"""Experiment configuration system.

Capability parity with the reference's python-modules-as-config scheme
(``experiments/basic_conf.py`` + star-import override files + importlib
loading, reference ``trainer/utils.py:111-123``, ``train.py:97-107``) —
re-designed as a typed dataclass with functional override composition: named
presets mirror every shipped reference variant, ``load_config`` resolves a
preset name or a python file (which star-imports nothing — it defines
``def config(base: ExperimentConfig) -> ExperimentConfig`` or a module-level
``CONFIG``), and ``asdict_flat`` provides the wandb-serializable whitelist
(reference ``config_from_globals``, trainer/utils.py:126-166).
"""

from contrast_gan_3d_tpu.experiments.config import (  # noqa: F401
    ExperimentConfig,
    PRESETS,
    asdict_flat,
    load_config,
)

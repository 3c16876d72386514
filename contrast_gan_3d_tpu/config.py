"""Project path layout (reference: ``contrast_gan_3D/config.py``).

Everything is rooted at ``CGAN3D_HOME`` (defaults to the repo checkout) and can
be overridden through environment variables so the framework is relocatable.
"""

import os
from pathlib import Path

PROJECT_DIR = Path(os.environ.get("CGAN3D_HOME", Path(__file__).resolve().parent.parent))
DATA_DIR = Path(os.environ.get("CGAN3D_DATA_DIR", PROJECT_DIR / "data"))
LOGS_DIR = Path(os.environ.get("CGAN3D_LOGS_DIR", PROJECT_DIR / "logs"))
CHECKPOINTS_DIR = Path(os.environ.get("CGAN3D_CKPT_DIR", LOGS_DIR / "checkpoints"))
PROFILER_DIR = Path(os.environ.get("CGAN3D_PROFILER_DIR", LOGS_DIR / "profiler"))

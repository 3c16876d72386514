"""Type aliases and the scan-contrast taxonomy.

Capability parity with reference ``contrast_gan_3D/alias.py:15-27``: scans are
labeled by contrast quality at the coronary ostia — OPT(0) / LOW(-1) / HIGH(+1)
— and this 3-stream layout drives batching everywhere.
"""

from enum import Enum
from pathlib import Path
from typing import List, Tuple, Union

import numpy as np

Shape2D = Tuple[int, int]
Shape3D = Tuple[int, int, int]
ArrayShape = Tuple[int, ...]
Array = np.ndarray  # host arrays; device arrays are jax.Array
FoldType = List[Tuple[Union[str, Path], int]]
PathLike = Union[str, Path]


class ScanType(Enum):
    """Contrast quality at the coronary ostia (mean HU in the aortic root)."""

    OPT = 0  # 300 < mu < 500 HU — genuinely optimal, used as "real" by the critic
    LOW = -1  # mu <= 300 HU — low contrast
    HIGH = 1  # mu >= 500 HU — high contrast

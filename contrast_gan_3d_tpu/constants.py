"""Framework-wide constants.

Values mirror reference ``contrast_gan_3D/constants.py:1-13`` for capability /
numeric parity: the HU clip range, display window, aortic-root (ostia) patch
geometry, scan orientation and default patch sizes.
"""

import numpy as np

# 19^3 voxel patch around each coronary ostium, resampled at 0.5 mm isotropic,
# used for GMM-based contrast labeling of scans.
AORTIC_ROOT_PATCH_SIZE = np.array([19] * 3)
AORTIC_ROOT_PATCH_SPACING = np.array([0.5] * 3)

# Scans are shifted/clipped into this Hounsfield-unit range at load time.
MIN_HU, MAX_HU = -1024, 1500
# Display window (level 240, window 1000).
VMIN, VMAX = -260, 740

# All volumes are reoriented to LPS and stored (W, H, D) = (x, y, z).
ORIENTATION = "LPS"

TRAIN_PATCH_SIZE = (128, 128, 128)
VAL_PATCH_SIZE = (256, 256, 128)
DEFAULT_SEED = 42

# Generator output is a bounded attenuation map: tanh * MAX_HU_DELTA.
MAX_HU_DELTA = 600
# The HU-corridor loss pushes centerline voxels into this range.
DESIRED_HU_BOUNDS = (350, 450)

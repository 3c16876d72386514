"""Patient-level inference drivers.

Capability parity with reference ``eval/utils.py``: correct one patient
(from a raw .mhd/.nii scan or a preprocessed .npy patient) and save the
result. Where the reference fans out with an ``mp.Pool`` of whole-model
replicas (:27-39), the TPU-native path keeps ONE model and streams patients
through the jitted sliding-window program (device util is bounded by the
generator, not the host), optionally sharding each volume's patch grid across
the mesh (``parallel/inference``)."""

from pathlib import Path
from typing import Sequence

import numpy as np

from contrast_gan_3d_tpu.alias import PathLike
from contrast_gan_3d_tpu.data.preprocess import load_patient
from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
from contrast_gan_3d_tpu.utils import io_utils
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


def load_patient_or_scan(patient_path: PathLike):
    """Raw image file or preprocessed patient -> ((W, H, D) int16, meta)."""
    p = str(patient_path)
    if p.endswith((".mhd", ".mha", ".nii", ".nii.gz")):
        return io_utils.load_scan(p)
    scan_and_mask, meta = load_patient(p)
    return np.asarray(scan_and_mask[..., 0]), meta


def correct_patient(
    corrector: CCTAContrastCorrector,
    savedir: PathLike,
    patient_path: PathLike,
) -> Path:
    """Correct one patient and write ``<savedir>/<name>.mhd``
    (reference ``correct_patient``, eval/utils.py:9-24)."""
    scan, meta = load_patient_or_scan(patient_path)
    corrected = np.asarray(corrector(scan))
    savepath = Path(savedir) / io_utils.stem(patient_path)
    corrector.save(corrected, savepath, meta)
    return savepath.with_suffix(".mhd")


def correct_patients(
    corrector: CCTAContrastCorrector,
    savedir: PathLike,
    patient_paths: Sequence[PathLike],
) -> list:
    """Stream patients through the corrector (reference
    ``parallel_correct_patients`` capability; see module docstring for why
    this is sequential on the device side)."""
    out = []
    for p in patient_paths:
        logger.info("Correcting %r", str(p))
        out.append(correct_patient(corrector, savedir, p))
    return out


# reference-familiar alias (eval/utils.py:27-39); same device-streaming design
parallel_correct_patients = correct_patients

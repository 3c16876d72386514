"""Scan contrast labeling + cross-validation splits.

Capability parity with reference ``contrast_gan_3D/data/utils.py:85-141`` and
the GMM pipeline in ``notebooks/create_dataset.ipynb`` (cells 24-29): each scan
is labeled by the mean HU inside a GMM-fitted aortic-root (ostium) patch —
300 < mu < 500 -> OPT(0), mu <= 300 -> LOW(-1), mu >= 500 -> HIGH(+1); scans
whose fitted std >= 500 are dropped. Splits are stratified k-fold over
(path, label) pairs.
"""

from pathlib import Path
from typing import Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd
from sklearn.mixture import GaussianMixture
from sklearn.model_selection import StratifiedKFold, train_test_split

from contrast_gan_3d_tpu.alias import FoldType
from contrast_gan_3d_tpu.utils import io_utils
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


def ostia_dataframe(ostia_files: Iterable, save_path=None) -> pd.DataFrame:
    """World L/R ostia coordinates of each patient as a dataframe with columns
    ``ID, x, y, z`` — two rows per MeVisLab marker file, the patient ID taken
    from the file's parent directory (reference ``create_ostia_dataframe``,
    ``data/utils.py:57-84``). ``save_path`` optionally writes the sheet:
    ``.xlsx`` via pandas/openpyxl when available, else ``.csv``."""
    rows = []
    for ostia_file in ostia_files:
        ostia_file = Path(ostia_file)
        points, _ = io_utils.load_mevis_coords(ostia_file)
        name = io_utils.stem(ostia_file.parent)
        for point in np.asarray(points, dtype=np.float32)[:2]:
            rows.append({"ID": name} | dict(zip("xyz", point)))
    df = pd.DataFrame(rows)
    logger.info("Total L/R ostia coordinates: %s", (len(df), 3))
    if save_path is not None:
        save_path = Path(save_path)
        if save_path.suffix == ".xlsx":
            try:
                df.to_excel(save_path, index=False)
            except ImportError:
                save_path = save_path.with_suffix(".csv")
                logger.warning("openpyxl unavailable, writing '%s'", save_path)
                df.to_csv(save_path, index=False)
        else:
            df.to_csv(save_path, index=False)
        logger.info("Saved ostia world coordinates to '%s'", save_path)
    return df


def gmm_grid_search(
    values: np.ndarray,
    max_components: int = 5,
    seed: Optional[int] = None,
) -> GaussianMixture:
    """Fit GMMs with 1..max_components components and keep the lowest-BIC one
    (reference notebook ``GMM_grid_search``)."""
    values = np.asarray(values, dtype=np.float64).reshape(-1, 1)
    best, best_bic = None, np.inf
    for n in range(1, max_components + 1):
        gmm = GaussianMixture(n_components=n, random_state=seed).fit(values)
        bic = gmm.bic(values)
        if bic < best_bic:
            best, best_bic = gmm, bic
    return best


def pick_gmm_component(gmm: GaussianMixture) -> Tuple[float, float]:
    """(mu, std) of the highest-mean component — the contrast-filled lumen
    (reference notebook ``pick_GMM_component``)."""
    idx = int(np.argmax(gmm.means_[:, 0]))
    mu = float(gmm.means_[idx, 0])
    std = float(np.sqrt(gmm.covariances_[idx].ravel()[0]))
    return mu, std


def compute_ostia_HU_stats(
    ostia_patches: np.ndarray, seed: Optional[int] = None
) -> List[Tuple[float, float]]:
    """Per-ostium (mu, std) of the aortic-root HU via GMM fit of each 19^3
    patch (reference notebook ``compute_ostia_HU_value``)."""
    return [pick_gmm_component(gmm_grid_search(p.ravel(), seed=seed)) for p in ostia_patches]


def label_from_HU(mu: float) -> int:
    """300 < mu < 500 -> 0 (OPT); mu <= 300 -> -1 (LOW); mu >= 500 -> +1 (HIGH)."""
    if mu <= 300:
        return -1
    if mu >= 500:
        return 1
    return 0


def label_ccta_scans(
    ostia_HU_df: pd.DataFrame, id_column: str = "ID", std_threshold: float = 500.0
) -> pd.DataFrame:
    """Label a dataframe of per-ostium (mu, std) rows: keep the min-std ostium
    per scan, drop rows with std >= threshold, label by mu corridor
    (reference ``label_ccta_scan``, data/utils.py:85-101)."""
    idx = ostia_HU_df.groupby(id_column)["std"].idxmin()
    ret = ostia_HU_df.loc[idx].copy()
    ret = ret.drop_duplicates(subset=["mu", "std"])
    ret = ret.loc[ret["std"] < std_threshold].copy()
    ret["label"] = ret["mu"].map(label_from_HU).astype("int8")
    return ret


def cross_val_splits(
    n_folds: int,
    *dataset_paths: Iterable,
    test_size: float = 0.2,
    seed: Optional[int] = None,
) -> Tuple[List[FoldType], List[FoldType]]:
    """Stratified k-fold (or single stratified split when n_folds == 1) over
    (path, label) pairs read from xlsx sheets with 'path' and 'label' columns
    (reference ``cross_val_splits``, data/utils.py:116-141)."""
    X, Y = [], []
    for df_path in dataset_paths:
        df = pd.read_excel(df_path) if str(df_path).endswith(".xlsx") else pd.read_csv(df_path)
        X += df["path"].values.tolist()
        Y += df["label"].values.tolist()
    X, Y = np.array(X), np.array(Y)

    if n_folds == 1:
        xtr, xva, ytr, yva = train_test_split(
            X, Y, test_size=test_size, shuffle=True, stratify=Y, random_state=seed
        )
        return [list(zip(xtr, ytr))], [list(zip(xva, yva))]

    train, val = [], []
    for tr_idx, va_idx in StratifiedKFold(
        n_splits=n_folds, shuffle=True, random_state=seed
    ).split(X, Y):
        train.append(list(zip(X[tr_idx], Y[tr_idx])))
        val.append(list(zip(X[va_idx], Y[va_idx])))
    return train, val


def divide_scans_in_fold(fold: FoldType) -> dict:
    """Group a fold's (path, label) pairs by label (reference
    ``divide_scans_in_fold``, trainer/utils.py:37-41).

    A fold entry may be an HDF5 corpus FILE (``data/hdf5.py``): it expands
    to its member patients, all under the entry's label — per-ScanType
    corpus files (``opt.h5`` / ``low.h5`` / ``high.h5``) are the natural
    shard layout for the "sharded HDF5 CT corpus" training stage."""
    out: dict = {}
    for path, label in fold:
        out.setdefault(int(label), []).extend(_expand_corpus(path))
    return out


def _expand_corpus(path) -> list:
    from contrast_gan_3d_tpu.data import hdf5

    if hdf5.HAS_H5PY and hdf5.is_hdf5_path(path):
        _, member = hdf5.split_member(path)
        if member is None:  # whole file: standalone patient OR corpus
            return hdf5.corpus_members(path)
    return [path]


def minmax_norm(x, value_range: Optional[Tuple[float, float]] = None):
    """(x - low) / (high - low) with an epsilon-guarded denominator
    (reference ``minmax_norm``, data/utils.py:104-112)."""
    if value_range is None:
        value_range = (x.min(), x.max())
    low, high = value_range
    return (x - low) / max(high - low, 1e-5)

"""HDF5 patient storage: standalone files and sharded corpus files.

BASELINE.json's north star names "host-side HDF5/NIfTI CCTA loading" and a
"sharded HDF5 CT corpus" for data-parallel training; the reference stores
patients as ``.npy`` + pickle sidecars only (``data/utils.py:20-54``). This
module keeps the exact packed ``(W, H, D, 2)`` int16 layout but in HDF5:

- **standalone**: one ``<name>.h5`` per patient (drop-in for ``.npy``);
- **corpus**: many patients as groups of ONE ``corpus.h5`` file, addressed
  as ``corpus.h5::<name>`` anywhere a patient path is accepted (fold lists,
  ``load_patient``, the samplers). A corpus file is the natural per-host
  shard unit on multi-host pods: each host opens only its own file(s).

Patch sampling reads stay windowed: ``h5py`` datasets slice like memmaps, so
a random 128^3 crop faults in only the touched chunks (chunk shape is
patch-read-aligned). Metadata that the ``.npy`` path pickles lives in native
HDF5 attributes/datasets — a corpus file is self-contained and portable.

h5py serializes all libhdf5 calls behind one lock, so concurrent reads from
the prefetch worker threads are safe (just serialized, like mmap page-in).
Files are opened read-only with libhdf5's weak close semantics: the returned
dataset keeps the underlying file alive without an explicit handle to manage.
"""

from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from contrast_gan_3d_tpu.utils.logging_utils import create_logger

try:  # h5py is optional: the .npy path never needs it
    import h5py

    HAS_H5PY = True
except ImportError:  # pragma: no cover - image always ships h5py
    h5py = None
    HAS_H5PY = False

logger = create_logger(name=__name__)

PathLike = Union[str, Path]

#: separator between a corpus file and a member name: ``corpus.h5::patient``
MEMBER_SEP = "::"
#: dataset holding the packed (W, H, D, 2) int16 scan+mask array
SCAN_DS = "scan_and_mask"
#: metadata arrays too large / too structured for attributes
_META_DATASETS = ("centerlines_world", "ostia_world")
_H5_SUFFIXES = (".h5", ".hdf5")


def _require_h5py():
    if not HAS_H5PY:
        raise ImportError(
            "h5py is required for HDF5 patient storage (.h5 paths); "
            "use the default .npy format or install h5py"
        )


def split_member(path: PathLike) -> Tuple[str, Optional[str]]:
    """``'corpus.h5::name'`` -> ``('corpus.h5', 'name')``; plain paths pass
    through with member ``None``."""
    text = str(path)
    if MEMBER_SEP in text:
        file_part, member = text.split(MEMBER_SEP, 1)
        return file_part, member or None
    return text, None


def is_hdf5_path(path: PathLike) -> bool:
    """True for ``*.h5``/``*.hdf5`` files and ``file.h5::member`` addresses."""
    file_part, _ = split_member(path)
    return file_part.lower().endswith(_H5_SUFFIXES)


def _chunk_shape(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """Patch-read-aligned chunks: 64^3 spatial blocks x all trailing dims.
    A random 128^3 crop then touches at most 3^3 chunks per channel."""
    return tuple(min(int(s), 64) for s in shape[:3]) + tuple(
        int(s) for s in shape[3:]
    )


def _write_meta(node, meta: Dict, compression: Optional[str]):
    for key in _META_DATASETS:
        if key in meta and meta[key] is not None:
            arr = np.asarray(meta[key], np.float64)
            node.create_dataset(key, data=arr, compression=compression)
    for key, value in meta.items():
        if key in _META_DATASETS:
            continue
        try:
            node.attrs[key] = value
        except TypeError:
            logger.warning(
                "HDF5 patient meta: dropping unserializable key %r (%s)",
                key,
                type(value).__name__,
            )


def _read_meta(node) -> Dict:
    meta: Dict = {}
    for key, value in node.attrs.items():
        if isinstance(value, bytes):
            value = value.decode("utf-8", errors="replace")
        elif isinstance(value, np.generic):
            value = value.item()
        meta[key] = value
    for key in _META_DATASETS:
        if key in node:
            meta[key] = np.asarray(node[key])
    return meta


def write_patient_h5(
    volume: np.ndarray,
    centerlines_mask: np.ndarray,
    meta: Dict,
    name: str,
    out: PathLike,
    compression: Optional[str] = None,
    chunks: Optional[Tuple[int, ...]] = None,
) -> str:
    """Write one patient. ``out`` is either a directory (-> standalone
    ``<out>/<name>.h5``) or a ``.h5`` corpus file the patient is appended to
    as group ``name`` (created if missing, replaced if present). Returns the
    addressable patient path (``file.h5`` or ``file.h5::name``).

    ``compression`` is any h5py filter (``"gzip"``, ``"lzf"``); the default
    is uncompressed for mmap-like random-crop read speed.

    ``chunks`` overrides the storage chunk shape (default: 64^3 spatial
    blocks x trailing dims, tuned for random 3D crops). Corpora meant for
    the 2D slice samplers should use z-thin chunks (e.g. ``(64, 64, 1, 2)``)
    — a single ``[:, :, z]`` slice read from 64^3 chunks faults in 64
    z-planes per chunk, ~64x the needed bytes.

    Corpus appends are single-writer (HDF5 has no concurrent-writer mode):
    parallel preprocessing jobs should write per-job corpus files or
    standalone patients — readers handle any mix."""
    _require_h5py()
    scan_and_mask = np.stack(
        [np.asarray(volume, np.int16), np.asarray(centerlines_mask, np.int16)],
        axis=-1,
    )
    meta = dict(meta) | {"name": name}
    out = Path(out)
    corpus = out.suffix.lower() in _H5_SUFFIXES
    if corpus:
        out.parent.mkdir(parents=True, exist_ok=True)
        with h5py.File(out, "a") as fd:
            if name in fd:
                del fd[name]
            group = fd.create_group(name)
            group.create_dataset(
                SCAN_DS,
                data=scan_and_mask,
                chunks=chunks or _chunk_shape(scan_and_mask.shape),
                compression=compression,
            )
            _write_meta(group, meta, compression)
        return f"{out}{MEMBER_SEP}{name}"
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{name}.h5"
    with h5py.File(path, "w") as fd:
        fd.create_dataset(
            SCAN_DS,
            data=scan_and_mask,
            chunks=chunks or _chunk_shape(scan_and_mask.shape),
            compression=compression,
        )
        _write_meta(fd, meta, compression)
    return str(path)


def open_patient_h5(
    path: PathLike, file_cache: Optional[Dict] = None
) -> Tuple["h5py.Dataset", Dict]:
    """Open a patient for windowed reads: ((W, H, D, 2) h5py dataset, meta).

    The dataset slices like the ``.npy`` memmap (``data[a:b, c:d, e:f]``)
    reading only the touched chunks. No file handle to manage: h5py's weak
    close semantics keep the file open for as long as the dataset lives.

    ``file_cache`` ({file path: h5py.File}) shares ONE OS file descriptor
    across all members of a corpus file — without it, a sampler touching
    every member of a 1500-patient corpus would hold 1500 fds of the same
    file and trip the default ulimit mid-training. Entries are owned by the
    caller for its lifetime (h5py serializes concurrent reads internally)."""
    _require_h5py()
    file_part, member = split_member(path)
    cached = file_cache is not None
    if cached:
        fd = file_cache.get(file_part)
        if fd is None:
            fd = h5py.File(file_part, "r")
            kept = file_cache.setdefault(file_part, fd)
            if kept is not fd:  # another thread raced the open; keep one fd
                fd.close()
                fd = kept
    else:
        fd = h5py.File(file_part, "r")
    try:
        node = fd[member] if member is not None else fd
        data = node[SCAN_DS]
        meta = _read_meta(node)
    except KeyError:
        available = f"; members: {sorted(fd.keys())[:16]}"
        if not cached:
            fd.close()
        raise KeyError(
            f"{path}: no patient data found "
            f"(member={member!r}, dataset={SCAN_DS!r}){available}"
        ) from None
    return data, meta


def corpus_members(path: PathLike) -> List[str]:
    """Addressable patient paths (``file.h5::name``) inside a corpus file,
    sorted by name. A standalone patient file returns itself."""
    _require_h5py()
    file_part, member = split_member(path)
    if member is not None:
        return [str(path)]
    with h5py.File(file_part, "r") as fd:
        if SCAN_DS in fd:
            return [str(path)]  # standalone patient
        return [
            f"{file_part}{MEMBER_SEP}{name}"
            for name in sorted(fd.keys())
            if isinstance(fd[name], h5py.Group) and SCAN_DS in fd[name]
        ]


def shard_members(members: List[str], shard_index: int, shard_count: int) -> List[str]:
    """Deterministic per-host slice of a corpus member list (the "sharded
    HDF5 CT corpus" layout: each host trains on members[i::n])."""
    assert 0 <= shard_index < shard_count, (shard_index, shard_count)
    return list(members[shard_index::shard_count])

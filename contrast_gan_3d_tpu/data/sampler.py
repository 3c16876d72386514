"""Host-side patch sampling from memory-mapped patients.

Capability parity with reference ``contrast_gan_3D/data/CCTADataLoader.py``:
per item, mmap-load a patient, pad to >= patch size and random-crop a 3D patch
of scan+centerline-mask jointly (:76-92); in 2D mode, 50% of the time pick a
slice through a random centerline point (guaranteed-vessel sampling, :51-69)
else a random slice. One sampler per ScanType stream.

TPU-first departures: patches stay int16 (mask int16 0/1) — f32 cast, HU
scaling and spatial augmentation happen on device inside the jitted train
step — and the multi-process batchgenerators augmenter stack is replaced by a
thin thread-based prefetcher (``pipeline.py``): mmap page-in releases the GIL,
and the heavy augmentation work has moved to the TPU.
"""

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from contrast_gan_3d_tpu.data.preprocess import load_patient
from contrast_gan_3d_tpu.utils import geometry as geom


def _pad_to(volume: np.ndarray, target: Sequence[int]) -> np.ndarray:
    """Center-pad the leading len(target) dims up to ``target`` (zeros)."""
    pads = []
    for i, t in enumerate(target):
        missing = max(0, t - volume.shape[i])
        pads.append((missing // 2, missing - missing // 2))
    pads += [(0, 0)] * (volume.ndim - len(target))
    if any(p != (0, 0) for p in pads):
        volume = np.pad(volume, pads)
    return volume


class CCTAPatchSampler:
    """Infinite random patch sampler over one ScanType's patient list."""

    def __init__(
        self,
        paths: List[str],
        patch_shape: Sequence[int],
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        shuffle: bool = True,
        infinite: bool = True,
        augmenter=None,  # HostAugmenter: native C++ warp per sample
        p_centerline_3d: float = 0.0,
    ):
        assert len(paths) > 0, "empty patient list"
        self.paths = list(paths)
        # identity of the stream's patient shard, embedded in every
        # get_state snapshot (which runs per batch in the prefetch worker —
        # don't re-stringify the list there)
        self._path_strs = [str(p) for p in self.paths]
        self.patch_shape = tuple(int(p) for p in patch_shape)
        self.is_2d = len(self.patch_shape) < 3
        self.batch_size = int(batch_size)
        # BASELINE.json north star: "coronary-centerline-guided 3D patch
        # extraction". With this probability a 3D crop is centered on a
        # random centerline point instead of drawn uniformly (the 3D
        # analogue of the reference's 2D 50/50 guided slices); the default
        # keeps the reference's uniform 3D crops (CCTADataLoader.py:83-91)
        self.p_centerline_3d = float(p_centerline_3d)
        self.rng = rng or np.random.default_rng()
        self.shuffle = shuffle
        self.infinite = infinite
        self.augmenter = augmenter
        self._order: List[int] = []
        self._epoch_done = False
        # prefetch workers sample concurrently; np.random.Generator is not
        # thread-safe, so all draws go through this lock (the heavy crop /
        # warp work happens outside it)
        self._rng_lock = threading.Lock()
        # {path: (memmap, meta)}: load_patient per SAMPLE re-opened the .npy
        # and re-unpickled the meta sidecar (which embeds the full centerline
        # array) on every patch; paths is a small fixed list, so keep the
        # mmaps open for the sampler's lifetime
        self._patients: Dict[str, tuple] = {}
        self._patients_lock = threading.Lock()
        # one h5py.File per corpus FILE shared by all its members — a
        # per-member open would hold one fd per patient (data/hdf5.py)
        self._h5_files: Dict[str, object] = {}

    def __len__(self) -> int:
        return len(self.paths)

    # -- resumable data stream (checkpointed alongside the model state) ----
    def get_state(self) -> Dict:
        """Snapshot the sampling stream: rng + epoch order (+ augmenter rng).
        Restoring via :meth:`set_state` reproduces the exact batch sequence
        from this point — the reference cannot do this (its augmenter worker
        rngs are not checkpointed)."""
        with self._rng_lock:
            state = {
                "rng": self.rng.bit_generator.state,
                "order": list(self._order),
                "epoch_done": self._epoch_done,
                # the epoch order indexes THIS patient list; a restore onto a
                # different list (e.g. a resharded multi-host fold) would
                # silently replay someone else's stream — record it so
                # set_state can refuse
                "paths": list(self._path_strs),
            }
            if self.augmenter is not None:
                state["augmenter_rng"] = self.augmenter.rng.bit_generator.state
        return state

    def set_state(self, state: Dict):
        saved_paths = state.get("paths")
        if saved_paths is not None and list(saved_paths) != self._path_strs:
            raise ValueError(
                "data-stream state was saved for a different patient list "
                f"({len(saved_paths)} patients vs {len(self.paths)} now) — "
                "the stream cannot be replayed over a different shard "
                "(did the host count or fold composition change?)"
            )
        with self._rng_lock:
            self.rng.bit_generator.state = state["rng"]
            self._order = list(state["order"])
            self._epoch_done = bool(state["epoch_done"])
            if self.augmenter is not None and "augmenter_rng" in state:
                self.augmenter.rng.bit_generator.state = state["augmenter_rng"]

    def _next_indices(self) -> List[int]:
        out = []
        with self._rng_lock:
            while len(out) < self.batch_size:
                if not self._order:
                    if self._epoch_done and not self.infinite:
                        if out:  # short final batch: the one-full-pass
                            return out  # semantics keep every patient
                        raise StopIteration  # one full pass (eval-style)
                    self._order = list(range(len(self.paths)))
                    self._epoch_done = True
                    if self.shuffle:
                        self.rng.shuffle(self._order)
                    else:
                        # pop() serves from the END — reverse so the
                        # unshuffled finite pass (eval-style) visits
                        # patients in list order, not backwards (shuffled
                        # epochs keep their historical stream bit-exactly)
                        self._order.reverse()
                out.append(self._order.pop())
        return out

    # ------------------------------------------------------------------
    def _sample_3d(self, data_and_seg: np.ndarray, meta: Dict) -> np.ndarray:
        """Random crop from the (virtually) center-padded volume: one native
        zero-padding window copy straight out of the mmap (only the cropped
        pages fault in); numpy fallback inside ``native.crop_pad_int16``."""
        from contrast_gan_3d_tpu import native

        target = np.broadcast_to(np.asarray(self.patch_shape), (3,))
        padded_shape = np.maximum(data_and_seg.shape[:3], target)
        pad_off = (padded_shape - np.asarray(data_and_seg.shape[:3])) // 2
        with self._rng_lock:
            # guided draws only happen when the feature is on AND usable, so
            # default-config rng streams are unchanged (bit-exact resume)
            guided = (
                self.p_centerline_3d > 0.0
                and len(meta.get("centerlines_world", ())) > 0
                and self.rng.random() < self.p_centerline_3d
            )
            if guided:
                idx = int(self.rng.integers(0, len(meta["centerlines_world"])))
            else:
                start = np.array(
                    [
                        int(self.rng.integers(0, padded_shape[i] - target[i] + 1))
                        - pad_off[i]  # center pad
                        for i in range(3)
                    ]
                )
        if guided:
            # patch window centered on a centerline point, clamped inside the
            # padded volume (the 3D analogue of the 2D branch below)
            ctls = np.asarray(meta["centerlines_world"])
            point = geom.world_to_image_coords(
                ctls[idx, :3], meta["offset"], meta["spacing"]
            )
            point = np.clip(point, 0, np.asarray(data_and_seg.shape[:3]) - 1)
            bbox = geom.get_patch_bounds(target, padded_shape, point + pad_off)
            start = bbox[:, 0] - pad_off
        return native.crop_pad_int16(data_and_seg, start, target)

    def _sample_2d(self, data_and_seg: np.ndarray, meta: Dict) -> np.ndarray:
        """50%: slice through a random centerline point, cropped around it;
        50%: random z slice, random crop (reference CCTADataLoader.py:51-69)."""
        W, H, D = data_and_seg.shape[:3]
        pw, ph = self.patch_shape
        with self._rng_lock:
            along_centerline = (
                self.rng.random() < 0.5 and len(meta.get("centerlines_world", ())) > 0
            )
            idx = (
                int(self.rng.integers(0, len(meta["centerlines_world"])))
                if along_centerline
                else 0
            )
        if along_centerline:
            ctls = meta["centerlines_world"]
            x, y, z = geom.world_to_image_coords(
                ctls[idx, :3], meta["offset"], meta["spacing"]
            )
            z = int(np.clip(z, 0, D - 1))
            # pad small in-plane dims up to the patch first (the reference's
            # centerline branch skips pad_nd_image, CCTADataLoader.py:55-69 —
            # a sub-patch scan would emit a short patch and break collation);
            # the center shifts by the pad offset so the vessel stays inside
            sl = np.asarray(data_and_seg[:, :, z])  # (W, H, 2)
            off = [(max(pw - W, 0)) // 2, (max(ph - H, 0)) // 2]
            sl = _pad_to(sl, (pw, ph))
            bbox = geom.get_patch_bounds(
                (pw, ph), sl.shape[:2], np.array([x + off[0], y + off[1]])
            )
            return sl[bbox[0, 0] : bbox[0, 1], bbox[1, 0] : bbox[1, 1]]
        with self._rng_lock:
            z = int(self.rng.integers(0, D))
        sl = _pad_to(np.asarray(data_and_seg[:, :, z]), (pw, ph))
        with self._rng_lock:
            sx = int(self.rng.integers(0, sl.shape[0] - pw + 1))
            sy = int(self.rng.integers(0, sl.shape[1] - ph + 1))
        return sl[sx : sx + pw, sy : sy + ph]

    # ------------------------------------------------------------------
    def _load_patient_cached(self, path: str):
        with self._patients_lock:
            hit = self._patients.get(path)
        if hit is not None:
            return hit
        loaded = load_patient(path, h5_file_cache=self._h5_files)
        with self._patients_lock:
            return self._patients.setdefault(path, loaded)

    def sample_one(self, path: str) -> Tuple[np.ndarray, str]:
        data_and_seg, meta = self._load_patient_cached(path)  # (W,H,D,2) mmap
        patch = (self._sample_2d if self.is_2d else self._sample_3d)(data_and_seg, meta)
        if self.augmenter is not None:
            # HostAugmenter (3D) / HostAugmenter2D — builder wires the one
            # matching the patch dimensionality
            scan, seg = self.augmenter(patch[..., 0], patch[..., 1])
            patch = np.stack([scan, seg], axis=-1)
        return patch, meta["name"]

    def next_batch(self) -> Dict[str, np.ndarray]:
        """{"data": (B, *patch) int16, "seg": (B, *patch) int16, "name", "path"}.
        In finite mode the last batch of the pass may be short (the epoch's
        trailing ``len(paths) % batch_size`` patients are still sampled)."""
        indices = self._next_indices()
        shape = (len(indices), *self.patch_shape)
        data = np.empty(shape, dtype=np.int16)
        seg = np.empty(shape, dtype=np.int16)
        names, paths = [], []
        for i, idx in enumerate(indices):
            patch, name = self.sample_one(self.paths[idx])
            data[i], seg[i] = patch[..., 0], patch[..., 1]
            names.append(name)
            paths.append(self.paths[idx])
        return {"data": data, "seg": seg, "name": names, "path": paths}

    def __iter__(self):
        while True:
            try:
                yield self.next_batch()
            except StopIteration:
                # PEP 479: a finite sampler's end-of-pass must end the loop,
                # not surface as "generator raised StopIteration"
                return

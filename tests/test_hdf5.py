"""HDF5 patient/corpus storage (``data/hdf5.py``) — BASELINE.json's
"host-side HDF5/NIfTI CCTA loading" and "sharded HDF5 CT corpus" stages.
Reference analogue: the .npy + pickle layout of ``data/utils.py:20-54``;
these tests prove the HDF5 path is a drop-in for it everywhere a patient
path is accepted (load_patient, samplers, prefetch loaders, preprocessing)."""

import numpy as np
import pytest

from contrast_gan_3d_tpu import native
from contrast_gan_3d_tpu.data import hdf5
from contrast_gan_3d_tpu.data.pipeline import PrefetchLoader
from contrast_gan_3d_tpu.data.preprocess import (
    create_patient,
    load_patient,
    write_patient,
)
from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler
from contrast_gan_3d_tpu.utils import io_utils

from tests.synth import make_dataset, synthetic_patient

PATCH = (16, 16, 16)


def test_standalone_roundtrip(tmp_path, rng):
    vol, mask, ctls, meta = synthetic_patient(rng)
    path = hdf5.write_patient_h5(vol, mask, meta, "p0", tmp_path)
    assert path.endswith("p0.h5")
    data, got = hdf5.open_patient_h5(path)
    assert data.shape == (*vol.shape, 2) and data.dtype == np.int16
    np.testing.assert_array_equal(np.asarray(data[..., 0]), vol)
    np.testing.assert_array_equal(np.asarray(data[..., 1]), mask.astype(np.int16))
    np.testing.assert_allclose(got["spacing"], meta["spacing"])
    np.testing.assert_allclose(got["offset"], meta["offset"])
    np.testing.assert_allclose(got["centerlines_world"], ctls)
    np.testing.assert_allclose(got["ostia_world"], meta["ostia_world"])
    assert got["name"] == "p0"


def test_corpus_members_addressing_and_sharding(tmp_path, rng):
    corpus = tmp_path / "corpus.h5"
    names = ["a", "b", "c"]
    written = []
    for name in names:
        vol, mask, _, meta = synthetic_patient(rng, shape=(12, 12, 12))
        written.append(hdf5.write_patient_h5(vol, mask, meta, name, corpus))
    assert written == [f"{corpus}::{n}" for n in names]

    members = hdf5.corpus_members(corpus)
    assert members == written
    for member in members:
        data, meta = hdf5.open_patient_h5(member)
        assert data.shape == (12, 12, 12, 2)
        assert meta["name"] == member.split(hdf5.MEMBER_SEP)[1]

    # deterministic disjoint cover (the per-host corpus shard layout)
    shards = [hdf5.shard_members(members, i, 2) for i in range(2)]
    assert sorted(shards[0] + shards[1]) == sorted(members)
    assert not set(shards[0]) & set(shards[1])


def test_corpus_rewrite_replaces_member(tmp_path, rng):
    corpus = tmp_path / "c.h5"
    vol, mask, _, meta = synthetic_patient(rng, shape=(8, 8, 8))
    hdf5.write_patient_h5(vol, mask, meta, "p", corpus)
    vol2 = vol + 1
    hdf5.write_patient_h5(vol2, mask, meta, "p", corpus)
    assert hdf5.corpus_members(corpus) == [f"{corpus}::p"]
    data, _ = hdf5.open_patient_h5(f"{corpus}::p")
    np.testing.assert_array_equal(np.asarray(data[..., 0]), vol2)


def test_missing_member_error_names_available(tmp_path, rng):
    corpus = tmp_path / "c.h5"
    vol, mask, _, meta = synthetic_patient(rng, shape=(8, 8, 8))
    hdf5.write_patient_h5(vol, mask, meta, "present", corpus)
    with pytest.raises(KeyError, match="present"):
        hdf5.open_patient_h5(f"{corpus}::absent")


def test_corpus_fd_shared_across_members(tmp_path, rng):
    """One OS file descriptor per corpus FILE: a sampler touching every
    member of a large corpus must not hold one fd per patient (a
    1500-member corpus would trip the default ulimit mid-training)."""
    corpus = tmp_path / "c.h5"
    members = []
    for i in range(4):
        vol, mask, _, meta = synthetic_patient(rng, shape=(12, 12, 12))
        members.append(hdf5.write_patient_h5(vol, mask, meta, f"p{i}", corpus))

    cache = {}
    datasets = [hdf5.open_patient_h5(m, file_cache=cache) for m in members]
    assert len(cache) == 1  # one fd for the whole corpus
    for (data, meta), m in zip(datasets, members):
        assert data.shape == (12, 12, 12, 2)
        assert meta["name"] == m.split(hdf5.MEMBER_SEP)[1]

    # a missing member must not close the SHARED fd out from under the
    # other members' live datasets
    with pytest.raises(KeyError, match="absent"):
        hdf5.open_patient_h5(f"{corpus}::absent", file_cache=cache)
    assert datasets[0][0][0, 0, 0, 0] is not None  # fd still usable

    # the sampler wires the cache through load_patient
    sampler = CCTAPatchSampler(members, (8, 8, 8), 2, rng=np.random.default_rng(0))
    for _ in range(4):
        sampler.next_batch()
    assert len(sampler._h5_files) == 1


def test_load_patient_dispatch(tmp_path, rng):
    vol, mask, _, meta = synthetic_patient(rng, shape=(10, 10, 10))
    standalone = write_patient(vol, mask, meta, "s", tmp_path, fmt="h5")
    member = write_patient(vol, mask, meta, "m", tmp_path / "corpus.h5")
    for path in (standalone, member):
        data, got = load_patient(path)
        assert data.shape == (10, 10, 10, 2)
        np.testing.assert_array_equal(np.asarray(data[..., 0]), vol)
        assert "spacing" in got and "centerlines_world" in got


def test_compressed_corpus_roundtrip(tmp_path, rng):
    vol, mask, ctls, meta = synthetic_patient(rng, shape=(16, 16, 16))
    path = hdf5.write_patient_h5(
        vol, mask, meta, "gz", tmp_path / "c.h5", compression="gzip"
    )
    data, got = hdf5.open_patient_h5(path)
    np.testing.assert_array_equal(np.asarray(data[..., 0]), vol)
    np.testing.assert_allclose(got["centerlines_world"], ctls)


def test_crop_pad_matches_ndarray_on_h5(tmp_path, rng):
    """The windowed-read fallback crops h5py datasets exactly like the
    native path crops ndarrays — including negative/overhanging windows."""
    vol, mask, _, meta = synthetic_patient(rng, shape=(12, 14, 10))
    packed = np.stack([vol, mask.astype(np.int16)], axis=-1)
    path = hdf5.write_patient_h5(vol, mask, meta, "p", tmp_path)
    data, _ = hdf5.open_patient_h5(path)
    for start in ([0, 0, 0], [-3, 5, -2], [8, 10, 6], [-20, -20, -20]):
        got = native.crop_pad_int16(data, start, (8, 8, 8))
        want = native.crop_pad_int16(packed, start, (8, 8, 8))
        np.testing.assert_array_equal(got, want)


def _batches(sampler, n):
    return [sampler.next_batch() for _ in range(n)]


def test_sampler_identical_batches_npy_vs_h5(tmp_path, rng):
    """Same patients, same seed: the .npy and HDF5 samplers emit IDENTICAL
    batch streams — storage format cannot change the data pipeline."""
    seed_rng = np.random.default_rng(11)
    vols = [synthetic_patient(seed_rng, shape=(20, 20, 20)) for _ in range(3)]
    npy_paths, h5_paths = [], []
    for i, (vol, mask, _, meta) in enumerate(vols):
        npy_paths.append(str(write_patient(vol, mask, meta, f"p{i}", tmp_path / "npy")))
        h5_paths.append(write_patient(vol, mask, meta, f"p{i}", tmp_path / "c.h5"))

    for patch in [PATCH, (16, 16)]:  # 3D and 2D (centerline-guided) paths
        a = CCTAPatchSampler(npy_paths, patch, 2, rng=np.random.default_rng(5))
        b = CCTAPatchSampler(h5_paths, patch, 2, rng=np.random.default_rng(5))
        for ba, bb in zip(_batches(a, 6), _batches(b, 6)):
            np.testing.assert_array_equal(ba["data"], bb["data"])
            np.testing.assert_array_equal(ba["seg"], bb["seg"])


def test_prefetch_loader_over_corpus(tmp_path, rng):
    """Concurrent prefetch workers reading one corpus file (h5py serializes
    libhdf5 calls behind its lock — safe, like mmap page-in)."""
    fold = make_dataset(tmp_path / "c.h5", rng, n_per_label=1)
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(paths, PATCH, batch_size=2, rng=rng)
    loader = PrefetchLoader(sampler, num_threads=2, prefetch=2, to_device=False)
    loader.start()
    for _ in range(4):
        batch = next(loader)
        assert batch["data"].shape == (2, *PATCH)
        assert batch["data"].dtype == np.int16
    loader.stop()


def test_create_patient_h5_end_to_end(tmp_path, rng):
    """Raw HDF5 CCTA scan -> create_patient -> HDF5 corpus member: the
    north star's host-side HDF5 loading drive, matched against the .npy
    output of the same inputs."""
    shape, spacing, offset = (16, 16, 8), (0.5, 0.5, 1.0), (-4.0, -4.0, 0.0)
    vol = rng.integers(-200, 800, shape, dtype=np.int16)
    io_utils.write_hdf5_image(
        vol, tmp_path / "p1.h5", spacing=np.asarray(spacing), origin=np.asarray(offset)
    )
    pdir = tmp_path / "p1"
    pdir.mkdir()
    (pdir / "vessel0.txt").write_text("-3.0 -3.0 2.0 0.5\n0.0 0.0 5.0 0.5\n")
    (pdir / "ostia.xml").write_text(
        "<XMarkerList><ListSize>2</ListSize>"
        "<Item><pos>-3 -3 2</pos></Item><Item><pos>0 0 5</pos></Item>"
        "</XMarkerList>"
    )
    out_h5 = create_patient(
        tmp_path / "p1.h5", pdir, pdir / "ostia.xml", tmp_path / "corpus.h5"
    )
    assert out_h5 == f"{tmp_path / 'corpus.h5'}::p1"
    data_h5, meta_h5 = load_patient(out_h5)

    # the same scan through the .mhd + .npy reference layout
    io_utils.write_mhd(
        vol, tmp_path / "p1.mhd", spacing=np.asarray(spacing), origin=np.asarray(offset)
    )
    out_npy = create_patient(
        tmp_path / "p1.mhd", pdir, pdir / "ostia.xml", tmp_path / "out"
    )
    data_npy, meta_npy = load_patient(out_npy)
    np.testing.assert_array_equal(np.asarray(data_h5), np.asarray(data_npy))
    np.testing.assert_allclose(meta_h5["spacing"], meta_npy["spacing"])
    np.testing.assert_allclose(meta_h5["offset"], meta_npy["offset"])
    np.testing.assert_allclose(
        meta_h5["centerlines_world"], meta_npy["centerlines_world"]
    )


def test_load_scan_hdf5_matches_mhd(tmp_path, rng):
    """load_scan treats an HDF5 raw scan exactly like the same volume in
    .mhd: reorientation, int16 cast, HU shift/clip."""
    shape = (10, 12, 8)
    vol = rng.integers(-3000, 4000, shape).astype(np.int32)
    spacing, offset = np.array([0.7, 0.8, 1.1]), np.array([1.0, -2.0, 3.0])
    io_utils.write_hdf5_image(vol, tmp_path / "s.h5", spacing=spacing, origin=offset)
    io_utils.write_mhd(
        vol.astype(np.int16), tmp_path / "s.mhd", spacing=spacing, origin=offset
    )
    got, meta_h5 = io_utils.load_scan(tmp_path / "s.h5")
    want, meta_mhd = io_utils.load_scan(tmp_path / "s.mhd")
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(meta_h5["spacing"], meta_mhd["spacing"])
    np.testing.assert_allclose(meta_h5["offset"], meta_mhd["offset"])
    assert meta_h5["orientation"] == meta_mhd["orientation"] == "LPS"


def test_stem_strips_h5_suffix():
    assert io_utils.stem("1.2.840.113.h5") == "1.2.840.113"
    assert io_utils.stem("scan.hdf5") == "scan"


def test_load_patient_or_scan_h5_schemas(tmp_path, rng):
    """eval's loader distinguishes preprocessed HDF5 patients (scan_and_mask)
    from raw HDF5 scans (image) by schema probe."""
    from contrast_gan_3d_tpu.eval.utils import load_patient_or_scan

    vol, mask, _, meta = synthetic_patient(rng, shape=(10, 10, 6))
    member = hdf5.write_patient_h5(vol, mask, meta, "p", tmp_path / "c.h5")
    got, m = load_patient_or_scan(member)
    np.testing.assert_array_equal(got, vol)
    assert "centerlines_world" in m

    raw = rng.integers(-500, 900, size=(8, 8, 4)).astype(np.int16)
    io_utils.write_hdf5_image(raw, tmp_path / "raw.h5")
    got2, m2 = load_patient_or_scan(tmp_path / "raw.h5")
    np.testing.assert_array_equal(got2, raw)
    assert m2["orientation"] == "LPS"


def test_fold_corpus_file_expansion(tmp_path, rng):
    """A fold entry naming a per-ScanType corpus FILE expands to its member
    patients under that label (the sharded-corpus training layout); loaders
    build directly from it."""
    from contrast_gan_3d_tpu.data.labeling import divide_scans_in_fold
    from contrast_gan_3d_tpu.data.pipeline import create_loaders

    files = {}
    for label, fname in [(0, "opt.h5"), (-1, "low.h5"), (1, "high.h5")]:
        for i in range(2):
            vol, mask, _, meta = synthetic_patient(rng, shape=(20, 20, 20))
            hdf5.write_patient_h5(vol, mask, meta, f"p{i}", tmp_path / fname)
        files[label] = str(tmp_path / fname)
    fold = [(files[0], 0), (files[-1], -1), (files[1], 1)]

    by_label = divide_scans_in_fold(fold)
    assert {k: len(v) for k, v in by_label.items()} == {0: 2, -1: 2, 1: 2}
    assert all(hdf5.MEMBER_SEP in p for ps in by_label.values() for p in ps)

    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 1}, rng, num_threads=1, to_device=False
    )
    try:
        assert next(loaders[0])["data"].shape == (2, *PATCH)
        assert next(loaders[-1])["data"].shape == (1, *PATCH)
    finally:
        for l in loaders.values():
            l.stop()


def test_host_fold_shard_single_process(tmp_path, rng):
    """host_fold_shard on one process returns the full expanded fold with
    per-label streams intact (N-process behavior = paths[i::n] per label,
    exercised for real in tests/test_multihost.py's two-process harness)."""
    from contrast_gan_3d_tpu.parallel.multihost import host_fold_shard

    files = {}
    for label, fname in [(0, "opt.h5"), (-1, "low.h5"), (1, "high.h5")]:
        for i in range(2):
            vol, mask, _, meta = synthetic_patient(rng, shape=(12, 12, 12))
            hdf5.write_patient_h5(vol, mask, meta, f"p{i}", tmp_path / fname)
        files[label] = str(tmp_path / fname)
    fold = [(files[0], 0), (files[-1], -1), (files[1], 1)]
    shard = host_fold_shard(fold)
    labels = [l for _, l in shard]
    assert sorted(labels) == [-1, -1, 0, 0, 1, 1]
    assert all(hdf5.MEMBER_SEP in p for p, _ in shard)


def test_create_dataset_script_mixed_formats(tmp_path, rng):
    """scripts/create_dataset.py labels a patients dir holding BOTH .npy
    patients and an HDF5 corpus; the split pickle carries corpus-member
    paths that load_patient resolves."""
    import pickle
    import subprocess
    import sys

    pdir = tmp_path / "patients"
    pdir.mkdir()
    for i in range(3):
        vol, mask, _, meta = synthetic_patient(rng, shape=(24, 24, 24))
        write_patient(vol, mask, meta, f"npy{i}", pdir)
    for i in range(3):
        vol, mask, _, meta = synthetic_patient(rng, shape=(24, 24, 24))
        hdf5.write_patient_h5(vol, mask, meta, f"h5{i}", pdir / "corpus.h5")

    out = tmp_path / "dataset"
    proc = subprocess.run(
        [sys.executable, "scripts/create_dataset.py", str(pdir), str(out),
         "--n-folds", "2"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": str(tmp_path)},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(out / "cross_val_splits.pkl", "rb") as fd:
        splits = pickle.load(fd)
    paths = {p for fold in splits["train"] + splits["test"] for p, _ in fold}
    assert sum(hdf5.MEMBER_SEP in p for p in paths) == 3
    assert sum(p.endswith(".npy") for p in paths) == 3
    member = next(p for p in paths if hdf5.MEMBER_SEP in p)
    data, _ = load_patient(member)
    assert data.shape == (24, 24, 24, 2)


def test_missing_corpus_member_error_not_masked(tmp_path, rng):
    """A bad member address surfaces the diagnostic KeyError (listing
    available members) instead of a raw-scan fallback's format error."""
    from contrast_gan_3d_tpu.eval.utils import load_patient_or_scan

    vol, mask, _, meta = synthetic_patient(rng, shape=(8, 8, 8))
    hdf5.write_patient_h5(vol, mask, meta, "present", tmp_path / "c.h5")
    with pytest.raises(KeyError, match="present"):
        load_patient_or_scan(f"{tmp_path / 'c.h5'}::absent")


def test_uppercase_h5_suffix_dispatch(tmp_path, rng):
    """Suffix dispatch is case-insensitive end to end: an uppercase raw
    HDF5 scan loads through the scan path, not the patient probe."""
    from contrast_gan_3d_tpu.eval.utils import load_patient_or_scan

    raw = rng.integers(-500, 900, size=(6, 6, 4)).astype(np.int16)
    io_utils.write_hdf5_image(raw, tmp_path / "SCAN.H5")
    got, meta = load_patient_or_scan(tmp_path / "SCAN.H5")
    np.testing.assert_array_equal(got, raw)
    assert meta["orientation"] == "LPS"


def test_create_dataset_rejects_raw_h5(tmp_path, rng):
    """patient_paths fails loudly on .h5 files that are neither patients
    nor corpora (e.g. raw scans) instead of yielding zero patients."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "create_dataset_script", "scripts/create_dataset.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    raw = rng.integers(-500, 900, size=(6, 6, 4)).astype(np.int16)
    io_utils.write_hdf5_image(raw, tmp_path / "raw.h5")
    with pytest.raises(SystemExit, match="preprocess"):
        mod.patient_paths(tmp_path / "raw.h5")
    with pytest.raises(SystemExit, match="no preprocessed patients"):
        mod.patient_paths(tmp_path / "empty_does_not_glob")


def test_write_patient_h5_custom_chunks(tmp_path, rng):
    """chunks= overrides the 64^3 default (z-thin chunks for 2D-slice
    corpora)."""
    import h5py

    from contrast_gan_3d_tpu.data.hdf5 import SCAN_DS, write_patient_h5

    vol = rng.integers(-1000, 1000, (80, 70, 9), dtype=np.int16)
    mask = (rng.random((80, 70, 9)) < 0.01).astype(np.int16)
    meta = {"spacing": np.ones(3), "offset": np.zeros(3)}
    path = write_patient_h5(
        vol, mask, meta, "p0", tmp_path, chunks=(64, 64, 1, 2)
    )
    with h5py.File(path, "r") as fd:
        assert fd[SCAN_DS].chunks == (64, 64, 1, 2)
        np.testing.assert_array_equal(fd[SCAN_DS][..., 0], vol)

"""Numeric parity of the numpy layers against the ACTUAL reference code.

Complements ``test_reference_parity.py`` (models/losses/GP vs the live torch
reference) by executing the reference's pure-numpy modules — geometry, the
intensity scalers, labeling, and the marker-recall eval pipeline — by file
path and asserting our implementations agree on identical random inputs:

- ``utils/geometry.py``: fast_trilinear (exact, incl. deep out-of-range
  truncation/extrapolation semantics), world_to_image_coords,
  world_to_grid_coords, get_patch_bounds, draw_sample_3D_world_fast,
  extract_ostia_patch_3D, pointwise_euclidean_distance
- ``data/Scaler.py``: ZeroCenterScaler / FactorZeroCenterScaler scale+unscale
- ``data/utils.py``: label_ccta_scan, minmax_norm, cross_val_splits (the
  StratifiedKFold stream; pd.read_excel is monkeypatched for both sides —
  openpyxl is not in this image)
- ``utils/io_utils.py``: load_centerlines / load_ASOCA_annotated_centerlines
  (SimpleITK/torchio are stubbed; only the pure-numpy parsers are exercised)
- ``eval/marker_recall_rate.py``: the full per-patient -> per-ScanType ->
  optimal-vs-suboptimal recall pipeline on a synthetic patient tree

The reference modules are loaded under the ``contrast_gan_3D`` name with the
same sys.modules stubbing strategy as test_reference_parity.py (shared-state
safe in either import order).
"""

import importlib
import sys
import types
from enum import Enum
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import contrast_gan_3d_tpu.utils as our_utils
from contrast_gan_3d_tpu.alias import ScanType as OurScanType
from contrast_gan_3d_tpu.data import labeling as our_labeling
from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler, ZeroCenterScaler
from contrast_gan_3d_tpu.eval import marker_recall_rate as our_mrr
from contrast_gan_3d_tpu.utils import geometry as our_geom
from contrast_gan_3d_tpu.utils import io_utils as our_io

REF = Path("/root/reference/contrast_gan_3D")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="no reference checkout")


# ---------------------------------------------------------------- loading
def _ensure_stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        if not hasattr(mod, k):
            setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Reference numpy-layer modules, loaded live from /root/reference."""
    pkg = sys.modules.get("contrast_gan_3D")
    if pkg is None:
        pkg = types.ModuleType("contrast_gan_3D")
        sys.modules["contrast_gan_3D"] = pkg
    pkg.__path__ = [str(REF)]

    # alias stub: the real one imports batchgenerators (absent); ScanType is
    # a real enum so ScanType(label) round-trips in the eval pipeline
    class RefScanType(Enum):
        OPT = 0
        LOW = -1
        HIGH = 1

    _ensure_stub(
        "contrast_gan_3D.alias",
        ArrayShape=tuple, Shape3D=tuple, Array=object, FoldType=list,
        BGenAugmenter=object, ScanType=RefScanType,
    )
    # binary deps of io_utils / data.utils that the numpy parsers never touch
    _ensure_stub("SimpleITK", Image=object)
    _ensure_stub("torchio")
    _ensure_stub("batchgenerators")
    _ensure_stub("batchgenerators.utilities")
    _ensure_stub(
        "batchgenerators.utilities.file_and_folder_operations",
        load_pickle=lambda *a, **k: None, write_pickle=lambda *a, **k: None,
    )

    # HU_distribution_shift imports trainer.utils (-> batchgenerators/wandb);
    # stub just the one helper it calls, BEFORE the import machinery can try
    # to execute the real trainer/utils.py
    def _divide_scans_in_fold(fold):
        out = {}
        for path, label in fold:
            out.setdefault(label, []).append(path)
        return out

    trainer_pkg = _ensure_stub("contrast_gan_3D.trainer")
    tr_utils = _ensure_stub(
        "contrast_gan_3D.trainer.utils", divide_scans_in_fold=_divide_scans_in_fold
    )
    trainer_pkg.utils = tr_utils

    mods = {}
    for name in (
        "constants",
        "utils",
        "utils.geometry",
        "utils.io_utils",
        "data.Scaler",
        "data.utils",
        "eval.marker_recall_rate",
        "eval.HU_distribution_shift",
    ):
        mods[name] = importlib.import_module(f"contrast_gan_3D.{name}")
    mods["ScanType"] = sys.modules["contrast_gan_3D.alias"].ScanType
    return mods


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


# ---------------------------------------------------------------- geometry
def test_trilinear_exact_parity(ref, rng):
    """Exact (bitwise-domain) agreement with fast_trilinear, including the
    reference's truncation-toward-zero base index and independent clipping of
    the +1 neighbor for coordinates far outside the volume."""
    geom = ref["utils.geometry"]
    vol = rng.normal(size=(9, 8, 7)).astype(np.float32)
    n = 500
    xs = rng.uniform(-3.5, 12.5, n)
    ys = rng.uniform(-3.5, 11.5, n)
    zs = rng.uniform(-3.5, 10.5, n)
    # fast_trilinear clamps its index arrays in place — hand it copies
    want = geom.fast_trilinear(vol, xs.copy(), ys.copy(), zs.copy())
    got = our_geom.trilinear_interpolate(vol, xs, ys, zs)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_world_to_image_and_grid_coords_parity(ref, rng):
    geom = ref["utils.geometry"]
    pts = rng.uniform(-60, 120, (300, 3))
    offset = np.array([-48.5, 12.25, -7.75])
    spacing = np.array([0.42, 0.42, 0.8])
    np.testing.assert_array_equal(
        our_geom.world_to_image_coords(pts, offset, spacing),
        geom.world_to_image_coords(pts, offset, spacing),
    )
    grid_shape = (48, 40, 32)
    np.testing.assert_array_equal(
        our_geom.world_to_grid_coords(pts, offset, spacing, grid_shape),
        geom.world_to_grid_coords(pts, offset, spacing, grid_shape),
    )


def test_get_patch_bounds_parity(ref, rng):
    geom = ref["utils.geometry"]
    source_shape = (73, 61, 47)
    targets = [(16, 16, 16), (15, 9, 7), (73, 61, 47)]
    coords = [
        np.array([0, 0, 0]), np.array([72, 60, 46]), np.array([36, 30, 23]),
        np.array([2, 59, 5]),
    ] + [rng.integers(0, (73, 61, 47)) for _ in range(20)]
    for target in targets:
        for c in coords:
            want = geom.get_patch_bounds(target, source_shape, c.copy())
            got = our_geom.get_patch_bounds(target, source_shape, c.copy())
            np.testing.assert_array_equal(got, want, err_msg=f"{target} {c}")


def test_get_patch_bounds_minus_one_reference_bug(ref):
    """DOCUMENTED DIVERGENCE: for a -1 ("whole dim") target at a clamped edge
    the reference returns a degenerate [0, -1] window — parse_patch_size is
    applied to `half` but NOT to the `target_shape` used for clamping
    (reference geometry.py:131-138), so `slice(0, -1)` silently drops the last
    row. We resolve -1 before clamping and return the full-dim window."""
    geom = ref["utils.geometry"]
    want = geom.get_patch_bounds((-1, 32, 8), (73, 61, 47), np.array([0, 0, 0]))
    assert want[0].tolist() == [0, -1]  # the reference bug, pinned
    got = our_geom.get_patch_bounds((-1, 32, 8), (73, 61, 47), np.array([0, 0, 0]))
    assert got[0].tolist() == [0, 73]
    np.testing.assert_array_equal(got[1:], want[1:])


def test_world_patch_and_ostia_parity(ref, rng):
    geom = ref["utils.geometry"]
    scan = rng.normal(0, 300, (40, 36, 30)).astype(np.float32)
    spacing = np.array([0.41, 0.47, 0.83])
    patch_size = np.array([19] * 3)
    patch_spacing = np.array([0.5] * 3)
    # centers in world mm relative to the origin, incl. near-edge ones that
    # drive coordinates out of range
    centers = [
        np.array([8.0, 8.0, 12.0]),
        np.array([0.7, 0.3, 0.9]),
        np.array([15.9, 16.5, 24.2]),
    ]
    for c in centers:
        want = geom.draw_sample_3D_world_fast(
            scan, c[0], c[1], c[2], spacing, patch_size, patch_spacing
        )
        got = our_geom.sample_world_patch(scan, c, spacing, patch_size, patch_spacing)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)

    ostia_world = np.stack([c + np.array([-20.0, 10.0, -5.0]) for c in centers])
    offset = np.array([-20.0, 10.0, -5.0])
    want = geom.extract_ostia_patch_3D(scan, ostia_world, offset, spacing)
    got = our_geom.extract_ostia_patch(scan, ostia_world, offset, spacing)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_pointwise_distance_parity(ref, rng):
    geom = ref["utils.geometry"]
    a = rng.normal(0, 50, (37, 3))
    b = rng.normal(0, 50, (11, 3))
    np.testing.assert_array_equal(
        our_geom.pointwise_euclidean_distance(a, b),
        geom.pointwise_euclidean_distance(a, b),
    )


def test_parse_patch_size_parity(ref):
    utils = ref["utils"]
    for target, src in [((-1, 32, 8), (73, 61, 47)), ((16, -1, -1), (9, 9, 9)),
                        ((4, 4, 4), (5, 6, 7))]:
        np.testing.assert_array_equal(
            our_utils.parse_patch_size(target, src), utils.parse_patch_size(target, src)
        )


# ---------------------------------------------------------------- scalers
@pytest.mark.parametrize("low,high,factor", [(-1024, 1500, 600), (-901, 1201, 555), (-3, 7, 2)])
def test_scaler_parity(ref, rng, low, high, factor):
    Scaler = ref["data.Scaler"]
    x_int = rng.integers(low, high, (17, 13), dtype=np.int16)
    x_f = x_int.astype(np.float32)

    r_zc = Scaler.ZeroCenterScaler(low=low, high=high)
    o_zc = ZeroCenterScaler(low=low, high=high)
    assert o_zc.shift == r_zc.shift
    np.testing.assert_array_equal(o_zc(x_int), r_zc(x_int))
    np.testing.assert_array_equal(o_zc.unscale(x_int), r_zc.unscale(x_int))

    r_f = Scaler.FactorZeroCenterScaler(low=low, high=high, factor=factor)
    o_f = FactorZeroCenterScaler(low=low, high=high, factor=factor)
    np.testing.assert_array_equal(o_f(x_f), r_f(x_f))
    np.testing.assert_array_equal(o_f.unscale(o_f(x_f)), r_f.unscale(r_f(x_f)))


# ---------------------------------------------------------------- labeling
def test_label_ccta_scan_parity(ref, rng):
    """Min-std ostium per scan, std filter, HU-corridor labels — including the
    exact boundary values 300/500 (reference data/utils.py:85-101)."""
    dutils = ref["data.utils"]
    ids = [f"p{i:02d}" for i in range(12) for _ in range(2)]  # 2 ostia per scan
    mus = rng.uniform(100, 700, len(ids))
    mus[:6] = [300.0, 299.9, 500.0, 500.1, 450.0, 100.0]  # corridor boundaries
    stds = rng.uniform(10, 600, len(ids))  # some rows cross the 500 filter
    df = pd.DataFrame({"ID": ids, "mu": mus, "std": stds})

    want = dutils.label_ccta_scan(df.copy())
    got = our_labeling.label_ccta_scans(df.copy())
    pd.testing.assert_frame_equal(
        got.sort_values("ID").reset_index(drop=True),
        want.sort_values("ID").reset_index(drop=True),
        check_like=True,
    )


def test_minmax_norm_parity(ref, rng):
    dutils = ref["data.utils"]
    x = rng.normal(0, 100, (9, 9)).astype(np.float32)
    np.testing.assert_array_equal(our_labeling.minmax_norm(x), dutils.minmax_norm(x))
    np.testing.assert_array_equal(
        our_labeling.minmax_norm(x, (-50.0, 50.0)), dutils.minmax_norm(x, (-50.0, 50.0))
    )


def test_cross_val_splits_parity(ref, rng, tmp_path, monkeypatch):
    """Same StratifiedKFold stream for the same seed. pd.read_excel is
    monkeypatched (no openpyxl in this image) — both implementations call it
    with the same path, so the split logic is what's under test."""
    dutils = ref["data.utils"]
    n = 60
    frame = pd.DataFrame({
        "path": [f"/data/scan_{i}.npy" for i in range(n)],
        "label": rng.choice([-1, 0, 1], n, p=[0.2, 0.5, 0.3]),
    })
    monkeypatch.setattr(pd, "read_excel", lambda p: frame.copy())
    sheet = tmp_path / "dataset.xlsx"
    sheet.touch()

    for folds in (1, 3):
        want_tr, want_va = dutils.cross_val_splits(folds, sheet, seed=42)
        got_tr, got_va = our_labeling.cross_val_splits(folds, sheet, seed=42)
        for ours, theirs in ((got_tr, want_tr), (got_va, want_va)):
            assert len(ours) == len(theirs)
            for fold_a, fold_b in zip(ours, theirs):
                assert [(str(p), int(l)) for p, l in fold_a] == [
                    (str(p), int(l)) for p, l in fold_b
                ]


# ---------------------------------------------------------------- io parsers
def test_load_centerlines_parity(ref, rng, tmp_path):
    io_ref = ref["utils.io_utils"]
    d = tmp_path / "ctls"
    d.mkdir()
    for i in range(3):
        pts = rng.normal(0, 40, (rng.integers(5, 20), 4)).astype(np.float32)
        np.savetxt(d / f"vessel{i}.txt", pts)
    (d / "ostia.xml").write_text("<x/>")  # must be ignored by the glob
    want = io_ref.load_centerlines(d)
    got = our_io.load_centerlines(d)
    # the reference concatenates in glob order (unordered); compare as ROW
    # sets via a lexicographic row sort — a per-column independent sort
    # would pass even if coordinates recombined across points
    assert want.shape == got.shape

    def row_sorted(a):
        a = np.asarray(a, np.float64).reshape(-1, 4)
        return a[np.lexsort(a.T[::-1])]

    np.testing.assert_allclose(row_sorted(got), row_sorted(want), rtol=1e-6)


def test_load_asoca_annotations_parity(ref, tmp_path):
    io_ref = ref["utils.io_utils"]
    f = tmp_path / "annotations.txt"
    f.write_text("1 12.5 -3.25 88.0\n2 0.5 42.125 -7.5\n3 1.0 2.0 3.0\n")
    np.testing.assert_allclose(
        our_io.load_ASOCA_annotated_centerlines(f),
        io_ref.load_ASOCA_annotated_centerlines(f),
    )


# ---------------------------------------------------------------- marker recall
def _make_patient_tree(root: Path, rng, names):
    ctl_root = root / "centerlines"
    ann_root = root / "annotations"
    for name in names:
        cdir = ctl_root / name
        adir = ann_root / name
        cdir.mkdir(parents=True)
        adir.mkdir(parents=True)
        base = rng.normal(0, 30, (1, 3))
        for v in range(rng.integers(2, 4)):
            pts = base + rng.normal(0, 15, (int(rng.integers(30, 80)), 3))
            np.savetxt(cdir / f"vessel{v}.txt", np.hstack([pts, np.ones((len(pts), 1))]))
        for art in ("LAD", "LCX", "RCA"):
            # a mix of hits (near centerline points) and clear misses
            hits = base + rng.normal(0, 4, (3, 3))
            miss = base + 200.0 + rng.normal(0, 1, (1, 3))
            np.savetxt(adir / f"{art}.txt", np.vstack([hits, miss]))
    return ctl_root, ann_root


# the reference's mp.Pool forks from the (multi-threaded) pytest process —
# its warnings (fork-in-threads Deprecation/RuntimeWarning), not ours
@pytest.mark.filterwarnings("ignore::DeprecationWarning")
@pytest.mark.filterwarnings("ignore::RuntimeWarning")
def test_marker_recall_pipeline_parity(ref, rng, tmp_path):
    """Full pipeline: per-patient nearest-centerline distances -> per-ScanType
    aggregation -> recall@5mm -> optimal-vs-suboptimal summary, reference
    (mp.Pool) vs ours (thread pool) on the same synthetic patient tree."""
    mrr_ref = ref["eval.marker_recall_rate"]
    names = [f"pat{i}" for i in range(6)]
    labels = [0, 0, -1, -1, 1, 1]
    ctl_root, ann_root = _make_patient_tree(tmp_path, rng, names)
    df = pd.DataFrame({"ID": names, "label": labels})

    want_dist, want_metrics = mrr_ref.eval_model_marker_recall_rate(
        ctl_root, ann_root, df, processes=2
    )
    got_dist, got_metrics = our_mrr.eval_model_marker_recall_rate(
        ctl_root, ann_root, df, workers=2
    )

    want_by_val = {st.value: v for st, v in want_metrics.items()}
    got_by_val = {st.value: v for st, v in got_metrics.items()}
    assert set(want_by_val) == set(got_by_val) == {-1, 0, 1}
    for val, arteries in want_by_val.items():
        assert set(arteries) == set(got_by_val[val])
        for art, recall in arteries.items():
            assert got_by_val[val][art] == pytest.approx(recall, abs=1e-12)

    # distances agree (sorted — the reference's glob order is unspecified)
    for st_ref, per_artery in want_dist.items():
        ours = got_dist[OurScanType(st_ref.value)]
        for art, dd in per_artery.items():
            np.testing.assert_allclose(
                np.sort(ours[art]["dist"]), np.sort(dd["dist"]), rtol=1e-9
            )

    # optimal-vs-suboptimal summary (reference :127-140)
    want_sum = mrr_ref.summarize_marker_recall_rate(want_dist)
    got_sum = our_mrr.summarize_marker_recall_rate(got_dist)
    assert set(want_sum) == set(got_sum) == {"optimal", "suboptimal"}
    for bucket in ("optimal", "suboptimal"):
        assert set(want_sum[bucket]) == set(got_sum[bucket])
        for art, recall in want_sum[bucket].items():
            assert got_sum[bucket][art] == pytest.approx(recall, abs=1e-12)


def test_ostia_dataframe_parity(ref, tmp_path, rng):
    """Two-row-per-patient L/R ostia sheet built from MeVis marker files,
    patient IDs from the parent directory (reference data/utils.py:57-84).

    Documented divergence we FIX: the reference's ``stem`` truncates at the
    first dot, so DICOM-UID-style directory names ("1.2.840...") collapse to
    "1" and collide; ours keeps the full directory name."""
    dutils = ref["data.utils"]

    def _make(names):
        files = []
        for name in names:
            d = tmp_path / name
            d.mkdir()
            pts = rng.uniform(-50, 50, (2, 3))
            f = d / "ostia.xml"
            f.write_text(
                "<ListSize>2</ListSize>\n"
                + "".join(f"<pos>{x} {y} {z}</pos>\n<vec>0 0 1</vec>\n" for x, y, z in pts)
            )
            files.append(f)
        return files

    files = _make(["patA", "patB", "patC"])
    want = dutils.create_ostia_dataframe(files)
    got = our_labeling.ostia_dataframe(files)
    pd.testing.assert_frame_equal(got, want)

    csv = tmp_path / "sheet.csv"
    our_labeling.ostia_dataframe(files, save_path=csv)
    re_read = pd.read_csv(csv)
    pd.testing.assert_frame_equal(re_read, want, check_dtype=False)

    uid_files = _make(["1.2.840.99", "1.3.840.99"])
    assert list(dutils.create_ostia_dataframe(uid_files)["ID"]) == ["1"] * 4  # collides
    assert list(our_labeling.ostia_dataframe(uid_files)["ID"]) == (
        ["1.2.840.99"] * 2 + ["1.3.840.99"] * 2
    )


def test_load_mevis_coords_parity(ref, tmp_path):
    io_ref = ref["utils.io_utils"]
    xml = tmp_path / "ostia.xml"
    xml.write_text(
        "<ListSize>2</ListSize>\n"
        "<pos>1.5 -2.25 30.0</pos>\n<vec>0.0 0.5 1.0</vec>\n"
        "<pos>-4.5 8.125 12.5</pos>\n<vec>1.0 0.0 0.25</vec>\n"
    )
    want_pts, want_vecs = io_ref.load_mevis_coords(xml)
    got_pts, got_vecs = our_io.load_mevis_coords(xml)
    np.testing.assert_allclose(got_pts, want_pts)
    np.testing.assert_allclose(got_vecs, want_vecs)


# ---------------------------------------------------------------- HU shift
@pytest.mark.filterwarnings("ignore::DeprecationWarning")  # reference mp.Pool fork
@pytest.mark.filterwarnings("ignore::RuntimeWarning")
def test_hu_distribution_shift_pipeline_parity(ref, rng, tmp_path, monkeypatch):
    """Full voxel-collection pipeline (mask rasterization -> masked gathers ->
    per-ScanType aggregation) on identical on-disk patients. The reference's
    ``load_sitk_image`` is monkeypatched to our .mhd reader (the readers
    themselves are covered by the io goldens tests), so what's under test is
    reference HU_distribution_shift.py:14-74 logic vs ours."""
    hu_ref = ref["eval.HU_distribution_shift"]
    io_ref = ref["utils.io_utils"]
    from contrast_gan_3d_tpu.eval import hu_distribution_shift as our_hu

    spacing = np.array([0.5, 0.5, 0.7])
    origin = np.array([-5.0, -4.0, -3.0])
    eval_paths = []
    for i, label in enumerate([0, -1, 1]):
        vol = rng.integers(-500, 900, (24, 20, 16), dtype=np.int16)
        scan = tmp_path / f"scan{i}.mhd"
        our_io.write_mhd(vol, scan, spacing=spacing, origin=origin)
        myo = rng.random((24, 20, 16)) < 0.2
        myo_path = tmp_path / f"myo{i}.mhd"
        our_io.write_mhd(myo.astype(np.uint8), myo_path, spacing=spacing, origin=origin)
        cdir = tmp_path / f"ctls{i}"
        cdir.mkdir()
        pts_img = rng.uniform(0, (23, 19, 15), (40, 3))
        pts_world = pts_img * spacing + origin
        np.savetxt(cdir / "vessel0.txt", np.hstack([pts_world, np.ones((40, 1))]))
        ostia_world = pts_world[:2]
        (cdir / "ostia.xml").write_text(
            "<ListSize>2</ListSize>\n"
            + "".join(
                f"<pos>{x} {y} {z}</pos>\n<vec>0 0 1</vec>\n" for x, y, z in ostia_world
            )
        )
        eval_paths.append(([str(scan), str(cdir), str(myo_path)], label))

    monkeypatch.setattr(
        io_ref, "load_sitk_image",
        lambda p, segmentation=False: our_io.load_scan(p, segmentation=segmentation),
    )
    want = hu_ref.collect_voxels_intensity(eval_paths, processes=2)
    got = our_hu.collect_voxels_intensity(eval_paths, workers=2)

    want_by_val = {st.value: d for st, d in want.items()}
    got_by_val = {st.value: d for st, d in got.items()}
    assert set(want_by_val) == set(got_by_val) == {-1, 0, 1}
    for val, by_region in want_by_val.items():
        assert set(by_region) == {"centerlines", "ostia", "myocardium"}
        assert set(got_by_val[val]) == set(by_region)
        for region, vals in by_region.items():
            np.testing.assert_array_equal(got_by_val[val][region], vals)


# ---------------------------------------------------------------- optimizers
@pytest.mark.parametrize(
    "kind,kwargs",
    [
        ("adam", dict(lr=2e-4, betas=(0.5, 0.999))),  # basic_conf.py:33-37
        ("adam", dict(lr=1e-4, betas=(0.0, 0.9))),  # gradient_penalty_conf.py
        ("rmsprop", dict(lr=5e-5)),  # rmsprop_conf.py
    ],
)
def test_optimizer_update_parity(kind, kwargs):
    """The reference trains with torch.optim.{Adam,RMSprop} + MultiStepLR
    stepped after every optimizer step (Trainer.py:138-140, basic_conf.py:
    33-37). Six updates with varying gradients and a mid-run milestone must
    produce the same parameters from our optax factory — including torch
    RMSprop's eps-OUTSIDE-sqrt convention (eps_in_sqrt=False)."""
    torch_mod = pytest.importorskip("torch")
    import jax.numpy as jnp
    import optax

    from contrast_gan_3d_tpu.trainer.optim import make_optimizer

    w0 = np.array([0.5, -0.3, 1.2, 0.01], np.float32)
    grads = [
        np.array([0.1, -0.2, 0.05, 1.5], np.float32) * (i + 1) for i in range(6)
    ]

    tw = torch_mod.tensor(w0.copy(), requires_grad=True)
    if kind == "adam":
        opt = torch_mod.optim.Adam([tw], eps=1e-8, **kwargs)
    else:
        opt = torch_mod.optim.RMSprop([tw], alpha=0.99, eps=1e-8, **kwargs)
    sched = torch_mod.optim.lr_scheduler.MultiStepLR(opt, milestones=[3], gamma=0.1)
    for g in grads:
        tw.grad = torch_mod.tensor(g)
        opt.step()
        sched.step()
    want = tw.detach().numpy()

    tx = make_optimizer(
        kind, lr=kwargs["lr"], betas=kwargs.get("betas", (0.9, 0.999)),
        milestones=[3], lr_gamma=0.1,
    )
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params), want, atol=1e-6, rtol=1e-6)


def test_marker_recall_rate_fn_parity(ref, rng):
    mrr_ref = ref["eval.marker_recall_rate"]
    d = rng.uniform(0, 12, 200)
    d[:5] = 5.0  # threshold boundary is inclusive on both sides
    assert our_mrr.marker_recall_rate(d) == pytest.approx(
        mrr_ref.marker_recall_rate(d), abs=1e-15
    )

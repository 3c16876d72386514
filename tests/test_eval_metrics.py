"""HU-distribution-shift + marker-recall metric tests with synthetic data
(reference capability: eval/HU_distribution_shift.py, eval/marker_recall_rate.py)."""

import numpy as np
import pytest

from contrast_gan_3d_tpu.alias import ScanType
from contrast_gan_3d_tpu.eval import hu_distribution_shift as hds
from contrast_gan_3d_tpu.eval import marker_recall_rate as mrr
from contrast_gan_3d_tpu.utils import io_utils


def _write_synth_patient(tmp_path, rng, name, vessel_hu=400):
    shape = (20, 20, 16)
    spacing, offset = np.array([1.0, 1.0, 1.0]), np.array([0.0, 0.0, 0.0])
    vol = rng.normal(50, 10, shape).astype(np.int16)
    vol[0, 0, 0] = -1000  # air voxel: keeps load_scan's unsigned-offset
    # heuristic (reference io_utils.py:63-105) from firing on synthetic data
    pts = np.stack([np.linspace(3, 16, 10)] * 3, -1)  # world == voxel coords
    pts[:, 2] = np.linspace(2, 13, 10)
    for x, y, z in np.round(pts).astype(int):  # match rasterizer rounding
        vol[x, y, z] = vessel_hu
    pdir = tmp_path / name
    pdir.mkdir(parents=True)
    io_utils.write_mhd(vol, pdir / f"{name}.mhd", spacing=spacing, origin=offset)
    np.savetxt(pdir / "vessel0.txt", np.concatenate([pts, np.full((10, 1), 0.5)], -1))
    (pdir / "ostia.xml").write_text(
        "<ListSize>2</ListSize>\n<pos>3 3 2</pos>\n<pos>4 4 3</pos>\n"
    )
    return pdir, pts


def test_collect_patient_voxels(tmp_path, rng):
    pdir, pts = _write_synth_patient(tmp_path, rng, "p0")
    voxels = hds.collect_patient_voxels(pdir / "p0.mhd", pdir)
    assert set(voxels) == {"centerlines", "ostia"}
    # centerline voxels carry the burned-in vessel HU
    assert voxels["centerlines"].mean() > 300
    assert len(voxels["ostia"]) == 2


def test_collect_voxels_intensity_groups_by_scantype(tmp_path, rng):
    p0, _ = _write_synth_patient(tmp_path, rng, "p0", vessel_hu=400)
    p1, _ = _write_synth_patient(tmp_path, rng, "p1", vessel_hu=250)
    paths = [((p0 / "p0.mhd", p0), 0), ((p1 / "p1.mhd", p1), -1)]
    voxels = hds.collect_voxels_intensity(paths, workers=2)
    assert set(voxels) == {ScanType.OPT, ScanType.LOW}
    assert voxels[ScanType.OPT]["centerlines"].mean() > voxels[ScanType.LOW]["centerlines"].mean()
    summary = hds.summarize_hu_shift(voxels)
    assert summary["OPT/centerlines"]["n"] == 10


def test_marker_recall_rate_threshold():
    d = np.array([0.0, 4.9, 5.0, 5.1, 100.0])
    assert mrr.marker_recall_rate(d) == pytest.approx(3 / 5)


def test_find_closest_and_aggregate(tmp_path, rng):
    import pandas as pd

    # centerlines for 2 patients; annotations offset by known distances
    for name, label in [("pa", 0), ("pb", -1)]:
        pdir = tmp_path / "ctls" / name
        pdir.mkdir(parents=True)
        pts = np.stack([np.linspace(0, 9, 10)] * 3, -1)
        np.savetxt(pdir / "vessel0.txt", np.concatenate([pts, np.ones((10, 1))], -1))
        adir = tmp_path / "annots" / name
        adir.mkdir(parents=True)
        # LAD: markers exactly on the line (recall 1); RCA: 10mm away (recall 0)
        np.savetxt(adir / "LAD.txt", pts[:4])
        np.savetxt(adir / "RCA.txt", pts[:4] + np.array([10.0, 0, 0]))

    res = mrr.find_closest_centerlines_to_annotations(
        tmp_path / "annots" / "pa", tmp_path / "ctls" / "pa"
    )
    assert res["LAD"]["dist"].max() < 1e-6
    # markers sit 10 mm off along x; nearest point on the diagonal line is
    # sqrt(600)/3 ~ 8.16 mm away — beyond the 5 mm recall threshold
    assert res["RCA"]["dist"].min() > mrr.RECALL_THRESHOLD_MM

    df = pd.DataFrame({"ID": ["pa", "pb"], "label": [0, -1]})
    distances, metrics = mrr.eval_model_marker_recall_rate(
        tmp_path / "ctls", tmp_path / "annots", df, workers=2
    )
    assert metrics[ScanType.OPT]["LAD"] == 1.0
    assert metrics[ScanType.OPT]["RCA"] == 0.0
    summary = mrr.summarize_marker_recall_rate(distances)
    assert summary["optimal"]["LAD"] == 1.0
    assert summary["suboptimal"]["LAD"] == 1.0
    assert summary["suboptimal"]["RCA"] == 0.0


def test_asoca_reader(tmp_path):
    f = tmp_path / "annot.txt"
    f.write_text("m1 1.0 2.0 3.0\nm2 4.0 5.0 6.0\n")
    out = mrr.read_ASOCA_annotations(f)
    assert out["centerlines"].shape == (2, 3)


def test_corrected_scan_preserves_direction(tmp_path, rng):
    """corrector.save writes the source scan's direction matrix — the
    reference's to_sitk drops it (identity), a documented bug we fix."""
    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector

    vol = rng.normal(50, 10, (8, 8, 6)).astype(np.int16)
    vol[0, 0, 0] = -1000
    direction = np.diag([1.0, -1.0, -1.0])  # residual flip after reorient
    src = tmp_path / "tilted.mhd"
    io_utils.write_mhd(vol, src, spacing=(1, 1, 1), origin=(0, 0, 0), direction=np.eye(3))
    _, meta = io_utils.load_scan(src)
    meta = dict(meta, direction=direction)
    out = tmp_path / "corrected.mhd"
    CCTAContrastCorrector.save(vol.astype(np.float32), out, meta)
    written = io_utils.read_image_meta(out)
    np.testing.assert_allclose(written["direction"], direction, atol=1e-6)


def test_marker_recall_missing_and_failing_patients_are_loud(tmp_path):
    """Patients with no match are warned about (not silently dropped) and a
    malformed patient file does not abort the sweep."""
    import logging

    import pandas as pd

    for name in ("pa", "pb"):
        pdir = tmp_path / "ctls" / name
        pdir.mkdir(parents=True)
        pts = np.stack([np.linspace(0, 9, 10)] * 3, -1)
        np.savetxt(pdir / "vessel0.txt", np.concatenate([pts, np.ones((10, 1))], -1))
        adir = tmp_path / "annots" / name
        adir.mkdir(parents=True)
        np.savetxt(adir / "LAD.txt", pts[:4])
    # pb's centerlines are malformed (inconsistent columns)
    (tmp_path / "ctls" / "pb" / "vessel0.txt").write_text("1 2 3 4\n5 6 7\n")

    df = pd.DataFrame({"ID": ["pa", "pb", "ghost"], "label": [0, -1, 1]})
    # the package loggers set propagate=False, so collect records directly
    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    mrr.logger.addHandler(handler)
    try:
        distances, metrics = mrr.eval_model_marker_recall_rate(
            tmp_path / "ctls", tmp_path / "annots", df, workers=2
        )
    finally:
        mrr.logger.removeHandler(handler)
    assert metrics[ScanType.OPT]["LAD"] == 1.0  # pa still scored
    assert ScanType.HIGH not in metrics  # ghost excluded...
    text = "\n".join(records)
    assert "ghost" in text and "EXCLUDED" in text  # ...but loudly
    assert "FAILED" in text  # pb's malformed file logged, sweep survived


def test_marker_recall_rate_empty_is_nan_without_warning():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert np.isnan(mrr.marker_recall_rate(np.array([])))

"""I/O round-trip tests for the pure-numpy MHD/NIfTI readers + parsers."""

import gzip

import numpy as np

from contrast_gan_3d_tpu.constants import MAX_HU, MIN_HU
from contrast_gan_3d_tpu.utils import io_utils


def test_mhd_roundtrip(tmp_path, rng):
    vol = rng.integers(-1000, 1500, size=(12, 10, 8)).astype(np.int16)
    spacing, origin = np.array([0.5, 0.6, 0.7]), np.array([-10.0, 5.0, 2.0])
    io_utils.write_mhd(vol, tmp_path / "scan.mhd", spacing=spacing, origin=origin)
    back, meta = io_utils.read_mhd(tmp_path / "scan.mhd")
    np.testing.assert_array_equal(back, vol)
    np.testing.assert_allclose(meta["spacing"], spacing)
    np.testing.assert_allclose(meta["offset"], origin)
    np.testing.assert_allclose(meta["direction"], np.eye(3))


def test_mha_local_roundtrip(tmp_path, rng):
    vol = rng.normal(size=(6, 7, 8)).astype(np.float32)
    io_utils.write_mhd(vol, tmp_path / "scan.mha")
    back, _ = io_utils.read_mhd(tmp_path / "scan.mha")
    np.testing.assert_allclose(back, vol)


def test_mhd_uncompressed(tmp_path, rng):
    vol = rng.integers(0, 100, size=(4, 5, 6)).astype(np.int16)
    io_utils.write_mhd(vol, tmp_path / "u.mhd", compress=False)
    back, _ = io_utils.read_mhd(tmp_path / "u.mhd")
    np.testing.assert_array_equal(back, vol)


def _write_minimal_nifti(path, vol_xyz, affine_ras, gz=False, bo="<"):
    """Hand-rolled NIfTI-1 writer for tests (sform only; ``bo`` byte order)."""
    hdr = bytearray(352)
    hdr[0:4] = np.array(348, bo + "i4").tobytes()
    dim = np.zeros(8, bo + "i2")
    dim[0] = 3
    dim[1:4] = vol_xyz.shape
    hdr[40:56] = dim.tobytes()
    hdr[70:72] = np.array(4, bo + "i2").tobytes()  # datatype int16
    hdr[72:74] = np.array(16, bo + "i2").tobytes()  # bitpix
    pixdim = np.zeros(8, bo + "f4")
    pixdim[1:4] = np.linalg.norm(affine_ras[:3, :3], axis=0)
    hdr[76:108] = pixdim.tobytes()
    hdr[108:112] = np.array(352, bo + "f4").tobytes()  # vox_offset
    hdr[254:256] = np.array(1, bo + "i2").tobytes()  # sform_code
    hdr[280:328] = affine_ras[:3, :].astype(bo + "f4").tobytes()
    hdr[344:348] = b"n+1\0"
    data = np.ascontiguousarray(np.transpose(vol_xyz, (2, 1, 0))).astype(bo + "i2").tobytes()
    blob = bytes(hdr) + data
    if gz:
        with gzip.open(path, "wb") as fd:
            fd.write(blob)
    else:
        path.write_bytes(blob)


def test_nifti_read_ras_identity(tmp_path, rng):
    vol = rng.integers(-500, 500, size=(8, 9, 10)).astype(np.int16)
    affine = np.eye(4)
    _write_minimal_nifti(tmp_path / "t.nii", vol, affine)
    back, meta = io_utils.read_nifti(tmp_path / "t.nii")
    np.testing.assert_array_equal(back, vol)
    # RAS identity affine -> LPS direction flips x and y
    np.testing.assert_allclose(meta["direction"], np.diag([-1.0, -1.0, 1.0]))


def test_nifti_gz(tmp_path, rng):
    vol = rng.integers(0, 100, size=(4, 4, 4)).astype(np.int16)
    _write_minimal_nifti(tmp_path / "t.nii.gz", vol, np.eye(4), gz=True)
    back, _ = io_utils.read_nifti(tmp_path / "t.nii.gz")
    np.testing.assert_array_equal(back, vol)


def test_load_scan_reorients_to_lps(tmp_path, rng):
    # write a volume whose direction is RAS (x and y flipped vs LPS)
    vol = rng.integers(-1000, 1400, size=(6, 5, 4)).astype(np.int16)
    direction = np.diag([-1.0, -1.0, 1.0])  # RAS in LPS world
    io_utils.write_mhd(
        vol, tmp_path / "ras.mhd",
        spacing=np.ones(3), origin=np.array([5.0, 4.0, 0.0]), direction=direction,
    )
    out, meta = io_utils.load_scan(tmp_path / "ras.mhd")
    assert meta["orientation"] == "LPS"
    np.testing.assert_allclose(meta["direction"], np.eye(3))
    # flips on x and y
    np.testing.assert_array_equal(out, vol[::-1, ::-1, :])
    # origin moved to what was the last voxel along the flipped axes
    np.testing.assert_allclose(meta["offset"], [5.0 - 5.0, 4.0 - 4.0, 0.0])


def test_load_scan_hu_shift_and_clip(tmp_path):
    # data stored with an unsigned offset (min >= |MIN_HU| above MIN_HU)
    vol = (np.ones((4, 4, 4)) * 2000).astype(np.int16)
    vol[0, 0, 0] = 24  # min=24, diff = 24 - (-1024) = 1048 >= 1024 -> shift
    io_utils.write_mhd(vol, tmp_path / "shifted.mhd")
    out, meta = io_utils.load_scan(tmp_path / "shifted.mhd")
    assert out.min() >= MIN_HU and out.max() <= MAX_HU
    assert out[0, 0, 0] == 24 - 1048


def test_load_centerlines(tmp_path):
    (tmp_path / "vessel0.txt").write_text("1 2 3 0.5\n4 5 6 0.7\n")
    (tmp_path / "vessel1.txt").write_text("7 8 9 1.0\n")
    (tmp_path / "other.txt").write_text("0 0 0 0\n")
    ctls = io_utils.load_centerlines(tmp_path)
    assert ctls.shape == (3, 4)
    np.testing.assert_allclose(ctls[2], [7, 8, 9, 1.0])


def test_load_centerlines_empty(tmp_path):
    assert io_utils.load_centerlines(tmp_path).shape == (0, 4)


def test_load_mevis_coords(tmp_path):
    xml = """<XMarkerList>
    <ListSize>2</ListSize>
    <Item><pos>1.5 2.5 3.5 0 0 0</pos><vec>0 0 1</vec></Item>
    <Item><pos>4 5 6</pos><vec>1 0 0</vec></Item>
    </XMarkerList>"""
    p = tmp_path / "ostia.xml"
    p.write_text(xml)
    pts, vecs = io_utils.load_mevis_coords(p)
    assert pts.shape == (2, 3) and vecs.shape == (2, 3)
    np.testing.assert_allclose(pts[0], [1.5, 2.5, 3.5])
    np.testing.assert_allclose(vecs[1], [1, 0, 0])


def test_load_asoca_annotations(tmp_path):
    p = tmp_path / "annot.txt"
    p.write_text("m1 1.0 2.0 3.0\nm2 4.0 5.0 6.0\n")
    out = io_utils.load_ASOCA_annotated_centerlines(p)
    assert out.shape == (2, 3)


def test_nifti_big_endian(tmp_path, rng):
    """Spec-legal big-endian NIfTI-1 (magic is endian-invariant; sizeof_hdr
    is the byte-order sniff) must read identically."""
    vol = rng.integers(-500, 500, size=(6, 5, 4)).astype(np.int16)
    _write_minimal_nifti(tmp_path / "be.nii", vol, np.eye(4), bo=">")
    back, meta = io_utils.read_nifti(tmp_path / "be.nii")
    np.testing.assert_array_equal(back, vol)
    np.testing.assert_allclose(meta["direction"], np.diag([-1.0, -1.0, 1.0]))


def test_load_scan_unsigned_offset_above_int16(tmp_path):
    """MET_USHORT data stored at +32768 (values above 32767) must shift to
    real HU instead of wrapping negative. The reference casts int16 FIRST
    (io_utils.py:89) and silently corrupts such volumes — divergence kept
    deliberately (documented in load_scan)."""
    hu = np.full((4, 4, 4), 400, np.int64)
    hu[0, 0, 0] = 0
    vol = (hu + 32768).astype(np.uint16)  # min-shift diff = 32768 >= 1024
    io_utils.write_mhd(vol, tmp_path / "u16.mhd")
    out, _ = io_utils.load_scan(tmp_path / "u16.mhd")
    # reference formula: shift by diff = min - MIN_HU = 32768 + 1024
    np.testing.assert_array_equal(out, hu - 1024)


def test_stem_and_basename():
    assert io_utils.stem("/a/b/scan.nii.gz") == "scan"
    assert io_utils.basename("/a/b/c.mhd") == "c.mhd"
    # DICOM-UID-style names keep their dots (only the imaging suffix strips)
    assert io_utils.stem("1.2.840.113.mhd") == "1.2.840.113"
    assert io_utils.stem("weird.name.npy") == "weird.name"


def test_write_mhd_preserves_dotted_uid_names(tmp_path, rng):
    """DICOM-UID-style names must not be mangled by suffix handling: writing
    '1.2.840.113' and '1.2.840.114' must produce two distinct .mhd files
    (Path.with_suffix would collapse both onto '1.2.840.mhd')."""
    vol = rng.integers(-100, 100, (4, 4, 4)).astype(np.int16)
    for name in ("1.2.840.113", "1.2.840.114"):
        io_utils.write_mhd(vol, tmp_path / name)
    written = sorted(p.name for p in tmp_path.glob("*.mhd"))
    assert written == ["1.2.840.113.mhd", "1.2.840.114.mhd"]
    back, _ = io_utils.read_image(tmp_path / "1.2.840.113.mhd")
    np.testing.assert_array_equal(back, vol)


def test_with_image_suffix():
    from pathlib import Path

    f = io_utils.with_image_suffix
    assert f("a/b/p1") == Path("a/b/p1.mhd")
    assert f("a/b/p1.mhd") == Path("a/b/p1.mhd")  # already suffixed
    assert f("1.2.840.113") == Path("1.2.840.113.mhd")
    assert f("x", ".nii.gz") == Path("x.nii.gz")


def test_write_mhd_geometry_full_precision(tmp_path, rng):
    """Offsets/spacings round-trip at float64 repr precision — '%g' style
    6-digit truncation shifted sub-millimeter world coordinates."""
    vol = rng.integers(0, 50, size=(3, 3, 3)).astype(np.int16)
    spacing = np.array([0.4296875, 0.4296875, 0.625])
    origin = np.array([-1234.5625, 187.90625, -403.299987792969])
    io_utils.write_mhd(vol, tmp_path / "p.mhd", spacing=spacing, origin=origin)
    _, meta = io_utils.read_mhd(tmp_path / "p.mhd")
    np.testing.assert_array_equal(meta["spacing"], spacing)
    np.testing.assert_array_equal(meta["offset"], origin)


def test_write_nifti_roundtrip(tmp_path, rng):
    """write_nifti is the exact inverse of read_nifti: array, LPS geometry
    and dtype round-trip, .nii and .nii.gz, identity and oblique frames."""
    vol = rng.integers(-500, 900, size=(7, 6, 5)).astype(np.int16)
    spacing = np.array([0.43, 0.43, 0.625])
    origin = np.array([-101.25, 33.5, -7.0])
    # a proper rotation (oblique direction): rotate about z by ~20 deg
    c, s = np.cos(0.35), np.sin(0.35)
    direction = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    for fname in ("v.nii", "v.nii.gz"):
        io_utils.write_nifti(
            vol, tmp_path / fname, spacing=spacing, origin=origin,
            direction=direction,
        )
        got, meta = io_utils.read_nifti(tmp_path / fname)
        assert got.dtype == np.int16
        np.testing.assert_array_equal(got, vol)
        np.testing.assert_allclose(meta["spacing"], spacing, atol=1e-5)
        np.testing.assert_allclose(meta["offset"], origin, atol=1e-4)
        np.testing.assert_allclose(meta["direction"], direction, atol=1e-5)


def test_write_nifti_float_and_default_geometry(tmp_path, rng):
    vol = rng.normal(size=(4, 5, 6)).astype(np.float32)
    io_utils.write_nifti(vol, tmp_path / "f.nii")
    got, meta = io_utils.read_nifti(tmp_path / "f.nii")
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, vol)
    np.testing.assert_allclose(meta["spacing"], 1.0)
    np.testing.assert_allclose(meta["offset"], 0.0)


def test_write_nifti_matches_mhd_through_load_scan(tmp_path, rng):
    """The same volume written as .nii.gz and .mhd loads identically through
    load_scan (reorientation + HU clip path)."""
    vol = rng.integers(-1024, 1500, size=(8, 8, 4)).astype(np.int16)
    spacing, origin = np.array([0.5, 0.5, 1.0]), np.array([1.0, -2.0, 3.0])
    io_utils.write_nifti(vol, tmp_path / "s.nii.gz", spacing=spacing, origin=origin)
    io_utils.write_mhd(vol, tmp_path / "s.mhd", spacing=spacing, origin=origin)
    a, ma = io_utils.load_scan(tmp_path / "s.nii.gz")
    b, mb = io_utils.load_scan(tmp_path / "s.mhd")
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(ma["spacing"], mb["spacing"], atol=1e-5)
    np.testing.assert_allclose(ma["offset"], mb["offset"], atol=1e-4)
    assert ma["orientation"] == mb["orientation"] == "LPS"


def test_save_scan_format_dispatch(tmp_path, rng):
    """save_scan writes the format its suffix names (.mhd default, NIfTI,
    HDF5) — corrected volumes read back identically from each."""
    vol = rng.integers(-200, 800, size=(6, 6, 3)).astype(np.int16)
    spacing, origin = np.array([0.7, 0.7, 1.2]), np.array([0.5, -1.5, 2.0])
    outs = {}
    for fname in ("c.mhd", "c.nii.gz", "c.h5"):
        io_utils.save_scan(vol, origin, spacing, tmp_path / fname)
        outs[fname], meta = io_utils.load_scan(tmp_path / fname)
        np.testing.assert_allclose(meta["spacing"], spacing, atol=1e-5)
        np.testing.assert_allclose(meta["offset"], origin, atol=1e-4)
    np.testing.assert_array_equal(outs["c.mhd"], outs["c.nii.gz"])
    np.testing.assert_array_equal(outs["c.mhd"], outs["c.h5"])


def test_stem_corpus_member():
    assert io_utils.stem("data/corpus.h5::1.2.840.113") == "1.2.840.113"
    assert io_utils.stem("corpus.h5::p0") == "p0"


def test_get_scan_orientation_reports_on_disk_code(tmp_path):
    """get_scan_orientation (reference io_utils.py:14-20) reports the raw
    on-disk orientation, not the post-load LPS."""
    import numpy as np

    from contrast_gan_3d_tpu.utils import io_utils

    vol = np.zeros((4, 5, 6), np.int16)
    ras = np.diag([-1.0, -1.0, 1.0])  # RAS direction in the LPS world frame
    io_utils.write_mhd(vol, tmp_path / "ras.mhd", direction=ras)
    io_utils.write_mhd(vol, tmp_path / "lps.mhd")
    assert io_utils.get_scan_orientation(tmp_path / "ras.mhd") == "RAS"
    assert io_utils.get_scan_orientation(tmp_path / "lps.mhd") == "LPS"


def test_read_image_meta_is_header_only_and_matches_full_read(tmp_path):
    """read_image_meta returns the full reader's geometry (+ shape) for every
    format without touching voxel data."""
    import numpy as np

    from contrast_gan_3d_tpu.utils import io_utils

    rng = np.random.default_rng(3)
    vol = rng.integers(-500, 500, (6, 5, 4)).astype(np.int16)
    direction = np.diag([-1.0, 1.0, -1.0])
    spacing, origin = (0.7, 0.8, 0.9), (1.5, -2.25, 3.0)
    paths = []
    io_utils.write_mhd(vol, tmp_path / "a.mhd", spacing, origin, direction)
    io_utils.write_mhd(vol, tmp_path / "a.mha", spacing, origin, direction)
    io_utils.write_nifti(vol, tmp_path / "a.nii.gz", spacing, origin, direction)
    io_utils.write_hdf5_image(vol, tmp_path / "a.h5", spacing, origin, direction)
    for name in ("a.mhd", "a.mha", "a.nii.gz", "a.h5"):
        full_meta = io_utils.read_image(tmp_path / name)[1]
        meta = io_utils.read_image_meta(tmp_path / name)
        assert meta["shape"] == (6, 5, 4), name
        for k in ("spacing", "offset", "direction"):
            np.testing.assert_allclose(
                meta[k], full_meta[k], atol=1e-5, err_msg=f"{name}:{k}"
            )


def test_malformed_images_raise_clean_errors(tmp_path):
    """Truncated/garbled inputs raise diagnosable ValueErrors, not crashes."""
    import gzip

    import numpy as np
    import pytest

    from contrast_gan_3d_tpu.utils import io_utils

    # .mhd with no ElementDataFile key
    bad_mhd = tmp_path / "bad.mhd"
    bad_mhd.write_text("ObjectType = Image\nNDims = 3\n")
    with pytest.raises(ValueError, match="ElementDataFile"):
        io_utils.read_mhd(bad_mhd)
    with pytest.raises(ValueError, match="ElementDataFile"):
        io_utils.read_image_meta(bad_mhd)

    # .nii with a wrong magic
    bad_nii = tmp_path / "bad.nii"
    bad_nii.write_bytes(b"\x00" * 348)
    with pytest.raises(ValueError, match="not a NIfTI-1"):
        io_utils.read_nifti(bad_nii)

    # gzipped garbage under a .nii.gz suffix
    bad_gz = tmp_path / "bad.nii.gz"
    bad_gz.write_bytes(gzip.compress(b"hello" * 100))
    with pytest.raises(ValueError, match="NIfTI-1"):
        io_utils.read_image_meta(bad_gz)

    # unknown suffix
    with pytest.raises(ValueError, match="Unsupported image format"):
        io_utils.read_image_meta(tmp_path / "x.dcm")

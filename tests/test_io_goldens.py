"""Golden-file fuzzing of the pure-numpy image readers.

The readers (``utils/io_utils.py``) are the one subsystem where a silent
divergence from ITK semantics would corrupt every downstream metric
(reference ``io_utils.py:63-105`` wraps SimpleITK). SimpleITK is not
available in this image, so the goldens are built by INDEPENDENT in-test
writers that serialize bytes directly from the published format specs
(MetaImage: ITK MetaIO spec; NIfTI-1: the 348-byte header layout of
nifti1.h) — byte layouts, dtype codes, quaternion math and affine
conventions are re-derived here, not imported from the module under test.

Matrix covered: dtypes x compression x byte order x orientations (incl.
permuted, flipped and oblique direction matrices), NIfTI sform/qform/pixdim
paths and scl_slope/inter scaling, plus the world-mapping invariance of
``reorient`` and the HU semantics of ``load_scan``.
"""

import gzip
import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from contrast_gan_3d_tpu.utils import io_utils

SHAPE = (5, 4, 3)  # distinct dims catch transposition bugs


def ramp_volume(shape, dtype):
    """vol[x, y, z] = x + 10*y + 100*z (exact in every tested dtype)."""
    x, y, z = np.meshgrid(*(np.arange(s) for s in shape), indexing="ij")
    return (x + 10 * y + 100 * z).astype(dtype)


# ---------------------------------------------------------------------------
# independent spec writers
# ---------------------------------------------------------------------------

MET_NAME = {
    np.dtype(np.uint8): "MET_UCHAR",
    np.dtype(np.int16): "MET_SHORT",
    np.dtype(np.uint16): "MET_USHORT",
    np.dtype(np.int32): "MET_INT",
    np.dtype(np.float32): "MET_FLOAT",
    np.dtype(np.float64): "MET_DOUBLE",
}


def write_mhd_spec(
    path: Path,
    vol_xyz: np.ndarray,
    spacing=(1, 1, 1),
    offset=(0, 0, 0),
    transform=np.eye(3),
    compressed=False,
    msb=False,
    local=False,
):
    """MetaIO spec: ASCII `Key = Value` header; DimSize fastest-first (x y z);
    raw data x-fastest; TransformMatrix row-major with ROWS = image axes."""
    data = vol_xyz
    if msb:
        data = data.astype(data.dtype.newbyteorder(">"))
    # x fastest on disk == C-order of the (z, y, x) transposed array
    raw = np.ascontiguousarray(np.transpose(data, (2, 1, 0))).tobytes()
    if compressed:
        raw = zlib.compress(raw)
    lines = [
        "ObjectType = Image",
        "NDims = 3",
        "BinaryData = True",
        f"BinaryDataByteOrderMSB = {msb}",
        f"CompressedData = {compressed}",
        "TransformMatrix = " + " ".join(str(v) for v in np.asarray(transform).T.ravel()),
        "Offset = " + " ".join(str(v) for v in offset),
        "ElementSpacing = " + " ".join(str(v) for v in spacing),
        "DimSize = " + " ".join(str(d) for d in vol_xyz.shape),
        f"ElementType = {MET_NAME[vol_xyz.dtype]}",
    ]
    if local:
        path = path.with_suffix(".mha")
        lines.append("ElementDataFile = LOCAL")
        path.write_bytes(("\n".join(lines) + "\n").encode() + raw)
    else:
        rawname = path.with_suffix(".raw").name
        lines.append(f"ElementDataFile = {rawname}")
        path.write_bytes(("\n".join(lines) + "\n").encode())
        (path.parent / rawname).write_bytes(raw)
    return path


NIFTI_CODE = {
    np.dtype(np.uint8): 2,
    np.dtype(np.int16): 4,
    np.dtype(np.int32): 8,
    np.dtype(np.float32): 16,
    np.dtype(np.float64): 64,
    np.dtype(np.uint16): 512,
}


def write_nifti_spec(
    path: Path,
    vol_xyz: np.ndarray,
    pixdim=(1.0, 1.0, 1.0),
    srow=None,          # (3, 4) RAS affine rows -> sform path
    quatern=None,       # (b, c, d, qx, qy, qz, qfac) -> qform path
    scl=(1.0, 0.0),
    gz=False,
):
    """nifti1.h layout, little-endian, single-file .nii (magic n+1)."""
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)                       # sizeof_hdr
    dims = (3, *vol_xyz.shape, 1, 1, 1, 1)
    struct.pack_into("<8h", hdr, 40, *dims)                   # dim
    struct.pack_into("<h", hdr, 70, NIFTI_CODE[vol_xyz.dtype])  # datatype
    struct.pack_into("<h", hdr, 72, vol_xyz.dtype.itemsize * 8)  # bitpix
    qfac = quatern[6] if quatern else 1.0
    struct.pack_into("<8f", hdr, 76, qfac, *pixdim, 1, 1, 1, 1)  # pixdim
    struct.pack_into("<f", hdr, 108, 352.0)                   # vox_offset
    struct.pack_into("<f", hdr, 112, scl[0])                  # scl_slope
    struct.pack_into("<f", hdr, 116, scl[1])                  # scl_inter
    struct.pack_into("<h", hdr, 252, 1 if quatern else 0)     # qform_code
    struct.pack_into("<h", hdr, 254, 1 if srow is not None else 0)  # sform_code
    if quatern:
        struct.pack_into("<3f", hdr, 256, *quatern[:3])       # quatern_{b,c,d}
        struct.pack_into("<3f", hdr, 268, *quatern[3:6])      # qoffset
    if srow is not None:
        struct.pack_into("<12f", hdr, 280, *np.asarray(srow, np.float64).ravel())
    hdr[344:348] = b"n+1\0"
    raw = np.ascontiguousarray(
        np.transpose(vol_xyz.astype(vol_xyz.dtype.newbyteorder("<")), (2, 1, 0))
    ).tobytes()
    blob = bytes(hdr) + b"\0\0\0\0" + raw
    if gz:
        path = Path(str(path) + ".gz")
        path.write_bytes(gzip.compress(blob))
    else:
        path.write_bytes(blob)
    return path


# ---------------------------------------------------------------------------
# MetaImage matrix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.float32, np.float64])
@pytest.mark.parametrize("compressed", [False, True])
def test_mhd_dtypes_and_compression(tmp_path, dtype, compressed):
    vol = ramp_volume(SHAPE, dtype)
    p = write_mhd_spec(
        tmp_path / "a.mhd", vol, spacing=(0.5, 0.75, 2.0), offset=(-3, 4, 9),
        compressed=compressed,
    )
    arr, meta = io_utils.read_mhd(p)
    np.testing.assert_array_equal(arr, vol)
    assert arr.dtype == np.dtype(dtype)
    np.testing.assert_allclose(meta["spacing"], [0.5, 0.75, 2.0])
    np.testing.assert_allclose(meta["offset"], [-3, 4, 9])
    np.testing.assert_allclose(meta["direction"], np.eye(3))


@pytest.mark.parametrize("local", [False, True])
@pytest.mark.parametrize("msb", [False, True])
def test_mhd_byteorder_and_local(tmp_path, msb, local):
    vol = ramp_volume(SHAPE, np.int16)
    p = write_mhd_spec(tmp_path / "b.mhd", vol, msb=msb, local=local)
    arr, _ = io_utils.read_mhd(p)
    np.testing.assert_array_equal(arr, vol)


def test_mhd_direction_matrix_roundtrip(tmp_path):
    """TransformMatrix rows are image axes (MetaIO spec); the reader must
    hand back ITK's column convention."""
    direction = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)  # 90deg
    vol = ramp_volume(SHAPE, np.int16)
    p = write_mhd_spec(tmp_path / "c.mhd", vol, transform=direction)
    _, meta = io_utils.read_mhd(p)
    np.testing.assert_allclose(meta["direction"], direction)


# ---------------------------------------------------------------------------
# NIfTI matrix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.float32])
@pytest.mark.parametrize("gz", [False, True])
def test_nifti_dtypes(tmp_path, dtype, gz):
    vol = ramp_volume(SHAPE, dtype)
    p = write_nifti_spec(tmp_path / "a.nii", vol, gz=gz)
    arr, meta = io_utils.read_nifti(p)
    np.testing.assert_array_equal(arr, vol)
    # pixdim-only affine: RAS -> LPS flips the first two axes' directions
    np.testing.assert_allclose(meta["direction"], np.diag([-1.0, -1.0, 1.0]))


def test_nifti_sform_affine_to_lps(tmp_path):
    """sform (RAS rows) -> LPS spacing/direction/origin."""
    vol = ramp_volume(SHAPE, np.int16)
    srow = np.array([  # RAS affine: spacing (2, 3, 4), origin (5, -6, 7)
        [2.0, 0, 0, 5.0],
        [0, 3.0, 0, -6.0],
        [0, 0, 4.0, 7.0],
    ])
    p = write_nifti_spec(tmp_path / "s.nii", vol, srow=srow)
    arr, meta = io_utils.read_nifti(p)
    np.testing.assert_array_equal(arr, vol)
    np.testing.assert_allclose(meta["spacing"], [2, 3, 4])
    np.testing.assert_allclose(meta["direction"], np.diag([-1.0, -1.0, 1.0]))
    np.testing.assert_allclose(meta["offset"], [-5.0, 6.0, 7.0])  # LPS origin


def test_nifti_qform_quaternion(tmp_path):
    """qform path: quaternion (b,c,d) = (0,0,sin(pi/4)) is a 90deg rotation
    about z in RAS; golden direction computed by hand."""
    vol = ramp_volume(SHAPE, np.int16)
    s = float(np.sin(np.pi / 4))
    p = write_nifti_spec(
        tmp_path / "q.nii", vol, pixdim=(1.5, 2.5, 3.5),
        quatern=(0.0, 0.0, s, 1.0, 2.0, 3.0, 1.0),
    )
    _, meta = io_utils.read_nifti(p)
    rot_ras = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])  # Rz(90)
    mat_lps = np.diag([-1.0, -1, 1]) @ rot_ras @ np.diag([1.5, 2.5, 3.5])
    np.testing.assert_allclose(meta["spacing"], [1.5, 2.5, 3.5], atol=1e-6)
    np.testing.assert_allclose(
        meta["direction"], mat_lps / np.array([1.5, 2.5, 3.5]), atol=1e-6
    )
    np.testing.assert_allclose(meta["offset"], [-1.0, -2.0, 3.0], atol=1e-6)


def test_nifti_scl_slope_inter(tmp_path):
    vol = ramp_volume(SHAPE, np.int16)
    p = write_nifti_spec(tmp_path / "r.nii", vol, scl=(2.0, -100.0))
    arr, _ = io_utils.read_nifti(p)
    np.testing.assert_allclose(arr, vol.astype(np.float64) * 2.0 - 100.0)




def test_nifti_scl_slope_zero_means_no_scaling(tmp_path):
    """Spec: scl_slope == 0 disables scaling entirely — a stale nonzero
    scl_inter (common exporter leftover) must NOT shift the intensities."""
    vol = ramp_volume(SHAPE, np.int16)
    p = write_nifti_spec(tmp_path / "z.nii", vol, scl=(0.0, 100.0))
    arr, _ = io_utils.read_nifti(p)
    np.testing.assert_array_equal(arr, vol)


def test_nifti_scl_slope_nan_ignored(tmp_path):
    vol = ramp_volume(SHAPE, np.int16)
    p = write_nifti_spec(tmp_path / "n.nii", vol, scl=(float("nan"), 5.0))
    arr, _ = io_utils.read_nifti(p)
    np.testing.assert_array_equal(arr, vol)


# ---------------------------------------------------------------------------
# reorientation semantics
# ---------------------------------------------------------------------------

def world_map(vol, direction, spacing, origin):
    """{world coordinate -> value} for every voxel (the ITK mapping
    world = direction @ diag(spacing) @ index + origin)."""
    out = {}
    for idx in np.ndindex(vol.shape):
        w = direction @ (np.asarray(spacing) * np.asarray(idx, float)) + origin
        out[tuple(np.round(w, 6))] = vol[idx]
    return out


# direction matrices HAND-WRITTEN per anatomical code (columns = image axes
# in the LPS world frame; L/P/S = +x/+y/+z, R/A/I = the negations). Written
# out rather than derived via io_utils._code_to_axis_sign so a mapping bug
# in the module under test cannot construct a wrong-but-self-consistent
# golden.
_CODE_DIRECTIONS = {
    "LPS": np.eye(3),
    "RAS": np.diag([-1.0, -1.0, 1.0]),
    # PIR: col0 -> P(+y), col1 -> I(-z), col2 -> R(-x)
    "PIR": np.array([[0, 0, -1], [1, 0, 0], [0, -1, 0]], float),
    # SLA: col0 -> S(+z), col1 -> L(+x), col2 -> A(-y)
    "SLA": np.array([[0, 1, 0], [0, 0, -1], [1, 0, 0]], float),
    # ILP: col0 -> I(-z), col1 -> L(+x), col2 -> P(+y)
    "ILP": np.array([[0, 1, 0], [0, 0, 1], [-1, 0, 0]], float),
}


@pytest.mark.parametrize(
    "code",
    ["LPS", "RAS", "PIR", "SLA", "ILP"],
)
def test_reorient_world_mapping_invariance(tmp_path, code):
    """Reorienting to LPS must not move any voxel in world space — the exact
    property DICOMOrient guarantees."""
    direction = _CODE_DIRECTIONS[code]
    assert io_utils.orientation_code(direction) == code  # golden agrees
    vol = ramp_volume(SHAPE, np.int16)
    spacing = np.array([0.5, 1.25, 2.0])
    origin = np.array([10.0, -20.0, 5.0])

    out, new_dir, new_sp, new_org = io_utils.reorient(vol, direction, spacing, origin)
    assert io_utils.orientation_code(new_dir) == "LPS"
    assert world_map(vol, direction, spacing, origin) == world_map(
        out, new_dir, new_sp, new_org
    )


def test_reorient_oblique_world_mapping(tmp_path):
    """Oblique direction (30deg about z, dominant axes unambiguous): the
    permute/flip reorientation must still preserve the world mapping."""
    th = np.deg2rad(30)
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    direction = rot @ np.diag([-1, 1, -1])  # oblique, flipped x/z
    vol = ramp_volume(SHAPE, np.int16)
    spacing = np.array([1.0, 2.0, 3.0])
    origin = np.array([1.0, 2.0, 3.0])
    out, new_dir, new_sp, new_org = io_utils.reorient(vol, direction, spacing, origin)
    assert world_map(vol, direction, spacing, origin) == world_map(
        out, new_dir, new_sp, new_org
    )
    # voxel axes now point dominantly along LPS
    assert io_utils.orientation_code(new_dir) == "LPS"


# ---------------------------------------------------------------------------
# load_scan end-to-end (reference load_sitk_image semantics, io_utils.py:63-105)
# ---------------------------------------------------------------------------

def test_load_scan_reorients_and_clips(tmp_path):
    """A RAS-written scan loads as LPS int16 clipped to [MIN_HU, MAX_HU]."""
    from contrast_gan_3d_tpu.constants import MAX_HU, MIN_HU

    vol = np.full(SHAPE, 3000, np.int16)  # above MAX_HU
    vol[0, 0, 0] = -2000                   # below MIN_HU
    vol[1, 2, 1] = 300
    p = write_mhd_spec(
        tmp_path / "ras.mhd", vol, transform=np.diag([-1.0, -1.0, 1.0])
    )
    out, meta = io_utils.load_scan(p)
    assert out.dtype == np.int16
    assert out.min() >= MIN_HU and out.max() <= MAX_HU
    # RAS->LPS flips x and y: the marked voxel moves accordingly
    assert out[SHAPE[0] - 2, SHAPE[1] - 3, 1] == 300
    np.testing.assert_allclose(meta["direction"], np.eye(3))

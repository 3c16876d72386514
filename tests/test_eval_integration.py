"""End-to-end eval integration: synthetic scans -> corrector -> saved .mhd ->
HU-shift metrics over original vs corrected (reference capability: the
eval notebooks' full pipeline)."""

import numpy as np
import pytest

from contrast_gan_3d_tpu.alias import ScanType
from contrast_gan_3d_tpu.eval import hu_distribution_shift as hds
from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
from contrast_gan_3d_tpu.eval.utils import correct_patients
from contrast_gan_3d_tpu.models.generator import ResnetGenerator

from tests.test_eval_metrics import _write_synth_patient


@pytest.mark.slow
def test_correct_then_measure_hu_shift(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    # two synthetic "patients" on disk with centerlines + ostia
    p0, _ = _write_synth_patient(tmp_path, rng, "p0", vessel_hu=250)  # LOW-ish
    p1, _ = _write_synth_patient(tmp_path, rng, "p1", vessel_hu=420)  # OPT-ish

    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=(16, 16, 16), batch_size=2,
    )

    out_dir = tmp_path / "corrected"
    saved = correct_patients(corrector, out_dir, [p0 / "p0.mhd", p1 / "p1.mhd"])
    assert all(p.exists() for p in saved)

    # metrics over original and corrected series
    orig = hds.collect_voxels_intensity(
        [((p0 / "p0.mhd", p0), -1), ((p1 / "p1.mhd", p1), 0)], workers=2
    )
    corr = hds.collect_voxels_intensity(
        [((saved[0], p0), -1), ((saved[1], p1), 0)], workers=2
    )
    for series in (orig, corr):
        assert set(series) == {ScanType.LOW, ScanType.OPT}
    # the untrained generator's attenuation is bounded: corrected stays
    # within +-600 HU of the original at the centerline voxels
    d = corr[ScanType.LOW]["centerlines"].astype(np.float64) - orig[
        ScanType.LOW
    ]["centerlines"].astype(np.float64)
    assert np.abs(d).max() <= 600 + 1
    summary = hds.summarize_hu_shift(corr)
    assert all(np.isfinite(v["mean"]) for v in summary.values())


def test_correct_patients_overlap_io_matches_sequential(tmp_path, rng):
    """The pipelined (loader/writer-threaded) multi-patient path writes
    bit-identical files in the same order as the sequential path."""
    import jax
    import jax.numpy as jnp

    from contrast_gan_3d_tpu.utils import io_utils

    patients = []
    for i, hu in enumerate((250, 420, 550)):
        pdir, _ = _write_synth_patient(tmp_path, rng, f"s{i}", vessel_hu=hu)
        patients.append(pdir / f"s{i}.mhd")

    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=(16, 16, 16), batch_size=2,
    )

    seq = correct_patients(corrector, tmp_path / "seq", patients, overlap_io=False)
    pipe = correct_patients(corrector, tmp_path / "pipe", patients, overlap_io=True)
    assert [p.name for p in seq] == [p.name for p in pipe]
    for ps, pp in zip(seq, pipe):
        a, meta_a = io_utils.load_scan(ps)
        b, meta_b = io_utils.load_scan(pp)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(meta_a["spacing"], meta_b["spacing"])


def test_correct_patients_overlap_io_loader_error(tmp_path, rng):
    """A missing input surfaces as an exception from the pipelined path
    (no hang, threads joined)."""
    import jax
    import jax.numpy as jnp

    pdir, _ = _write_synth_patient(tmp_path, rng, "ok", vessel_hu=300)
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=(16, 16, 16), batch_size=2,
    )
    # the specific loader error must surface (pytest.raises(Exception) would
    # also pass on an unrelated TypeError before any thread starts)
    with pytest.raises((FileNotFoundError, RuntimeError), match="missing"):
        correct_patients(
            corrector, tmp_path / "out",
            [pdir / "ok.mhd", tmp_path / "missing.mhd"], overlap_io=True,
        )


def test_2d_corrector_batch_invariance(rng):
    """The slice batch is a pure throughput knob (BatchNorm runs on frozen
    eval stats; padded slices are dropped): outputs are identical across
    batch sizes, and the effective batch caps at the padded slice count so
    short volumes don't pay saturation-batch padding (the default is 128 —
    the chip only saturates there, 0.82 s @ 8 -> 0.185 s @ 128 per
    512x512x400 volume, PERF.md)."""
    import jax
    import jax.numpy as jnp

    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        ndim=2, s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), train=False)

    def make(bs):
        return CCTAContrastCorrector(
            gen, variables["params"], variables.get("batch_stats"),
            inference_patch_size=(16, 16), batch_size=bs,
        )

    # saturation default is accelerator-only; the CPU backend (this test
    # suite) keeps the memory-lean batch 8
    expected = 128 if jax.default_backend() != "cpu" else 8
    assert make(None).batch_size == expected
    vol = rng.integers(-1000, 1400, (16, 16, 11)).astype(np.int16)
    outs = [np.asarray(make(bs)(vol)) for bs in (2, 4, None)]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_2d_corrector_z_bucket(rng):
    """z_bucket bounds shape-recompiles for the 2D family too (a warm 2D
    daemon on a mixed-z cohort): distinct z extents share one compiled
    program per bucket, and — unlike 3D, where padding changes the blend
    grid — 2D bucketing is exactly output-preserving (padded slices are
    corrected independently and cropped away)."""
    import jax
    import jax.numpy as jnp

    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        ndim=2, s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), train=False)

    def make(z_bucket):
        return CCTAContrastCorrector(
            gen, variables["params"], variables.get("batch_stats"),
            inference_patch_size=(16, 16), batch_size=4, z_bucket=z_bucket,
        )

    plain, bucketed = make(0), make(8)
    for d in (5, 7, 11):
        vol = rng.integers(-1000, 1400, (16, 16, d)).astype(np.int16)
        np.testing.assert_array_equal(
            np.asarray(plain(vol)), np.asarray(bucketed(vol))
        )
    # 5 and 7 pad to the same 8-bucket; 11 to 16 -> two compiled programs
    assert bucketed._correct_2d._cache_size() == 2
    assert plain._correct_2d._cache_size() == 3


def test_corrector_z_bucket(rng):
    """z_bucket pads/crops around the jitted correction; output shape exact
    and values near the identity-path result."""
    import jax
    import jax.numpy as jnp

    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1,
                          init_channels_out=2)
    v = gen.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    vol = rng.integers(-800, 600, (20, 20, 18), dtype=np.int16)
    base = CCTAContrastCorrector(gen, v["params"], v.get("batch_stats"),
                                 inference_patch_size=(16, 16, 16), batch_size=2)
    bucketed = CCTAContrastCorrector(gen, v["params"], v.get("batch_stats"),
                                     inference_patch_size=(16, 16, 16),
                                     batch_size=2, z_bucket=8)
    out_b = np.asarray(bucketed(vol))
    assert out_b.shape == vol.shape
    # bucketing == manual edge-pad + correct + crop (exact)
    padded = np.pad(vol, ((0, 0), (0, 0), (0, 6)), mode="edge")
    ref = np.asarray(base(padded))[:, :, :18]
    np.testing.assert_allclose(out_b, ref, atol=1e-3)


@pytest.mark.parametrize("overlap_io", [False, True])
def test_correct_patients_graceful_stop(tmp_path, rng, overlap_io):
    """stop_requested polls between volumes: a stop after the first volume
    returns exactly the completed outputs (written, loadable), skips the
    rest, and joins both pipeline threads (no hang)."""
    import jax
    import jax.numpy as jnp

    from contrast_gan_3d_tpu.utils import io_utils

    patients = []
    for i, hu in enumerate((250, 420, 550)):
        pdir, _ = _write_synth_patient(tmp_path, rng, f"g{i}", vessel_hu=hu)
        patients.append(pdir / f"g{i}.mhd")

    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=(16, 16, 16), batch_size=2,
    )

    polls = {"n": 0}

    def stop_after_first():
        polls["n"] += 1
        return polls["n"] > 1  # first poll lets volume 0 dispatch

    out_dir = tmp_path / f"out_{overlap_io}"
    done = correct_patients(
        corrector, out_dir, patients, overlap_io=overlap_io,
        stop_requested=stop_after_first,
    )
    assert 1 <= len(done) < len(patients), done
    for p in done:  # everything reported is fully on disk and loadable
        scan, _ = io_utils.load_scan(p)
        assert scan.shape == (20, 20, 16)
    # nothing beyond the reported outputs was written (.mhd headers come
    # with a companion .raw each — compare the image files only)
    assert sorted(q.name for q in out_dir.glob("*.mhd")) == sorted(
        p.name for p in done
    )


def test_device_int16_fetch_matches_host_conversion():
    """The on-device round/clip that halves D2H bytes must be bit-identical
    to corrector.save's host-side conversion (incl. half-even rounding and
    clip extremes)."""
    import jax.numpy as jnp

    from contrast_gan_3d_tpu.eval.utils import device_int16

    x = np.array(
        [0.5, 1.5, 2.5, -0.5, -1.5, 40000.0, -40000.0, 123.4, -123.6],
        np.float32,
    )
    got = np.asarray(device_int16(jnp.asarray(x)))
    want = np.clip(
        np.round(x), np.iinfo(np.int16).min, np.iinfo(np.int16).max
    ).astype(np.int16)
    np.testing.assert_array_equal(got, want)
    # int16 input (already converted) round-trips unchanged through the
    # host-side save conversion
    np.testing.assert_array_equal(
        np.clip(np.round(got), np.iinfo(np.int16).min,
                np.iinfo(np.int16).max).astype(np.int16),
        got,
    )

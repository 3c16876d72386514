"""AOT serving artifacts (eval/export.py): export → serialize → load →
call reproduces the live corrector exactly, with contract validation."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
from contrast_gan_3d_tpu.eval.export import (
    ArtifactBundle,
    export_corrector,
    load_exported_corrector,
    save_exported_corrector,
)
from contrast_gan_3d_tpu.models.generator import ResnetGenerator

PATCH = (16, 16, 16)
SHAPE = (20, 20, 18)


@pytest.fixture(scope="module")
def corrector():
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, *PATCH, 1)), train=False)
    return CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=PATCH, batch_size=2,
    )


def test_export_roundtrip_matches_live_corrector(tmp_path, corrector, rng):
    vol = rng.integers(-1000, 1400, SHAPE).astype(np.int16)
    want = np.asarray(corrector(vol))

    path = save_exported_corrector(tmp_path / "art", corrector, SHAPE)
    assert path.name == "art.jaxcorr"
    meta = json.loads((tmp_path / "art.jaxcorr.json").read_text())
    assert meta["volume_shape"] == list(SHAPE)
    assert meta["in_dtype"] == "int16"
    assert meta["out_shape"] == list(SHAPE)

    loaded = load_exported_corrector(path)
    got = np.asarray(loaded(vol))
    # the artifact compiles the WHOLE pipeline as one program (the live
    # corrector jits the inner loop only) — fusion differences bound ~1e-4
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_load_without_suffix_and_without_sidecar(tmp_path, corrector, rng):
    path = save_exported_corrector(tmp_path / "art", corrector, SHAPE)
    # bare name resolves
    loaded = load_exported_corrector(tmp_path / "art")
    # sidecar-less artifacts reconstruct the contract from the avals
    (tmp_path / "art.jaxcorr.json").unlink()
    loaded2 = load_exported_corrector(path)
    assert loaded2.volume_shape == SHAPE
    vol = rng.integers(-500, 500, SHAPE).astype(np.int16)
    np.testing.assert_array_equal(
        np.asarray(loaded(vol)), np.asarray(loaded2(vol))
    )


def test_shape_contract_enforced(tmp_path, corrector):
    path = save_exported_corrector(tmp_path / "art", corrector, SHAPE)
    loaded = load_exported_corrector(path)
    with pytest.raises(ValueError, match="exported for volume shape"):
        loaded(np.zeros((8, 8, 8), np.int16))


def test_dtype_coerced(tmp_path, corrector, rng):
    path = save_exported_corrector(tmp_path / "art", corrector, SHAPE)
    loaded = load_exported_corrector(path)
    vol = rng.integers(-500, 500, SHAPE).astype(np.int16)
    # float input is cast to the contract dtype, not rejected
    np.testing.assert_array_equal(
        np.asarray(loaded(vol.astype(np.float32))), np.asarray(loaded(vol))
    )


def test_export_packed_corrector(tmp_path, rng):
    # the production layout: block-space sliding window under jax.export
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        s2d_factor=None,
    )
    variables = gen.init(jax.random.key(1), jnp.zeros((1, *PATCH, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=PATCH, batch_size=2, overlap=0.25,
        layout="packed",
    )
    assert corrector._packed
    vol = rng.integers(-1000, 1400, SHAPE).astype(np.int16)
    want = np.asarray(corrector(vol))
    loaded = load_exported_corrector(
        save_exported_corrector(tmp_path / "packed", corrector, SHAPE)
    )
    np.testing.assert_allclose(np.asarray(loaded(vol)), want, atol=2e-4)


def test_artifact_bundle_picks_pads_crops(tmp_path, corrector, rng):
    # bundle = AOT counterpart of z_bucket: pick smallest depth >= input,
    # edge-pad z, crop back — must equal the live corrector on the padded z
    for d in (18, 24):
        save_exported_corrector(
            tmp_path / f"corrector_20x20x{d}", corrector, (20, 20, d)
        )
    bundle = ArtifactBundle.from_dir(tmp_path)
    assert [a.volume_shape for a in bundle.artifacts] == [
        (20, 20, 18), (20, 20, 24),
    ]
    bundle.warmup()

    # exact-depth volume hits its artifact directly
    assert bundle.pick((20, 20, 18)).volume_shape == (20, 20, 18)
    # intermediate depth pads up to 24 and crops
    assert bundle.pick((20, 20, 20)).volume_shape == (20, 20, 24)
    vol = rng.integers(-1000, 1400, (20, 20, 20)).astype(np.int16)
    got = np.asarray(bundle(vol))
    padded = np.pad(vol, ((0, 0), (0, 0), (0, 4)), mode="edge")
    want = np.asarray(corrector(padded))[:, :, :20]
    np.testing.assert_allclose(got, want, atol=2e-4)

    with pytest.raises(ValueError, match="no artifact serves"):
        bundle(np.zeros((20, 20, 30), np.int16))
    with pytest.raises(ValueError, match="no artifact serves"):
        bundle(np.zeros((24, 24, 18), np.int16))
    with pytest.raises(ValueError, match="empty artifact bundle"):
        ArtifactBundle([])


def test_cross_platform_lowering(corrector):
    # a CPU build host can emit a TPU artifact (deployable, not callable here)
    exp = export_corrector(corrector, SHAPE, platforms=("tpu",))
    assert tuple(exp.platforms) == ("tpu",)
    assert len(exp.serialize()) > 0


def test_serve_artifact_roundtrip(tmp_path, corrector, rng):
    # the HTTP daemon serves a deserialized artifact directly (serve.py
    # --artifact): callable contract is all CorrectionServer needs
    from contrast_gan_3d_tpu.serving import CorrectionServer, correct_remote

    loaded = load_exported_corrector(
        save_exported_corrector(tmp_path / "art", corrector, SHAPE)
    )
    srv = CorrectionServer(loaded, warmup_shape=loaded.volume_shape)
    srv.start()
    try:
        host, port = srv.address
        vol = rng.integers(-1000, 1400, SHAPE).astype(np.int16)
        got = correct_remote(f"http://{host}:{port}", vol)
        np.testing.assert_allclose(got, np.asarray(loaded(vol)), atol=1e-5)
    finally:
        srv.stop()


def test_float_input_contract(tmp_path, corrector, rng):
    vol = rng.normal(0, 300, SHAPE).astype(np.float32)
    exp = export_corrector(corrector, SHAPE, in_dtype=jnp.float32)
    got = np.asarray(exp.call(vol))
    want = np.asarray(corrector(vol))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_export_2d_corrector_roundtrip(tmp_path, rng):
    """The 2D (conf_2D-family) slice-batched corrector exports and round-trips
    through jax.export like the 3D one."""
    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2,
        ndim=2, s2d_factor=None,
    )
    variables = gen.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=(16, 16), batch_size=4,
    )
    vol = rng.integers(-1000, 1400, (16, 16, 6)).astype(np.int16)
    want = np.asarray(corrector(vol))
    path = save_exported_corrector(tmp_path / "c2d", corrector, vol.shape)
    art = load_exported_corrector(path)
    got = np.asarray(art(vol))
    # the live 2D path runs eagerly (per-op), the artifact as one compiled
    # program — fp fusion-order noise only (the 3D test is bit-exact because
    # BOTH sides run the same compiled program); 1e-2 HU is far below the
    # int16 HU quantum
    np.testing.assert_allclose(want, got, atol=1e-2)

"""Argparse-level smoke tests for the notebook-replacement CLI drivers
(SURVEY.md L7: the reference ships 5 notebooks; we ship scripts — these tests
keep every driver executable against the living package APIs, the same rot
guard test_compare_script.py provides for the training study).

Each test drives a script's real ``main()`` in-process (inheriting the
CPU-forced test backend) on tiny synthetic data and asserts the advertised
outputs exist and parse."""

import importlib.util
import json
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

from contrast_gan_3d_tpu.utils import io_utils

REPO = Path(__file__).resolve().parent.parent


def _load_script(name: str):
    spec = importlib.util.spec_from_file_location(
        f"script_{name}", REPO / "scripts" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(monkeypatch, name: str, *argv: str):
    mod = _load_script(name)
    monkeypatch.setattr(sys, "argv", [f"{name}.py", *map(str, argv)])
    mod.main()


def _raw_patient(tmp_path, rng, name="p0", vessel_hu=400):
    """Reference-layout raw patient: <root>/<name>.mhd + <root>/<name>/
    {vessel0.txt, ostia.xml} (scripts/preprocess.py's expected structure)."""
    shape = (20, 20, 16)
    vol = rng.normal(50, 10, shape).astype(np.int16)
    vol[0, 0, 0] = -1000  # pin load_scan's unsigned-offset heuristic off
    pts = np.stack([np.linspace(3, 16, 10)] * 3, -1)
    pts[:, 2] = np.linspace(2, 13, 10)
    for x, y, z in np.round(pts).astype(int):
        vol[x, y, z] = vessel_hu
    pdir = tmp_path / name
    pdir.mkdir(parents=True, exist_ok=True)
    io_utils.write_mhd(vol, tmp_path / f"{name}.mhd", spacing=(1, 1, 1), origin=(0, 0, 0))
    np.savetxt(pdir / "vessel0.txt", np.concatenate([pts, np.full((10, 1), 0.5)], -1))
    (pdir / "ostia.xml").write_text(
        "<ListSize>2</ListSize>\n<pos>3 3 2</pos>\n<pos>4 4 3</pos>\n"
    )
    return tmp_path / f"{name}.mhd", pdir


def test_preprocess_cli_npy_and_corpus(tmp_path, rng, monkeypatch):
    from contrast_gan_3d_tpu.data.hdf5 import corpus_members
    from contrast_gan_3d_tpu.data.preprocess import load_patient

    _raw_patient(tmp_path, rng)
    out = tmp_path / "out"
    _run(monkeypatch, "preprocess", tmp_path, out)
    data, meta = load_patient(out / "p0")
    assert data.shape == (20, 20, 16, 2) and data.dtype == np.int16
    assert meta["centerlines_world"].shape[-1] == 4

    corpus = tmp_path / "corpus.h5"
    _run(monkeypatch, "preprocess", tmp_path, corpus)
    assert corpus_members(corpus) == [f"{corpus}::p0"]

    # --h5-chunks reaches the dataset (z-thin chunks for 2D-slice corpora)
    import h5py

    from contrast_gan_3d_tpu.data.hdf5 import SCAN_DS

    thin = tmp_path / "thin.h5"
    _run(monkeypatch, "preprocess", tmp_path, thin, "--h5-chunks", "16", "16", "1", "2")
    with h5py.File(thin, "r") as fd:
        assert fd["p0"][SCAN_DS].chunks == (16, 16, 1, 2)


def test_preprocess_cli_shards_partition_the_scan_list(tmp_path, rng, monkeypatch):
    """--shard i/n lets N preprocessing jobs split a dataset (each shard its
    own corpus file — HDF5 corpora are single-writer)."""
    from contrast_gan_3d_tpu.data.hdf5 import corpus_members

    for name in ("pa", "pb", "pc"):
        _raw_patient(tmp_path, rng, name)
    members = []
    for i in (0, 1):
        corpus = tmp_path / f"corpus.shard{i}.h5"
        _run(monkeypatch, "preprocess", tmp_path, corpus, "--shard", f"{i}/2")
        members += [m.split("::")[1] for m in corpus_members(corpus)]
    assert sorted(members) == ["pa", "pb", "pc"]  # disjoint, complete


def test_eval_hu_shift_cli(tmp_path, rng, monkeypatch):
    scan, pdir = _raw_patient(tmp_path, rng)
    eval_list = tmp_path / "eval.json"
    eval_list.write_text(json.dumps([[[str(scan), str(pdir), None], 0]]))
    out = tmp_path / "hu"
    _run(monkeypatch, "eval_hu_shift", eval_list, out, "--workers", "1")
    summary = json.loads((out / "hu_shift_original.json").read_text())
    assert summary["OPT/centerlines"]["n"] == 10
    assert summary["OPT/centerlines"]["mean"] > 300
    assert (out / "hu_shift_original.png").stat().st_size > 0


def test_eval_hu_shift_cli_compare_series(tmp_path, rng, monkeypatch):
    """--series overlays multiple cohorts on one comparison figure (the
    reference notebook's original-vs-corrected view)."""
    scan_a, pdir_a = _raw_patient(tmp_path, rng, "pa", vessel_hu=250)
    scan_b, pdir_b = _raw_patient(tmp_path, rng, "pb", vessel_hu=400)
    la = tmp_path / "a.json"
    la.write_text(json.dumps([[[str(scan_a), str(pdir_a), None], -1]]))
    lb = tmp_path / "b.json"
    lb.write_text(json.dumps([[[str(scan_b), str(pdir_b), None], -1]]))
    out = tmp_path / "cmp"
    _run(
        monkeypatch, "eval_hu_shift", la, out,
        "--workers", "1", "--series", f"corrected={lb}",
    )
    orig = json.loads((out / "hu_shift_original.json").read_text())
    corr = json.loads((out / "hu_shift_corrected.json").read_text())
    assert corr["LOW/centerlines"]["mean"] > orig["LOW/centerlines"]["mean"]
    assert (out / "hu_shift_compare.png").stat().st_size > 0


def test_eval_marker_recall_cli(tmp_path, monkeypatch):
    for name in ("pa", "pb"):
        pdir = tmp_path / "ctls" / name
        pdir.mkdir(parents=True)
        pts = np.stack([np.linspace(0, 9, 10)] * 3, -1)
        np.savetxt(pdir / "vessel0.txt", np.concatenate([pts, np.ones((10, 1))], -1))
        adir = tmp_path / "annots" / name
        adir.mkdir(parents=True)
        np.savetxt(adir / "LAD.txt", pts[:4])
        np.savetxt(adir / "RCA.txt", pts[:4] + np.array([10.0, 0, 0]))
    sheet = tmp_path / "labels.csv"
    sheet.write_text("ID,label\npa,0\npb,-1\n")
    out = tmp_path / "mrr.json"
    _run(
        monkeypatch, "eval_marker_recall",
        tmp_path / "ctls", tmp_path / "annots", sheet, out, "--workers", "1",
    )
    payload = json.loads(out.read_text())
    assert payload["per_scan_type"]["OPT"]["LAD"] == 1.0
    assert payload["per_scan_type"]["OPT"]["RCA"] == 0.0
    assert payload["summary"]["suboptimal"]["LAD"] == 1.0


def test_view_batches_cli(tmp_path, rng, monkeypatch):
    from tests.synth import make_dataset

    fold = make_dataset(tmp_path, rng, n_per_label=1)
    splits = tmp_path / "splits.pkl"
    splits.write_bytes(pickle.dumps({"train": [fold], "test": [fold]}))
    out = tmp_path / "grids"
    _run(
        monkeypatch, "view_batches", splits, out,
        "--patch-size", "8", "8", "8", "--batch-size", "2",
    )
    pngs = sorted(p.name for p in out.glob("*.png"))
    assert pngs == ["batch_HIGH.png", "batch_LOW.png", "batch_OPT.png"]


@pytest.mark.slow
def test_export_corrector_cli(tmp_path, rng, monkeypatch):
    import jax
    import optax

    from contrast_gan_3d_tpu.eval.export import load_exported_corrector
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
    from contrast_gan_3d_tpu.trainer.steps import init_state

    state = init_state(
        ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2),
        PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1),
        optax.adam(1e-4), optax.adam(1e-4), jax.random.key(0), (8, 8, 8),
    )
    ckpt_dir = tmp_path / "ck"
    ckpt_lib.save_checkpoint(state, ckpt_dir, step=0)

    out = tmp_path / "artifact"
    _run(
        monkeypatch, "export_corrector", ckpt_dir, out,
        "--shape", "12", "12", "10", "--patch", "8", "8", "8",
        "--dtype", "float32", "--batch", "2",
    )
    art = load_exported_corrector(tmp_path / "artifact.jaxcorr")
    corrected = np.asarray(art(np.zeros((12, 12, 10), np.int16)))
    assert corrected.shape == (12, 12, 10)
    assert np.isfinite(corrected).all()


def test_export_corrector_cli_2d_family(tmp_path, rng, monkeypatch):
    """--patch W H (two ints) drives the conf_2D slice-batched corrector
    through the CLI — the architecture (ndim=2) auto-derives from the
    checkpoint's param tree."""
    import jax
    import optax

    from contrast_gan_3d_tpu.eval.export import load_exported_corrector
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
    from contrast_gan_3d_tpu.trainer.steps import init_state

    state = init_state(
        ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1,
                        init_channels_out=2, ndim=2),
        PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1, ndim=2),
        optax.adam(1e-4), optax.adam(1e-4), jax.random.key(0), (8, 8),
    )
    ckpt_dir = tmp_path / "ck2d"
    ckpt_lib.save_checkpoint(state, ckpt_dir, step=0)

    out = tmp_path / "artifact2d"
    _run(
        monkeypatch, "export_corrector", ckpt_dir, out,
        "--shape", "12", "12", "10", "--patch", "12", "12",
        "--dtype", "float32", "--batch", "4",
    )
    art = load_exported_corrector(tmp_path / "artifact2d.jaxcorr")
    corrected = np.asarray(art(np.zeros((12, 12, 10), np.int16)))
    assert corrected.shape == (12, 12, 10)
    assert np.isfinite(corrected).all()

    # a malformed patch arity is a usage error, not a traceback
    with pytest.raises(SystemExit):
        _run(monkeypatch, "export_corrector", ckpt_dir, out,
             "--shape", "12", "12", "10", "--patch", "12")


def test_serve_cli(tmp_path, rng, monkeypatch):
    """serve.py end-to-end: checkpoint -> warm daemon -> HTTP round-trip.
    ``start(background=False)`` blocks forever, so the test redirects it to
    background mode and captures the server instance for shutdown."""
    import jax
    import optax

    from contrast_gan_3d_tpu import serving
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
    from contrast_gan_3d_tpu.trainer.steps import init_state

    state = init_state(
        ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2),
        PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1),
        optax.adam(1e-4), optax.adam(1e-4), jax.random.key(0), (8, 8, 8),
    )
    ckpt_dir = tmp_path / "ck"
    ckpt_lib.save_checkpoint(state, ckpt_dir, step=1)

    created = []
    orig_init = serving.CorrectionServer.__init__
    orig_start = serving.CorrectionServer.start

    def capture_init(self, *a, **k):
        orig_init(self, *a, **k)
        created.append(self)

    monkeypatch.setattr(serving.CorrectionServer, "__init__", capture_init)
    monkeypatch.setattr(
        serving.CorrectionServer, "start",
        lambda self, background=True: orig_start(self, background=True),
    )
    # the CLI's main-thread path blocks in serve_until_signaled waiting for
    # SIGTERM — redirect it to a plain background start for the smoke test
    monkeypatch.setattr(
        serving.CorrectionServer, "serve_until_signaled",
        lambda self, signums=None: orig_start(self, background=True),
    )
    _run(
        monkeypatch, "serve", ckpt_dir, "--patch", "8", "8", "8",
        "--batch", "2", "--port", "0", "--z-bucket", "0",
        "--max-inflight", "2", "--dtype", "float32",
        "--warmup-shape", "10", "10", "9",
    )
    (srv,) = created
    try:
        import json as _json
        import urllib.request

        host, port = srv.address
        url = f"http://{host}:{port}"
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert _json.loads(r.read())["status"] == "ok"
        vol = rng.integers(-800, 800, (10, 10, 9)).astype(np.int16)
        out = serving.correct_remote(url, vol)
        assert out.shape == vol.shape and np.isfinite(out).all()
        want = np.asarray(srv.service.corrector(vol))
        np.testing.assert_allclose(out, want, atol=1e-4)
    finally:
        srv.stop()


def test_preprocess_cli_h5_chunks_requires_h5_output(tmp_path, rng, monkeypatch):
    """--h5-chunks with the default npy format is a usage error, not a
    silent no-op: the user would believe the corpus is slice-read-optimized
    while .npy patients carry no chunking at all."""
    _raw_patient(tmp_path, rng)
    with pytest.raises(SystemExit):
        _run(
            monkeypatch, "preprocess", tmp_path, tmp_path / "out",
            "--h5-chunks", "16", "16", "1", "2",
        )


@pytest.mark.slow  # ~2 min cold (its toy models compile fresh programs)
def test_validate_learning_cli_with_eval_cohort(monkeypatch, tmp_path):
    """Smoke-scale run of the convergence study CLI with the persisted
    workdir + held-out eval cohort, chained into eval_hu_shift (the
    committed reports/synthetic_study artifact pipeline). Numbers are
    meaningless at 4 iterations — this keeps the pipeline executable."""
    wd = tmp_path / "study"
    _run(
        monkeypatch, "validate_learning",
        "--iterations", "4", "--cycle-length", "2",
        "--workdir", wd, "--eval-cohort", "1",
        "--out", wd / "summary.json",
    )
    summary = json.loads((wd / "summary.json").read_text())
    assert "centerline_mean_hu_after" in summary
    assert (wd / "ckpt").exists()
    original = json.loads((wd / "original_list.json").read_text())
    assert any(label == -1 for _, label in original)  # held-out LOW
    assert any(label == 0 for _, label in original)   # OPT anchor
    _run(
        monkeypatch, "eval_hu_shift",
        wd / "original_list.json", wd / "hu_shift",
        "--tag", "original", "--workers", "1",
        "--series", f"corrected={wd / 'corrected_list.json'}",
    )
    for f in ("hu_shift_original.json", "hu_shift_corrected.json",
              "hu_shift_compare.png"):
        assert (wd / "hu_shift" / f).exists()
    corrected = json.loads(
        (wd / "hu_shift" / "hu_shift_corrected.json").read_text()
    )
    assert corrected  # non-empty per-ScanType summary


@pytest.mark.slow  # ~30 s: 5 programs trace+lower each run (not cacheable)
def test_flops_accounting_cli_smoke(monkeypatch, capsys):
    """Rot guard: the MFU-accounting probe (PERF.md round-4 table) stays
    executable against the living step/model APIs (--smoke = tiny shapes;
    the real run's numbers are committed in PERF.md)."""
    _run(monkeypatch, "flops_accounting", "--smoke", "--json")
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {
        "combined_wc_128c_b12", "critic_only_128c_b12",
        "combined_gp_128c_b12", "combined_wc_128sq_b512",
        "inference_fwd_packed_128c_b24",
    }
    for v in out.values():
        assert v["flops"] > 0


def test_serve_cli_dp_devices(tmp_path, rng, monkeypatch):
    """serve.py --dp-devices: the daemon comes up with the corrector's patch
    grid sharded over the CPU mesh and serves outputs equal to the
    single-chip corrector (the multi-chip serving wiring, VERDICT r4 #5)."""
    import jax
    import optax

    from contrast_gan_3d_tpu import serving
    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
    from contrast_gan_3d_tpu.trainer.steps import init_state

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")

    gen = ResnetGenerator(
        n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2
    )
    state = init_state(
        gen,
        PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1),
        optax.adam(1e-4), optax.adam(1e-4), jax.random.key(0), (8, 8, 8),
    )
    ckpt_dir = tmp_path / "ck"
    ckpt_lib.save_checkpoint(state, ckpt_dir, step=1)

    created = []
    orig_init = serving.CorrectionServer.__init__
    orig_start = serving.CorrectionServer.start

    def capture_init(self, *a, **k):
        orig_init(self, *a, **k)
        created.append(self)

    monkeypatch.setattr(serving.CorrectionServer, "__init__", capture_init)
    monkeypatch.setattr(
        serving.CorrectionServer, "serve_until_signaled",
        lambda self, signums=None: orig_start(self, background=True),
    )
    monkeypatch.setattr(
        serving.CorrectionServer, "start",
        lambda self, background=True: orig_start(self, background=True),
    )
    _run(
        monkeypatch, "serve", ckpt_dir, "--patch", "8", "8", "8",
        "--batch", "2", "--port", "0", "--z-bucket", "0",
        "--dtype", "float32", "--dp-devices", "2",
    )
    (srv,) = created
    try:
        host, port = srv.address
        url = f"http://{host}:{port}"
        # block-aligned extent: the sharded/unsharded equality contract
        vol = rng.integers(-800, 800, (12, 12, 8)).astype(np.int16)
        out = serving.correct_remote(url, vol)
        single = CCTAContrastCorrector(
            gen,
            jax.device_get(state.gen_params),
            jax.device_get(state.gen_stats) or None,
            inference_patch_size=(8, 8, 8), batch_size=2,
            dtype=__import__("jax.numpy", fromlist=["float32"]).float32,
        )
        np.testing.assert_allclose(
            out, np.asarray(single(vol)), rtol=1e-4, atol=5e-2
        )
    finally:
        srv.stop()

    # usage errors, not tracebacks: artifact/2D x --dp-devices conflicts
    with pytest.raises(SystemExit):
        _run(monkeypatch, "serve", ckpt_dir, "--patch", "8", "8",
             "--dp-devices", "2")


def test_synthetic_tracker_and_marker_recall_cli(tmp_path, rng, monkeypatch):
    """The synthetic-tracker stand-in -> eval_marker_recall.py chain (the
    committed reports/synthetic_study marker-recall artifact pipeline):
    bright vessels track (recall 1.0), under-enhanced ones do not (no
    centerline output at all — the failure the metric must surface)."""
    from contrast_gan_3d_tpu.utils import io_utils

    raw = tmp_path / "raw"
    raw.mkdir()
    cohort = []
    for name, vessel_hu, label in (("opt_0", 420, 0), ("low_0", 250, -1)):
        vol = rng.normal(50, 10, (16, 16, 16)).astype(np.int16)
        vol[0, 0, 0] = -1000
        pts = np.stack([np.linspace(3, 12, 12)] * 3, -1)
        for x, y, z in np.round(pts).astype(int):
            vol[x, y, z] = vessel_hu
        scan = raw / f"{name}.mhd"
        io_utils.write_mhd(vol, scan, spacing=np.ones(3), origin=np.zeros(3))
        pdir = raw / name
        pdir.mkdir()
        np.savetxt(
            pdir / "vessel0.txt",
            np.concatenate([pts, np.ones((len(pts), 1))], -1),
        )
        cohort.append([[str(scan), str(pdir), None], label])
    clist = tmp_path / "cohort.json"
    clist.write_text(json.dumps(cohort))

    tracked = tmp_path / "tracked"
    annots = tmp_path / "annots"
    _run(monkeypatch, "synthetic_tracker", clist, tracked,
         "--annotations-out", annots)
    # bright vessels tracked, under-enhanced ones not
    assert len(np.loadtxt(tracked / "opt_0" / "vessel0.txt", ndmin=2)) > 5
    assert (tracked / "low_0" / "vessel0.txt").read_text().strip() == ""
    # derived annotations: 3 arteries x 4 markers each + the labels sheet
    for artery in ("LAD", "LCX", "RCA"):
        assert np.loadtxt(annots / "opt_0" / f"{artery}.txt").shape == (4, 3)
    assert "opt_0,0" in (annots / "labels.csv").read_text()

    out = tmp_path / "recall.json"
    _run(monkeypatch, "eval_marker_recall", tracked, annots,
         annots / "labels.csv", out, "--workers", "2")
    rec = json.loads(out.read_text())
    assert rec["summary"]["optimal"] == {"LAD": 1.0, "LCX": 1.0, "RCA": 1.0}
    assert rec["summary"]["suboptimal"] == {}  # nothing tracked on LOW

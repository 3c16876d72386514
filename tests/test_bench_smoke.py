"""Execute EVERY code path bench.py's main() can reach, on CPU, in seconds.

bench.py is the one file the driver runs verbatim at the end of each round;
round 3's record was half-lost because a late refactor left an undefined
name in ``bench_cycle`` and nothing in the suite imported the file. These
tests run the complete default sequence (and each BENCH_MODE) under
``BENCH_SMOKE=1`` (tiny shapes, 1-block models — numbers meaningless,
call graph identical) and pin the exact metric-line contract the driver's
``BENCH_r0N.json`` consumers parse.
"""

import json
import pathlib
import sys

ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import bench  # noqa: E402


def _run_main(monkeypatch, capsys, **env):
    monkeypatch.setenv("BENCH_SMOKE", "1")
    monkeypatch.setenv("BENCH_REPS", "1")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    metrics = []
    for line in lines:
        rec = json.loads(line)  # every stdout line must be a JSON metric
        # the probe line additionally carries the run's provenance blob
        # (git sha, probe state, watchdog scaling — VERDICT r4 weak #6);
        # extra keys beyond that are still a contract break
        assert set(rec) - {"meta"} == {"metric", "value", "unit",
                                       "vs_baseline"}, rec
        if "meta" in rec:
            assert rec["metric"] == "device_dispatch_probe", rec
            assert {"git_sha", "platform", "probe_s", "watchdog_scale"} <= (
                set(rec["meta"])
            ), rec
        assert isinstance(rec["value"], (int, float)), rec
        metrics.append(rec)
    return metrics


def test_default_sequence_emits_full_contract(monkeypatch, capsys):
    """The default run must emit the probe + all 7 metric lines, in order,
    with the headline LAST (the driver reports the last line as the round's
    headline — round 3's crash demoted it to a train metric)."""
    metrics = _run_main(monkeypatch, capsys)
    assert [m["metric"] for m in metrics] == [
        "device_dispatch_probe",
        "train_patches_per_sec_128c_wc",
        "train_patches_per_sec_128c_gp",
        "train_patches_per_sec_128c_wc_batch96",
        "train_patches_per_sec_128c_wc_cycle5",
        "train_patches_per_sec_128c_gp_cycle5",
        "train_patches_per_sec_128sq_wc",
        "train_patches_per_sec_128sq_wc_batch4096",
        "inference_volumes_per_sec",
        "inference_volumes_per_sec_resident",
        "full_volume_correction_latency_512x512x400_50ov",
        "full_volume_correction_latency_512x512x400",
    ]
    # latency lines carry the vs-2s-target speedup; train lines carry None
    assert metrics[-1]["vs_baseline"] is not None
    assert metrics[1]["vs_baseline"] is None


def test_mode_cycle(monkeypatch, capsys):
    """BENCH_MODE=cycle — the exact path round 3 committed broken."""
    metrics = _run_main(monkeypatch, capsys, BENCH_MODE="cycle",
                        BENCH_CYCLE="2")
    assert metrics[-1]["metric"] == "train_patches_per_sec_128c_wc_cycle2"


def test_mode_train_gp_and_infer(monkeypatch, capsys):
    metrics = _run_main(monkeypatch, capsys, BENCH_MODE="train", BENCH_GP="1")
    assert metrics[-1]["metric"] == "train_patches_per_sec_128c_gp"
    metrics = _run_main(monkeypatch, capsys, BENCH_MODE="infer",
                        BENCH_OVERLAP="0.5")
    assert metrics[-1]["metric"] == (
        "full_volume_correction_latency_512x512x400_50ov"
    )


def test_mode_2d(monkeypatch, capsys):
    """BENCH_2D=1 default sequence: 2D line plus both inference lines only
    (the 3D train variants are skipped by contract)."""
    metrics = _run_main(monkeypatch, capsys, BENCH_2D="1")
    assert [m["metric"] for m in metrics] == [
        "device_dispatch_probe",
        "train_patches_per_sec_128sq_wc",
        "inference_volumes_per_sec",
        "inference_volumes_per_sec_resident",
        "full_volume_correction_latency_512x512x400_50ov",
        "full_volume_correction_latency_512x512x400",
    ]


def test_mode_stream_resident(monkeypatch, capsys):
    """BENCH_MODE=stream BENCH_RESIDENT=1 — the compute-bound sustained
    line through the device-resident correct_patients pipeline."""
    metrics = _run_main(monkeypatch, capsys, BENCH_MODE="stream",
                        BENCH_RESIDENT="1", BENCH_STREAM_N="4")
    assert metrics[-1]["metric"] == "inference_volumes_per_sec_resident"
    assert metrics[-1]["vs_baseline"] is not None

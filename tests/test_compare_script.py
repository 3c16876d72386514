"""Rot guard for scripts/compare_reference_training.py — the head-to-head
training study vs the live reference Trainer (results committed at the repo
root as reference_training_comparison.json).

Runs the study at smoke scale (10 iterations covers both the critic-only and
the combined alternation branches) in a subprocess on the CPU backend and
checks the emitted JSON has the full result structure with finite values.
The committed 800-iteration result is the actual evidence; this test only
keeps the script executable against the living APIs on both sides.
"""

import json
import pytest
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_compare_reference_training_smoke(tmp_path):
    out = tmp_path / "cmp.json"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "compare_reference_training.py"),
            "--iterations", "10",
            "--shape", "32", "32", "32",
            "--patch", "16", "16", "16",
            "--cpu",
            "--out", str(out),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    summary = json.loads(out.read_text())
    assert summary["iterations"] == 10
    for tag in ("low", "high"):
        row = summary[f"{tag}_scan_centerline_mean_hu"]
        for side in ("ours", "reference"):
            after = row[side]["after"]
            assert isinstance(after, float) and abs(after) < 5000
        # both sides started from identical weights and saw identical
        # batches; 10 iterations cannot drift the corrections far apart
        assert abs(row["after_delta_ours_vs_reference"]) < 50


@pytest.mark.slow
def test_compare_reference_training_smoke_2d(tmp_path):
    """--family 2d: the conf_2D-family head-to-head (2D models on both
    sides, axial-slice batches, per-slice correction judging)."""
    out = tmp_path / "cmp2d.json"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "compare_reference_training.py"),
            "--iterations", "10",
            "--shape", "32", "32", "32",
            "--family", "2d",
            "--cpu",
            "--out", str(out),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    summary = json.loads(out.read_text())
    assert summary["family"] == "2d"
    for tag in ("low", "high"):
        row = summary[f"{tag}_scan_centerline_mean_hu"]
        assert abs(row["after_delta_ours_vs_reference"]) < 50

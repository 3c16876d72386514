"""Device-memory / per-program shape reporting (utils/memory.py).

TPU-native analogue of the reference profiler's record_shapes=True,
profile_memory=True (reference train.py:44-47): static per-program HBM
budgets via Compiled.memory_analysis() + the live-buffer table, wired into
train.JaxProfiler's trace cycles and scripts/memory_report.py.
"""

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _no_heap_probe(monkeypatch):
    # the pprof heap profile aborts this environment's PJRT plugin; the
    # support probe costs a subprocess jax import — skip both in tests
    monkeypatch.setenv("MEMPROF_HEAP", "0")


def test_program_memory_summary_keys():
    from contrast_gan_3d_tpu.utils.memory import program_memory_summary

    compiled = jax.jit(lambda x: (x @ x).sum()).lower(
        jax.ShapeDtypeStruct((64, 64), jnp.float32)
    ).compile()
    s = program_memory_summary(compiled)
    assert s["argument_size_in_bytes"] == 64 * 64 * 4
    assert s["output_size_in_bytes"] >= 4
    assert "program_hbm_bytes" in s
    # CPU backend reports flops for this matmul; treat as optional elsewhere
    assert s.get("flops", 1.0) > 0


def test_live_buffer_table_sees_resident_array():
    from contrast_gan_3d_tpu.utils.memory import (
        format_live_buffer_table, live_buffer_table,
    )

    marker = jnp.ones((137, 61), jnp.float32) + 0  # unique shape
    table = live_buffer_table()
    assert table["total_bytes"] >= marker.nbytes
    row = next(r for r in table["rows"] if r["shape"] == "(137, 61)")
    assert row["bytes"] >= 137 * 61 * 4
    text = format_live_buffer_table(table)
    assert "(137, 61)" in text and "live device buffers" in text
    del marker


def test_live_buffer_table_folds_tail_rows():
    from contrast_gan_3d_tpu.utils.memory import live_buffer_table

    keep = [jnp.ones((3, i + 2)) + 0 for i in range(8)]
    table = live_buffer_table(top=2)
    assert len(table["rows"]) == 3  # 2 + "...other"
    assert table["rows"][-1]["shape"].startswith("...other")
    # totals preserved across the fold
    assert sum(r["bytes"] for r in table["rows"]) == table["total_bytes"]
    del keep


def test_heap_profile_gated_off(tmp_path):
    from contrast_gan_3d_tpu.utils.memory import (
        dump_heap_profile, heap_profile_supported,
    )

    assert heap_profile_supported() is False  # MEMPROF_HEAP=0
    assert dump_heap_profile(tmp_path / "m.prof") is False
    assert not (tmp_path / "m.prof").exists()


def test_write_memory_snapshot(tmp_path):
    from contrast_gan_3d_tpu.utils.memory import write_memory_snapshot

    paths = write_memory_snapshot(tmp_path, "step7")
    assert [p.endswith("memory_step7.txt") for p in paths] == [True]
    content = (tmp_path / "memory_step7.txt").read_text()
    assert "live device buffers" in content


def test_jax_profiler_writes_memory_snapshot(tmp_path):
    """The JaxProfiler trace cycle drops the memory artifacts alongside the
    XProf trace (the production --profiler-dir path)."""
    import train as train_mod

    prof = train_mod.JaxProfiler(str(tmp_path), active=1, skip_first=0)
    prof.begin()
    float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    prof.step()  # closes the 1-step cycle -> trace + memory snapshot
    prof.stop()
    mems = list(tmp_path.glob("memory_step*.txt"))
    assert len(mems) == 1
    assert "live device buffers" in mems[0].read_text()
    # the XProf trace itself was also written
    assert list(tmp_path.glob("plugins/profile/*")), "trace dir missing"


def test_memory_report_script_cli(tmp_path):
    """scripts/memory_report.py end-to-end on CPU (tiny: train program only,
    AOT, no execution)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out = tmp_path / "mem.md"
    r = subprocess.run(
        [sys.executable, str(repo / "scripts" / "memory_report.py"),
         "--programs", "train,cycle5", "--tiny", "--out", str(out)],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "MEMPROF_HEAP": "0"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    text = out.read_text()
    assert "WGAN-WC combined step 2+2 @32^3" in text
    assert "fused 5-iteration cycle" in text
    assert "arguments" in text and "program HBM" in text
    assert "live device buffers" in text  # the post-run table

"""Test config: force an 8-device virtual CPU platform BEFORE jax imports so
multi-chip sharding tests run anywhere (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip)."""

import os

# overwrite (not setdefault): the session env pre-sets JAX_PLATFORMS to the
# real TPU platform, but tests need the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the axon sitecustomize sets jax_platforms programmatically (overriding the
# env var) — force CPU again at config level before any backend initializes
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated test runs skip recompiles
from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()  # scoped per platform+CPU features (utils/cache.py)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# The smoke contract (VERDICT r3 #6): `pytest -m smoke` is the <2-minute
# subset that MUST run before any snapshot-bound commit — it executes every
# driver-run entry file (bench.py via BENCH_SMOKE, __graft_entry__.py,
# train.py, each scripts/ CLI) plus one fast test per subsystem. Curated
# here (single source of truth) instead of scattered decorators.
# File-only entries mark the whole file; func entries ignore parametrization.
_SMOKE = {
    # driver-executed entry files
    "test_bench_smoke.py::test_default_sequence_emits_full_contract",
    "test_bench_smoke.py::test_mode_cycle",
    "test_graft_entry.py",        # entry() + dryrun_multichip
    "test_scripts_cli.py",        # every scripts/ CLI main() in-process
    "test_train_cli.py::test_train_cli_end_to_end",
    # one per subsystem
    "test_io.py::test_mhd_roundtrip",
    "test_geometry.py::test_world_to_image_roundtrip",
    "test_models.py::test_generator_param_count_matches_reference",
    "test_losses.py::test_wasserstein_loss",
    "test_scaler.py::test_zero_center_shift_value",
    "test_hdf5.py::test_standalone_roundtrip",
    "test_pipeline.py::test_prefetch_loader_lifecycle",
    "test_host_augment.py::test_identity_affine_roundtrip",
    "test_native.py::test_crop_pad_from_memmap",
    "test_checkpoint.py::test_save_load_roundtrip",
    "test_trainer.py::test_split_combined_forces_per_iteration_dispatch",
    "test_sliding_window.py::test_grid_starts_cover_every_voxel",
    "test_eval_metrics.py::test_collect_patient_voxels",
    "test_serving.py::test_healthz_and_roundtrip",
    "test_parallel.py::test_data_parallel_step_matches_single_device[packed-wc]",
}


def pytest_collection_modifyitems(config, items):
    smoke_files = {e for e in _SMOKE if "::" not in e}
    smoke_funcs = {e for e in _SMOKE if "::" in e}
    consumed = set()
    collected_files = set()
    for item in items:
        fname = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        collected_files.add(fname)
        exact = fname + "::" + item.name
        base = fname + "::" + item.name.split("[", 1)[0]
        hit = None
        if fname in smoke_files:
            hit = fname
        elif base in smoke_funcs:
            hit = base
        elif exact in smoke_funcs:
            hit = exact
        if hit is not None:
            consumed.add(hit)
            if item.get_closest_marker("slow") is None:  # smoke is FAST
                item.add_marker(pytest.mark.smoke)
    # a renamed/deleted test must FAIL collection, not silently shrink the
    # smoke contract (the round-3 failure mode: coverage quietly lost).
    # Only entries whose FILE was collected are checked, so running a
    # single test file never trips on the other files' entries; node-id
    # invocations (`file.py::test_x`) collect partial files and skip the
    # check entirely.
    if any("::" in str(a) for a in config.args):
        return
    stale = [
        e for e in _SMOKE
        if e not in consumed and e.split("::", 1)[0] in collected_files
    ]
    # full-tree runs (no .py file named on the command line) additionally
    # require every _SMOKE FILE to exist — a whole-file rename/delete must
    # fail here too, not silently drop its subsystem from the contract
    if not any(str(a).endswith(".py") for a in config.args):
        stale += [
            e for e in _SMOKE
            if e.split("::", 1)[0] not in collected_files and e not in stale
        ]
    if stale:
        raise pytest.UsageError(
            f"_SMOKE entries matched no collected test (renamed?): {stale}"
        )

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

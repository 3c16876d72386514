"""Headline benchmark: full-volume sliding-window correction latency.

North-star (BASELINE.md): correct a 512x512x400 CCTA volume — sliding window
with Gaussian-weighted blending, 128^3 patches, 50% overlap (294 generator
forwards) — in < 2 s on one TPU chip. Prints ONE JSON line; ``vs_baseline``
is the speedup over that 2 s target (>1 = beating it).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.ops.sliding_window import make_volume_corrector

    shape = (512, 512, 400)
    patch = (128, 128, 128)
    overlap = float(os.environ.get("BENCH_OVERLAP", "0.5"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    # flagship generator, bf16 compute / f32 params (MXU-native)
    gen = ResnetGenerator(dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    variables = gen.init(jax.random.key(0), x0, train=False)
    apply_fn = lambda v: gen.apply(variables, v, train=False)

    correct = make_volume_corrector(
        apply_fn, patch_size=patch, overlap=overlap, batch_size=batch,
        dtype=jnp.bfloat16,
    )

    vol = jnp.asarray(
        np.random.default_rng(0).integers(-1024, 1500, shape, dtype=np.int16)
    )

    def run_one():
        # block_until_ready does not actually block on the axon tunnel;
        # fetching one element forces completion of the whole program
        out = correct(vol)
        float(out[0, 0, 0])

    run_one()  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_one()
        times.append(time.perf_counter() - t0)
    latency = min(times)

    target = 2.0
    print(json.dumps({
        "metric": "full_volume_correction_latency_512x512x400",
        "value": round(latency, 4),
        "unit": "s",
        "vs_baseline": round(target / latency, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

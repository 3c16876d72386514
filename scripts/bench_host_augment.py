#!/usr/bin/env python
"""Host augmentation throughput benchmark (the train-time input ceiling).

Measures, on this host, for 128^3 patches:
- native warp latency with every transform firing (rotation+scale+elastic —
  the worst case) and its OpenMP thread count
- effective augmentation cost at the reference probabilities (elastic p=.1,
  scale p=.2, rotation p=.2 — experiments/basic_conf.py:88-113), where
  ~58% of samples skip the warp entirely
- mmap crop cost (native crop_pad_int16)
- the resulting sustainable patches/s and the margin vs a given train-step
  consumption rate (--consumption, default 83.7 patches/s = the packed-layout
  4:1-schedule effective rate from PERF.md)
- the 2D (conf_2D-family) warp: worst-case 128^2 slice latency and slices/s
  vs the chip's 2D consumption (--consumption-2d, default 10384 slices/s)

Prints one JSON object.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--consumption", type=float, default=83.7)
    p.add_argument("--consumption-2d", type=float, default=10384.0)
    args = p.parse_args()

    from contrast_gan_3d_tpu import native
    from contrast_gan_3d_tpu.data.augment import Augment2DConfig, AugmentConfig
    from contrast_gan_3d_tpu.data.host_augment import HostAugmenter, HostAugmenter2D

    assert native.has_native(), "native hostops unavailable"
    n = args.patch
    rng = np.random.default_rng(0)
    scan = rng.integers(-1024, 1500, (n, n, n), dtype=np.int16)
    seg = (rng.random((n, n, n)) < 0.001).astype(np.int16)

    def best(fn, reps):
        fn()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    # worst case: every transform fires
    always = HostAugmenter(
        AugmentConfig(p_elastic=1.0, p_scale=1.0, p_rotation=1.0),
        np.random.default_rng(1),
    )
    warp_s = best(lambda: always(scan, seg), args.reps)

    # reference probabilities -> average over many draws
    default = HostAugmenter(AugmentConfig(), np.random.default_rng(2))
    k = 40
    t0 = time.perf_counter()
    for _ in range(k):
        default(scan, seg)
    eff_s = (time.perf_counter() - t0) / k

    vol = rng.integers(-1024, 1500, (192, 192, 160, 2), dtype=np.int16)
    crop_s = best(
        lambda: native.crop_pad_int16(vol, (10, 20, 5), (n, n, n)), args.reps
    )

    # 2D warp (conf_2D family): worst case = every slice rotated + mirrored
    sl = rng.integers(-1024, 1500, (n, n), dtype=np.int16)
    sl_seg = (rng.random((n, n)) < 0.001).astype(np.int16)
    always2d = HostAugmenter2D(
        Augment2DConfig(p_rotation=1.0, p_mirror=1.0), np.random.default_rng(3)
    )
    k2 = 400
    always2d(sl, sl_seg)
    t0 = time.perf_counter()
    for _ in range(k2):
        always2d(sl, sl_seg)
    warp2d_s = (time.perf_counter() - t0) / k2

    per_patch = eff_s + crop_s
    sustained = 1.0 / per_patch
    out = {
        "warp_threads": native.warp_num_threads(),
        "warp_ms_always_on": round(warp_s * 1e3, 2),
        "augment_ms_effective": round(eff_s * 1e3, 2),
        "crop_ms": round(crop_s * 1e3, 2),
        "sustained_patches_per_sec": round(sustained, 2),
        "consumption_patches_per_sec": args.consumption,
        "feeds_train_step": bool(sustained >= args.consumption),
        "warp2d_us_always_on": round(warp2d_s * 1e6, 1),
        "sustained_2d_slices_per_sec": round(1.0 / warp2d_s, 0),
        "feeds_2d_train_step": bool(1.0 / warp2d_s >= args.consumption_2d),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Regenerate ``tests/goldens/reference_parity.json`` from the live torch
reference (reference ``model/generator.py``, ``model/discriminator.py``).

The goldens pin summary statistics of the reference models' outputs under
the deterministic weights used by ``tests/test_reference_parity.py``, so the
flax side keeps being checked against the reference's numbers even on
machines without the reference checkout.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import torch

from tests.test_reference_parity import fill_deterministic, load_reference_models


def main():
    ref = load_reference_models()
    out = {}

    tg = ref["generator"].ResnetGenerator(4, 2, 16).eval()
    fill_deterministic(tg, seed=0)
    x = np.random.default_rng(1).normal(0, 0.5, (2, 1, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        y = tg(torch.from_numpy(x)).numpy()
    out["generator_3d"] = {
        "mean": float(y.mean()),
        "std": float(y.std()),
        "corner": [float(v) for v in y[0, 0, :2, :2, :2].ravel()],
    }

    tc = ref["discriminator"].PatchGANDiscriminator(1, 8, 3, negative_slope=0.2).eval()
    fill_deterministic(tc, seed=4)
    x = np.random.default_rng(5).normal(0, 0.5, (2, 1, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        y = tc(torch.from_numpy(x)).numpy()
    out["critic_3d"] = {
        "mean": float(y.mean()),
        "first8": [float(v) for v in y.ravel()[:8]],
    }

    path = Path(__file__).resolve().parent.parent / "tests" / "goldens" / "reference_parity.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

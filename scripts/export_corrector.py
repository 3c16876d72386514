#!/usr/bin/env python
"""Export a trained corrector as an AOT StableHLO serving artifact.

Loads a generator (native msgpack checkpoint, or a reference torch ``.pt``
via ``--reference-pt``), builds the sliding-window corrector, and lowers the
whole correction program for one volume shape into ``<out>.jaxcorr`` +
``<out>.jaxcorr.json`` (``jax.export``). A serving process then loads it with
``contrast_gan_3d_tpu.eval.export.load_exported_corrector`` — no model code,
checkpoint, or re-tracing needed (see eval/export.py module docs).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import jax

from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()  # scoped per platform+CPU features (utils/cache.py)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="checkpoint dir/.msgpack, or .pt with --reference-pt")
    p.add_argument("out", type=Path,
                   help="artifact path (suffix .jaxcorr appended); with "
                        "multiple --shape, a bundle DIRECTORY of per-shape "
                        "artifacts (eval.export.ArtifactBundle)")
    p.add_argument("--shape", type=int, nargs=3, required=True,
                   action="append", metavar=("W", "H", "D"),
                   help="volume shape the artifact serves (repeat for a "
                        "multi-z-bucket bundle)")
    p.add_argument("--reference-pt", action="store_true",
                   help="checkpoint is a reference torch .pt file")
    p.add_argument("--patch", type=int, nargs="+", default=(128, 128, 128),
                   help="inference patch size: W H D (3D sliding window) or "
                        "W H (conf_2D family, slice-batched)")
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--dtype", choices=("bfloat16", "float32"), default="bfloat16")
    p.add_argument("--in-dtype", choices=("int16", "float32"), default="int16",
                   help="dtype the artifact accepts (int16 = on-disk HU)")
    p.add_argument("--platform", action="append", default=None,
                   help="target platform(s), e.g. --platform tpu (repeatable; "
                        "default: current backend)")
    args = p.parse_args()
    if len(args.patch) not in (2, 3):
        p.error("--patch takes W H D (3D) or W H (2D)")

    import jax.numpy as jnp
    import numpy as np

    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
    from contrast_gan_3d_tpu.eval.export import save_exported_corrector

    kwargs = dict(
        inference_patch_size=tuple(args.patch), overlap=args.overlap,
        batch_size=args.batch, dtype=jnp.dtype(args.dtype), z_bucket=0,
    )
    if args.reference_pt:
        corrector = CCTAContrastCorrector.from_reference_checkpoint(
            args.checkpoint, **kwargs
        )
    else:
        corrector = CCTAContrastCorrector.from_checkpoint(args.checkpoint, **kwargs)

    extra_meta = {
        "checkpoint": str(args.checkpoint),
        "patch_size": list(args.patch),
        "overlap": args.overlap,
        "compute_dtype": args.dtype,
    }
    shapes = [tuple(s) for s in args.shape]
    for shape in shapes:
        out = args.out
        if len(shapes) > 1:  # bundle directory, one artifact per shape
            out = args.out / ("corrector_%dx%dx%d" % shape)
        path = save_exported_corrector(
            out, corrector, shape, in_dtype=np.dtype(args.in_dtype),
            platforms=args.platform, extra_meta=extra_meta,
        )
        print(f"wrote {path} ({path.stat().st_size / 1e6:.1f} MB) "
              f"+ {path.name}.json")


if __name__ == "__main__":
    main()

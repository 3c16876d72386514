#!/usr/bin/env python
"""Serve full-volume contrast correction over HTTP.

Loads a trained generator (native msgpack checkpoint dir/file, or a
reference torch ``.pt`` via ``--reference-pt``), optionally pre-compiles the
sliding-window program for the expected volume shape, and serves:
``POST /correct`` (npy in -> npy out), ``GET /healthz``, ``GET /stats``.
Client: ``contrast_gan_3d_tpu.serving.correct_remote(url, volume)``.
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
    p.add_argument("checkpoint", help="checkpoint dir/.msgpack, a .pt with "
                   "--reference-pt, or a .jaxcorr artifact with --artifact")
    p.add_argument("--reference-pt", action="store_true",
                   help="checkpoint is a reference torch .pt file")
    p.add_argument("--artifact", action="store_true",
                   help="checkpoint is an AOT .jaxcorr serving artifact "
                        "(scripts/export_corrector.py) — no model code or "
                        "tracing; serves exactly the exported volume shape")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8390)
    p.add_argument("--patch", type=int, nargs="+", default=(128, 128, 128),
                   help="inference patch size: W H D (3D sliding window) or "
                        "W H (conf_2D family, slice-batched)")
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--batch", type=int, default=None,
                   help="patches per forward (default: corrector auto)")
    p.add_argument("--dtype", choices=("bfloat16", "float32"),
                   default="bfloat16",
                   help="compute dtype (float32 = strict-parity serving)")
    p.add_argument("--z-bucket", type=int, default=64,
                   help="pad volume z to this multiple before correcting "
                        "(bounds recompiles for mixed z extents; 0 = off)")
    p.add_argument("--warmup-shape", type=int, nargs=3, default=None,
                   help="pre-compile for this volume shape (e.g. 512 512 400)")
    p.add_argument("--max-inflight", type=int, default=4,
                   help="max concurrent requests holding volume bytes in "
                        "host memory (slot held through the response write); "
                        "excess requests queue before reading their body "
                        "(default 4, min 1 — there is no 'unlimited')")
    p.add_argument("--dp-devices", type=int, default=None,
                   help="shard each volume's patch grid over this many "
                        "local devices (parallel/inference sharded "
                        "sliding window — multi-chip serving hosts; "
                        "3D checkpoint serving only, not --artifact/2D)")
    args = p.parse_args()
    if len(args.patch) not in (2, 3):
        p.error("--patch takes W H D (3D) or W H (2D)")
    if args.max_inflight < 1:
        p.error("--max-inflight must be >= 1 (the cap IS the host-memory "
                "bound; 0 would block every request forever)")
    if args.dp_devices is not None:
        if args.artifact:
            p.error("--dp-devices needs live tracing; AOT .jaxcorr "
                    "artifacts are exported single-chip")
        if len(args.patch) == 2:
            p.error("--dp-devices applies to the 3D sliding window only")
        if args.dp_devices < 1:
            p.error("--dp-devices must be >= 1")

    import jax.numpy as jnp

    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
    from contrast_gan_3d_tpu.serving import CorrectionServer

    kwargs = dict(
        inference_patch_size=tuple(args.patch), overlap=args.overlap,
        batch_size=args.batch, z_bucket=args.z_bucket,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    if args.artifact:
        from pathlib import Path as _P

        from contrast_gan_3d_tpu.eval.export import (
            ArtifactBundle, load_exported_corrector,
        )

        if _P(args.checkpoint).is_dir():  # multi-z-bucket bundle directory
            corrector = ArtifactBundle.from_dir(args.checkpoint)
            corrector.warmup()
            warmup = None
        else:
            corrector = load_exported_corrector(args.checkpoint)
            warmup = corrector.volume_shape  # one compile on first call
    elif args.reference_pt:
        corrector = CCTAContrastCorrector.from_reference_checkpoint(
            args.checkpoint, **kwargs
        )
        warmup = tuple(args.warmup_shape) if args.warmup_shape else None
    else:
        corrector = CCTAContrastCorrector.from_checkpoint(args.checkpoint, **kwargs)
        warmup = tuple(args.warmup_shape) if args.warmup_shape else None

    if args.dp_devices is not None:
        # multi-chip serving host: the SAME daemon, each volume's patch grid
        # sharded across the local mesh (the TPU answer to scaling the
        # reference's per-process model replicas, eval/utils.py:27-39)
        from contrast_gan_3d_tpu.parallel.mesh import data_mesh

        corrector.shard_over(data_mesh(args.dp_devices))
        print(
            f"serving with the patch grid sharded over {args.dp_devices} "
            f"devices ({jax.default_backend()})", flush=True,
        )

    server = CorrectionServer(
        corrector, host=args.host, port=args.port, warmup_shape=warmup,
        max_inflight=args.max_inflight,
    )
    import threading

    if threading.current_thread() is threading.main_thread():
        # graceful shutdown: SIGTERM/SIGINT drain in-flight requests first
        server.serve_until_signaled()
    else:  # embedded (tests drive main() off-thread): plain blocking serve
        server.start(background=False)


if __name__ == "__main__":
    main()

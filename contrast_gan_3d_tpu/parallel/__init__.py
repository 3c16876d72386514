"""Multi-chip parallelism over a ``jax.sharding.Mesh``.

The reference is strictly single-GPU (SURVEY.md §2.2: no torch.distributed /
NCCL / MPI anywhere); its only concurrency is host processes. The TPU-native
analogue is first-class here: data-parallel WGAN training (state replicated,
batches sharded, gradient/BatchNorm reductions as ICI collectives inserted by
GSPMD), spatial partitioning of the patch volume for training (dp x sp mesh:
every conv halo-exchanged over ICI, so oversized patches train across chips)
and spatially-sharded sliding-window inference (the patch grid split across
chips via shard_map, partial attenuation accumulators psum'd over ICI).
"""

from contrast_gan_3d_tpu.parallel.mesh import (  # noqa: F401
    data_mesh,
    dp_sp_mesh,
    replicate,
    shard_batch,
)
from contrast_gan_3d_tpu.parallel.inference import (  # noqa: F401
    make_sharded_volume_corrector,
)

"""Model introspection helpers.

Capability parity with reference ``contrast_gan_3D/model/utils.py:47-105``:
analytic conv output-shape tracking (used to size inference upsampling and
LayerNorm shapes) and parameter counting.
"""

from typing import List, Optional, Sequence

import jax
import numpy as np


def conv_output_shape(
    dims: Sequence[int],
    kernel_size: int,
    padding: int,
    stride: int,
    dilation: int = 1,
    transpose_output_padding: Optional[int] = None,
) -> List[int]:
    """Spatial output dims of a (transpose-)conv with torch-style arithmetic."""
    if transpose_output_padding is not None:
        f = lambda x: (x - 1) * stride - 2 * padding + dilation * (kernel_size - 1) + transpose_output_padding + 1
    else:
        f = lambda x: int((x + 2 * padding - dilation * (kernel_size - 1) - 1) / stride + 1)
    return [f(d) for d in dims]


def generator_output_shape(input_spatial: Sequence[int], n_updownsample_blocks: int = 2) -> List[int]:
    """The generator is shape-preserving when every spatial dim is divisible by
    2**n_updownsample_blocks; otherwise downsampling ceil-divides and SAME
    transpose-convs multiply back up, so output = ceil(d / 2^n) * 2^n."""
    factor = 2**n_updownsample_blocks
    return [int(np.ceil(d / factor)) * factor for d in input_spatial]


def derive_generator_arch(params) -> dict:
    """Infer a ResnetGenerator's architecture hyper-parameters from its
    parameter tree (the flax analogue of the state_dict-derivation used for
    reference ``.pt`` checkpoints, utils/torch_port): block counts from the
    ``down_i``/``resnet_i`` keys, stem width + ndim from the first conv
    kernel. Semantics the tree cannot encode (``tconv_placement``, ``norm``)
    are NOT returned — they come from the checkpoint meta sidecar."""
    if "first" not in params or "Conv_0" not in params["first"]:
        raise ValueError(
            "parameter tree is not a ResnetGenerator (no first/Conv_0)"
        )
    kernel = params["first"]["Conv_0"]["kernel"]
    return {
        "n_updownsample_blocks": sum(k.startswith("down_") for k in params),
        "n_resnet_blocks": sum(k.startswith("resnet_") for k in params),
        "init_channels_out": int(kernel.shape[-1]),
        "ndim": kernel.ndim - 2,
    }


def count_parameters(params) -> int:
    """Total trainable parameter count of a pytree."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def parameter_overview(params, prefix: str = "") -> str:
    lines = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        lines.append(f"{prefix}{name:<60} {str(leaf.shape):<20} {int(np.prod(leaf.shape))}")
    return "\n".join(lines)

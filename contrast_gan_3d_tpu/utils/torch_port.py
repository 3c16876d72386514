"""Port reference PyTorch checkpoints into this framework's flax pytrees.

The reference trains ``ResnetGenerator`` / ``PatchGANDiscriminator`` in torch
(reference ``model/generator.py:9-90``, ``model/discriminator.py:9-84``) and
checkpoints raw ``state_dict``s (``trainer/Trainer.py:310-327``). This module
maps those state_dicts onto our channels-last flax modules exactly:

- ``Conv{2,3}d.weight``  (O, I, *k)  ->  ``Conv_0/kernel``  (*k, I, O)
- ``ConvTranspose{2,3}d.weight`` (I, O, *k) -> ``ConvTranspose_0/kernel``
  (*k_flipped, I, O): torch transpose-conv is the *gradient* of a conv, i.e.
  a fractionally-strided correlation with the spatially FLIPPED kernel —
  verified numerically in ``tests/test_reference_parity.py``. IMPORTANT:
  construct the receiving model with ``tconv_placement="torch"``
  (``ResnetGenerator(tconv_placement="torch")``) — torch's transpose-conv
  window sits one voxel off flax's fast "SAME" placement (the from-scratch
  training default).
- ``BatchNorm.{weight,bias}`` -> ``BatchNorm_0/{scale,bias}`` params;
  ``running_{mean,var}`` -> batch_stats ``BatchNorm_0/{mean,var}``.

The mapping is layout-only (transpose + flip), so it can also be applied to
*gradients* to compare autodiff between frameworks. Works on plain numpy
mappings — torch is NOT imported here; call ``numpy_state_dict`` on a torch
state_dict first if needed.
"""

from typing import Dict, Mapping, Optional, Tuple

import numpy as np


def numpy_state_dict(state_dict: Mapping) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict (or any mapping of array-likes) to numpy.

    Always COPIES: ``tensor.numpy()`` aliases the tensor's storage and JAX's
    CPU backend can zero-copy numpy arrays — without the copy, later
    in-place torch updates (e.g. an optimizer step on the live module)
    would silently mutate the ported parameters."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.array(v, copy=True)
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, *k) -> (*k, I, O)."""
    nd = w.ndim - 2
    return np.ascontiguousarray(w.transpose(*range(2, 2 + nd), 1, 0))


def _tconv_kernel(w: np.ndarray) -> np.ndarray:
    """(I, O, *k) -> spatially flipped (*k, I, O)."""
    nd = w.ndim - 2
    w = w.transpose(*range(2, 2 + nd), 0, 1)
    return np.ascontiguousarray(w[(slice(None, None, -1),) * nd])


def _conv_block(
    sd: Mapping[str, np.ndarray], prefix: str, transpose: bool = False
) -> Tuple[Dict, Optional[Dict]]:
    """One reference ConvBlock (conv + optional BatchNorm) -> (params, stats)."""
    to_kernel = _tconv_kernel if transpose else _conv_kernel
    conv_name = "ConvTranspose_0" if transpose else "Conv_0"
    conv = {"kernel": to_kernel(sd[f"{prefix}.conv.weight"])}
    if f"{prefix}.conv.bias" in sd:
        conv["bias"] = sd[f"{prefix}.conv.bias"]
    params = {conv_name: conv}
    stats = None
    if f"{prefix}.normalization.weight" in sd:
        params["BatchNorm_0"] = {
            "scale": sd[f"{prefix}.normalization.weight"],
            "bias": sd[f"{prefix}.normalization.bias"],
        }
        stats = {
            "BatchNorm_0": {
                "mean": sd[f"{prefix}.normalization.running_mean"],
                "var": sd[f"{prefix}.normalization.running_var"],
            }
        }
    return params, stats


def _count_indexed(keys, prefix: str) -> int:
    """Number of distinct ``<prefix><i>.`` submodules in a state_dict."""
    n = len(prefix.split("."))
    return len({k.split(".")[n - 1] for k in keys if k.startswith(prefix)})


def _check_counts(requested: Optional[int], found: int, what: str) -> int:
    """None -> derive from the state_dict; explicit mismatch -> loud error
    (a silent mismatch would truncate the model and corrupt every output)."""
    if requested is None:
        return found
    if requested != found:
        raise ValueError(
            f"{what}={requested} does not match the state_dict (found {found})"
        )
    return requested


def generator_variables_from_torch(
    state_dict: Mapping,
    n_resnet_blocks: Optional[int] = None,
    n_updownsample_blocks: Optional[int] = None,
) -> Dict:
    """Reference ``ResnetGenerator.state_dict()`` -> flax ``{"params", ...}``
    variables for :class:`models.generator.ResnetGenerator` (same
    architecture hyper-parameters). Block counts default to what the
    state_dict actually contains; explicit counts that disagree raise."""
    sd = numpy_state_dict(state_dict)
    n_resnet_blocks = _check_counts(
        n_resnet_blocks,
        _count_indexed(sd, "model.resnet_backbone."),
        "n_resnet_blocks",
    )
    n_updownsample_blocks = _check_counts(
        n_updownsample_blocks,
        _count_indexed(sd, "model.downsampling."),
        "n_updownsample_blocks",
    )
    params: Dict = {}
    stats: Dict = {}

    def put(name: str, prefix: str, transpose: bool = False):
        p, s = _conv_block(sd, prefix, transpose)
        params[name] = p
        if s is not None:
            stats[name] = s

    put("first", "model.first")
    for i in range(n_updownsample_blocks):
        put(f"down_{i}", f"model.downsampling.{i}")
    for i in range(n_resnet_blocks):
        p0, s0 = _conv_block(sd, f"model.resnet_backbone.{i}.block0")
        p1, s1 = _conv_block(sd, f"model.resnet_backbone.{i}.block1")
        params[f"resnet_{i}"] = {"ConvBlock_0": p0, "ConvBlock_1": p1}
        if s0 is not None or s1 is not None:
            stats[f"resnet_{i}"] = {"ConvBlock_0": s0 or {}, "ConvBlock_1": s1 or {}}
    # torch upsampling.j runs wide->narrow; our names count channels down
    # (up_{n-1} is the widest) — reference generator.py:61-77 loop order
    for j in range(n_updownsample_blocks):
        put(f"up_{n_updownsample_blocks - 1 - j}", f"model.upsampling.{j}", transpose=True)
    params["last_conv"] = {
        "Conv_0": {
            "kernel": _conv_kernel(sd["model.last_conv.weight"]),
            "bias": sd["model.last_conv.bias"],
        }
    }
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def load_reference_checkpoint(
    path,
    n_resnet_blocks: Optional[int] = None,
    n_updownsample_blocks: Optional[int] = None,
    discriminator_depth: Optional[int] = None,
) -> Dict:
    """Load a reference ``<iteration>.pt`` checkpoint file (the torch.save
    dict written by reference ``trainer/Trainer.py:321-327``) into flax
    variables. Requires torch (only for deserialization). All architecture
    counts default to what the saved state_dicts contain; explicit values
    that disagree raise.

    Returns ``{"iteration", "generator": variables, "generator_arch",
    "critic": variables | None}`` — ``critic`` is None for genuine reference
    checkpoints (its save list names ``discriminator`` but the attribute is
    ``critic``, so reference runs silently never saved it).

    Use the resulting variables with models constructed with
    ``tconv_placement="torch"``.
    """
    import torch  # gated: only needed when actually importing .pt files

    ckpt = torch.load(path, map_location="cpu")
    out = {
        "iteration": int(ckpt.get("iteration", 0)),
        "generator": generator_variables_from_torch(
            ckpt["generator"], n_resnet_blocks, n_updownsample_blocks
        ),
        "critic": None,
    }
    gsd = ckpt["generator"]
    out["generator_arch"] = {
        "n_resnet_blocks": _count_indexed(gsd, "model.resnet_backbone."),
        "n_updownsample_blocks": _count_indexed(gsd, "model.downsampling."),
        "init_channels_out": int(gsd["model.first.conv.weight"].shape[0]),
        # 5-D conv kernels = 3D model, 4-D = the is_2D variant
        "ndim": len(gsd["model.first.conv.weight"].shape) - 2,
    }
    # our exports store the critic under "critic_state_dict": the reference
    # Trainer's load_checkpoint does getattr(self, k).load_state_dict(v) for
    # every non-None model_torch_attrs key, and it has no `discriminator`
    # attribute (the module is `critic`, Trainer.py:89 vs :316) — a non-None
    # "discriminator" entry would crash a reference resume. Unknown keys are
    # setattr'd and harmless.
    critic_sd = (
        ckpt.get("critic_state_dict") or ckpt.get("discriminator") or ckpt.get("critic")
    )
    if critic_sd is not None:
        out["critic"] = critic_variables_from_torch(critic_sd, discriminator_depth)
    return out


# ---------------------------------------------------------------------------
# The inverse direction: flax variables -> reference torch state_dicts.
# Completes bidirectional migration — checkpoints trained HERE can be loaded
# by the reference's torch models/eval stack (reference
# eval/CCTAContrastCorrector.py:55-56 reads ckpt["generator"]).
#
# Exactness caveat (mirror of the import note above): the exported
# transpose-conv weights reproduce torch ONLY for generators trained with
# ``tconv_placement="torch"``; the from-scratch training default ("same",
# faster on TPU) places the tconv window one voxel off torch's, so an
# exported "same" checkpoint drives the torch model with a one-voxel output
# shift (weights themselves are unchanged). Round-trip + torch-forward
# equivalence is tested in tests/test_torch_export.py.


def _conv_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """(*k, I, O) -> (O, I, *k)."""
    nd = k.ndim - 2
    return np.ascontiguousarray(k.transpose(nd + 1, nd, *range(nd)))


def _tconv_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """spatially flipped (*k, I, O) -> (I, O, *k)."""
    nd = k.ndim - 2
    k = k[(slice(None, None, -1),) * nd]
    return np.ascontiguousarray(k.transpose(nd, nd + 1, *range(nd)))


def _conv_block_to_torch(
    out: Dict[str, np.ndarray],
    prefix: str,
    params: Mapping,
    stats: Optional[Mapping],
    transpose: bool = False,
) -> None:
    """One of our ConvBlocks -> reference ``<prefix>.conv`` /
    ``<prefix>.normalization`` state_dict entries."""
    conv_name = "ConvTranspose_0" if transpose else "Conv_0"
    unknown = set(params) - {conv_name, "BatchNorm_0"}
    if unknown:
        raise NotImplementedError(
            f"torch export supports batch/none norms only; found {sorted(unknown)} "
            f"under '{prefix}' (the reference LayerNorm variant is export-unsupported)"
        )
    conv = params[conv_name]
    to_torch = _tconv_kernel_to_torch if transpose else _conv_kernel_to_torch
    out[f"{prefix}.conv.weight"] = to_torch(np.asarray(conv["kernel"], np.float32))
    if "bias" in conv:
        out[f"{prefix}.conv.bias"] = np.array(conv["bias"], np.float32)
    if "BatchNorm_0" in params:
        bn = params["BatchNorm_0"]
        out[f"{prefix}.normalization.weight"] = np.array(bn["scale"], np.float32)
        out[f"{prefix}.normalization.bias"] = np.array(bn["bias"], np.float32)
        s = (stats or {}).get("BatchNorm_0") or {}
        out[f"{prefix}.normalization.running_mean"] = np.array(
            s.get("mean", np.zeros_like(bn["scale"])), np.float32
        )
        out[f"{prefix}.normalization.running_var"] = np.array(
            s.get("var", np.ones_like(bn["scale"])), np.float32
        )
        # torch BatchNorm state_dicts carry this counter; required for
        # load_state_dict(strict=True)
        out[f"{prefix}.normalization.num_batches_tracked"] = np.asarray(0, np.int64)


def generator_state_dict_from_variables(
    variables: Mapping,
    n_resnet_blocks: Optional[int] = None,
    n_updownsample_blocks: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Our flax generator variables -> a reference
    ``ResnetGenerator.state_dict()`` (numpy values; wrap with torch.as_tensor
    or use :func:`save_reference_checkpoint`). Block counts default to the
    variables' own ``resnet_*``/``up_*`` counts; explicit mismatch raises
    (a silent mismatch would truncate the exported model)."""
    params = variables["params"]
    stats = variables.get("batch_stats") or {}
    n_resnet_blocks = _check_counts(
        n_resnet_blocks,
        len([k for k in params if k.startswith("resnet_")]),
        "n_resnet_blocks",
    )
    n_updownsample_blocks = _check_counts(
        n_updownsample_blocks,
        len([k for k in params if k.startswith("down_")]),
        "n_updownsample_blocks",
    )
    sd: Dict[str, np.ndarray] = {}
    _conv_block_to_torch(sd, "model.first", params["first"], stats.get("first"))
    for i in range(n_updownsample_blocks):
        _conv_block_to_torch(
            sd, f"model.downsampling.{i}", params[f"down_{i}"], stats.get(f"down_{i}")
        )
    for i in range(n_resnet_blocks):
        p = params[f"resnet_{i}"]
        s = stats.get(f"resnet_{i}") or {}
        _conv_block_to_torch(
            sd, f"model.resnet_backbone.{i}.block0", p["ConvBlock_0"], s.get("ConvBlock_0")
        )
        _conv_block_to_torch(
            sd, f"model.resnet_backbone.{i}.block1", p["ConvBlock_1"], s.get("ConvBlock_1")
        )
    # reverse of the import: torch upsampling.j runs wide->narrow, our up_{i}
    # counts channels down (reference generator.py:61-77 loop order)
    for j in range(n_updownsample_blocks):
        name = f"up_{n_updownsample_blocks - 1 - j}"
        _conv_block_to_torch(
            sd, f"model.upsampling.{j}", params[name], stats.get(name), transpose=True
        )
    sd["model.last_conv.weight"] = _conv_kernel_to_torch(
        np.asarray(params["last_conv"]["Conv_0"]["kernel"], np.float32)
    )
    sd["model.last_conv.bias"] = np.array(
        params["last_conv"]["Conv_0"]["bias"], np.float32
    )
    return sd


def critic_state_dict_from_variables(
    variables: Mapping, discriminator_depth: Optional[int] = None
) -> Dict[str, np.ndarray]:
    """Our flax critic variables -> a reference
    ``PatchGANDiscriminator.state_dict()`` (numpy values). The depth
    defaults to the variables' ``middle_*`` count; explicit mismatch raises
    (a silent mismatch would truncate the exported model)."""
    params = variables["params"]
    stats = variables.get("batch_stats") or {}
    discriminator_depth = _check_counts(
        discriminator_depth,
        len([k for k in params if k.startswith("middle_")]),
        "discriminator_depth",
    )
    sd: Dict[str, np.ndarray] = {}
    _conv_block_to_torch(sd, "model.first", params["first"], stats.get("first"))
    for n in range(discriminator_depth):
        _conv_block_to_torch(
            sd, f"model.middle.{n}", params[f"middle_{n}"], stats.get(f"middle_{n}")
        )
    sd["model.last.weight"] = _conv_kernel_to_torch(
        np.asarray(params["last"]["Conv_0"]["kernel"], np.float32)
    )
    sd["model.last.bias"] = np.array(params["last"]["Conv_0"]["bias"], np.float32)
    return sd


def save_reference_checkpoint(
    path,
    generator_variables: Mapping,
    critic_variables: Optional[Mapping] = None,
    iteration: int = 0,
    n_resnet_blocks: Optional[int] = None,
    n_updownsample_blocks: Optional[int] = None,
    discriminator_depth: Optional[int] = None,
) -> None:
    """Write a reference-format ``<iteration>.pt`` torch checkpoint (the
    dict layout of reference ``trainer/Trainer.py:321-327``) from our flax
    variables, so reference tooling can consume checkpoints trained here.
    Architecture counts are derived from the variables (explicit mismatch
    raises). Requires torch (serialization only).

    Unlike genuine reference checkpoints, the critic IS saved when provided
    — under ``critic_state_dict``, NOT ``discriminator``: the reference
    Trainer's ``load_checkpoint`` calls ``getattr(self, k).load_state_dict``
    for every non-None ``model_torch_attrs`` entry, and it has no
    ``discriminator`` attribute (the module is ``critic``, Trainer.py:89),
    so a non-None ``discriminator`` key would crash a reference resume.
    ``discriminator`` stays None exactly like genuine files; unknown keys
    are setattr'd by the reference loader and harmless. Our
    :func:`load_reference_checkpoint` reads ``critic_state_dict`` back."""
    import torch  # gated: only needed when actually writing .pt files

    def to_torch(sd):
        return {k: torch.as_tensor(v) for k, v in sd.items()}

    ckpt = {
        "iteration": int(iteration),
        "generator": to_torch(
            generator_state_dict_from_variables(
                generator_variables, n_resnet_blocks, n_updownsample_blocks
            )
        ),
        "discriminator": None,
    }
    if critic_variables is not None:
        ckpt["critic_state_dict"] = to_torch(
            critic_state_dict_from_variables(critic_variables, discriminator_depth)
        )
    torch.save(ckpt, path)


def critic_variables_from_torch(
    state_dict: Mapping, discriminator_depth: Optional[int] = None
) -> Dict:
    """Reference ``PatchGANDiscriminator.state_dict()`` -> flax variables for
    :class:`models.discriminator.PatchGANDiscriminator`. The depth defaults
    to the state_dict's ``model.middle.*`` count; explicit mismatch raises."""
    sd = numpy_state_dict(state_dict)
    discriminator_depth = _check_counts(
        discriminator_depth, _count_indexed(sd, "model.middle."), "discriminator_depth"
    )
    params: Dict = {}
    stats: Dict = {}
    p, _ = _conv_block(sd, "model.first")
    params["first"] = p
    for n in range(discriminator_depth):
        p, s = _conv_block(sd, f"model.middle.{n}")
        params[f"middle_{n}"] = p
        if s is not None:
            stats[f"middle_{n}"] = s
    params["last"] = {
        "Conv_0": {
            "kernel": _conv_kernel(sd["model.last.weight"]),
            "bias": sd["model.last.bias"],
        }
    }
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out

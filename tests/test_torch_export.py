"""Bidirectional checkpoint migration: flax -> reference torch export.

Complements tests/test_reference_parity.py (which proves the torch->flax
import direction): exported state_dicts must load into the ACTUAL reference
torch modules with ``strict=True`` and reproduce our flax forwards, and a
``save_reference_checkpoint`` .pt must round-trip through our own importer
and the reference-format corrector entry point.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.utils.torch_port import (
    critic_state_dict_from_variables,
    critic_variables_from_torch,
    generator_state_dict_from_variables,
    generator_variables_from_torch,
    load_reference_checkpoint,
    numpy_state_dict,
    save_reference_checkpoint,
)

from tests.test_reference_parity import fill_deterministic, load_reference_models
from tests.test_reference_parity_train import ref_env  # noqa: F401 (fixture)

GEN_CFG = dict(n_resnet_blocks=2, n_updownsample_blocks=1, init_channels_out=8)
CRITIC_CFG = dict(init_channels_out=4, discriminator_depth=2)


@pytest.fixture(scope="module")
def ref():
    return load_reference_models()


def _gen_arch(cfg):
    return {k: cfg[k] for k in ("n_resnet_blocks", "n_updownsample_blocks")}


def test_generator_export_inverts_import(ref):
    """torch -> flax -> torch is the identity on every state_dict tensor."""
    tg = ref["generator"].ResnetGenerator(**GEN_CFG)
    fill_deterministic(tg, seed=10)
    sd = numpy_state_dict(tg.state_dict())
    variables = generator_variables_from_torch(sd, **_gen_arch(GEN_CFG))
    back = generator_state_dict_from_variables(variables, **_gen_arch(GEN_CFG))
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)
    assert set(k for k in sd if not k.endswith("num_batches_tracked")) <= set(back)


def test_critic_export_inverts_import(ref):
    tc = ref["discriminator"].PatchGANDiscriminator(
        1, CRITIC_CFG["init_channels_out"], CRITIC_CFG["discriminator_depth"],
        negative_slope=0.2,
    )
    fill_deterministic(tc, seed=11)
    sd = numpy_state_dict(tc.state_dict())
    variables = critic_variables_from_torch(sd, CRITIC_CFG["discriminator_depth"])
    back = critic_state_dict_from_variables(variables, CRITIC_CFG["discriminator_depth"])
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_flax_native_generator_drives_torch_model(ref):
    """A generator initialized (trained) HERE, exported, must load
    strict=True into the reference torch model and agree on the forward."""
    gen = ResnetGenerator(tconv_placement="torch", **GEN_CFG)
    x = np.random.default_rng(12).normal(0, 0.5, (2, 16, 16, 16, 1)).astype(np.float32)
    variables = gen.init(jax.random.key(12), jnp.asarray(x), train=False)
    want = np.asarray(gen.apply(variables, jnp.asarray(x), train=False))

    sd = generator_state_dict_from_variables(
        jax.tree.map(np.asarray, dict(variables)), **_gen_arch(GEN_CFG)
    )
    tg = ref["generator"].ResnetGenerator(**GEN_CFG)
    tg.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()}, strict=True)
    tg.eval()
    with torch.no_grad():
        got = tg(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    np.testing.assert_allclose(got.transpose(0, 2, 3, 4, 1), want, atol=1e-4, rtol=1e-4)


def test_flax_native_critic_drives_torch_model(ref):
    critic = PatchGANDiscriminator(**CRITIC_CFG)
    x = np.random.default_rng(13).normal(0, 0.5, (2, 16, 16, 16, 1)).astype(np.float32)
    variables = critic.init(jax.random.key(13), jnp.asarray(x), train=False)
    want = np.asarray(critic.apply(variables, jnp.asarray(x), train=False))

    sd = critic_state_dict_from_variables(
        jax.tree.map(np.asarray, dict(variables)), CRITIC_CFG["discriminator_depth"]
    )
    tc = ref["discriminator"].PatchGANDiscriminator(
        1, CRITIC_CFG["init_channels_out"], CRITIC_CFG["discriminator_depth"],
        negative_slope=0.2,
    )
    tc.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()}, strict=True)
    tc.eval()
    with torch.no_grad():
        got = tc(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    np.testing.assert_allclose(got.transpose(0, 2, 3, 4, 1), want, atol=1e-4, rtol=1e-4)


def test_export_torch_checkpoint_script(ref, tmp_path):
    """scripts/export_torch_checkpoint.py: native msgpack checkpoint -> a
    reference .pt whose state_dicts load strict=True into the reference
    torch models."""
    import runpy
    import sys as _sys
    from pathlib import Path

    from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import init_state

    gen = ResnetGenerator(tconv_placement="torch", **GEN_CFG)
    critic = PatchGANDiscriminator(**CRITIC_CFG)
    tx = make_optimizer()
    state = init_state(gen, critic, tx, tx, jax.random.key(20), (16, 16, 16))
    state = state.replace(step=state.step + 777)
    ckpt_lib.save_checkpoint(state, tmp_path / "ck", step=777)

    script = Path(__file__).parent.parent / "scripts" / "export_torch_checkpoint.py"
    pt = tmp_path / "out" / "777.pt"
    argv = _sys.argv
    _sys.argv = [str(script), str(tmp_path / "ck"), str(pt),
                 "--n-resnet-blocks", str(GEN_CFG["n_resnet_blocks"]),
                 "--n-updownsample-blocks", str(GEN_CFG["n_updownsample_blocks"]),
                 "--discriminator-depth", str(CRITIC_CFG["discriminator_depth"])]
    try:
        runpy.run_path(str(script), run_name="__main__")
    finally:
        _sys.argv = argv

    ckpt = torch.load(pt)
    assert ckpt["iteration"] == 777
    # 'discriminator' must stay None: the reference Trainer's load_checkpoint
    # getattr's every non-None model_torch_attrs key and has no
    # `discriminator` attribute — the critic travels under critic_state_dict
    assert ckpt["discriminator"] is None
    tg = ref["generator"].ResnetGenerator(**GEN_CFG)
    tg.load_state_dict(ckpt["generator"], strict=True)
    tc = ref["discriminator"].PatchGANDiscriminator(
        1, CRITIC_CFG["init_channels_out"], CRITIC_CFG["discriminator_depth"],
        negative_slope=0.2,
    )
    tc.load_state_dict(ckpt["critic_state_dict"], strict=True)


def test_reference_trainer_resumes_from_export(ref_env, tmp_path):
    """The ACTUAL reference Trainer.load_checkpoint must accept an exported
    .pt: its loader getattr's every non-None model_torch_attrs key (and has
    no `discriminator` attribute), so the critic must travel under a
    tolerated key and the generator weights must land in the live module."""
    from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler
    from tests.test_reference_parity_train import _make_reference_trainer

    mods = ref_env
    gen = ResnetGenerator(tconv_placement="torch", **GEN_CFG)
    critic = PatchGANDiscriminator(**CRITIC_CFG)
    gv = jax.tree.map(
        np.asarray,
        dict(gen.init(jax.random.key(21), jnp.zeros((1, 16, 16, 16, 1)), train=False)),
    )
    cv = jax.tree.map(
        np.asarray,
        dict(critic.init(jax.random.key(22), jnp.zeros((1, 16, 16, 16, 1)), train=False)),
    )
    pt = tmp_path / "4321.pt"
    save_reference_checkpoint(pt, gv, cv, iteration=4321)

    gen_t = mods["generator"].ResnetGenerator(**GEN_CFG)
    crit_t = mods["discriminator"].PatchGANDiscriminator(
        1, CRITIC_CFG["init_channels_out"], CRITIC_CFG["discriminator_depth"],
        negative_slope=0.2,
    )
    tr = _make_reference_trainer(mods, gen_t, crit_t, FactorZeroCenterScaler())
    tr.load_checkpoint(pt)  # the real loader, no crash
    assert tr.iteration == 4321
    want = generator_state_dict_from_variables(gv)
    got = {k: v.detach().numpy() for k, v in gen_t.state_dict().items()}
    for k, v in want.items():
        np.testing.assert_array_equal(got[k], v, err_msg=k)


def test_explicit_count_mismatch_raises(ref):
    """Silent truncation guard: explicit architecture counts that disagree
    with the state_dict / variables raise instead of dropping blocks."""
    tg = ref["generator"].ResnetGenerator(**GEN_CFG)
    sd = numpy_state_dict(tg.state_dict())
    with pytest.raises(ValueError, match="n_resnet_blocks"):
        generator_variables_from_torch(sd, n_resnet_blocks=GEN_CFG["n_resnet_blocks"] + 2)
    variables = generator_variables_from_torch(sd)
    with pytest.raises(ValueError, match="n_updownsample_blocks"):
        generator_state_dict_from_variables(variables, n_updownsample_blocks=5)
    tc = ref["discriminator"].PatchGANDiscriminator(
        1, CRITIC_CFG["init_channels_out"], CRITIC_CFG["discriminator_depth"],
        negative_slope=0.2,
    )
    with pytest.raises(ValueError, match="discriminator_depth"):
        critic_variables_from_torch(numpy_state_dict(tc.state_dict()), 3)


def test_save_reference_checkpoint_roundtrip(tmp_path):
    """Exported .pt files feed our own reference-checkpoint import path AND
    carry the critic (unlike genuine reference checkpoints, Trainer.py
    :312-319 bug)."""
    gen = ResnetGenerator(tconv_placement="torch", **GEN_CFG)
    critic = PatchGANDiscriminator(**CRITIC_CFG)
    gv = jax.tree.map(
        np.asarray,
        dict(gen.init(jax.random.key(14), jnp.zeros((1, 16, 16, 16, 1)), train=False)),
    )
    cv = jax.tree.map(
        np.asarray,
        dict(critic.init(jax.random.key(15), jnp.zeros((1, 16, 16, 16, 1)), train=False)),
    )
    pt = tmp_path / "9000.pt"
    save_reference_checkpoint(
        pt, gv, cv, iteration=9000, **_gen_arch(GEN_CFG),
        discriminator_depth=CRITIC_CFG["discriminator_depth"],
    )
    loaded = load_reference_checkpoint(
        pt, **_gen_arch(GEN_CFG),
        discriminator_depth=CRITIC_CFG["discriminator_depth"],
    )
    assert loaded["iteration"] == 9000
    assert loaded["critic"] is not None
    for side, orig in (("generator", gv), ("critic", cv)):
        got_leaves = jax.tree_util.tree_leaves_with_path(loaded[side])
        want = {
            jax.tree_util.keystr(p): l
            for p, l in jax.tree_util.tree_leaves_with_path(orig)
        }
        assert len(got_leaves) == len(want)
        for p, leaf in got_leaves:
            np.testing.assert_allclose(
                leaf, want[jax.tree_util.keystr(p)], atol=1e-6, err_msg=f"{side}{p}"
            )

    # the reference-format corrector entry point consumes our exported file
    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector

    corr = CCTAContrastCorrector.from_reference_checkpoint(
        pt, **_gen_arch(GEN_CFG), init_channels_out=GEN_CFG["init_channels_out"],
        inference_patch_size=(16, 16, 16), batch_size=2,
    )
    vol = np.random.default_rng(16).integers(-1024, 1500, (20, 18, 16)).astype(np.int16)
    out = np.asarray(corr(vol))
    assert out.shape == vol.shape and np.isfinite(out).all()

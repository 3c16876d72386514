"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4:
multi-chip paths runnable anywhere via device-count override)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler
from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.parallel import (
    data_mesh,
    dp_sp_mesh,
    make_sharded_volume_corrector,
)
from contrast_gan_3d_tpu.parallel.mesh import pad_batch_to_multiple, put_batch, put_replicated
from contrast_gan_3d_tpu.trainer.optim import make_optimizer
from contrast_gan_3d_tpu.trainer.steps import StepConfig, build_train_steps, init_state

PATCH = (16, 16, 16)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the multi-device CPU mesh"
)


def _tiny_models():
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    return gen, critic


def _step_cfg(mode: str) -> StepConfig:
    """Deterministic StepConfig for the given critic mode. GP (weight_clip
    None) exercises the penalty's nested double-backward through the
    GSPMD-compiled critic — the exact path VERDICT r4 flagged as asserted
    but never executed under a mesh. The interpolation eps draws from the
    replicated state rng, so mesh and single-device programs see identical
    penalties."""
    return StepConfig(
        augment=None, weight_clip=None if mode == "gp" else 0.01
    )


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["wc", "gp"])
@pytest.mark.parametrize("layout", ["direct", "packed"])
def test_data_parallel_step_matches_single_device(rng, layout, mode):
    """The DP-compiled combined step must produce the same new params as the
    single-device program on the same global batch (GSPMD correctness) — in
    BOTH critic modes: weight clipping and gradient penalty (the GP
    double-backward turns into psum'd collectives under the mesh)."""
    gen, critic = _tiny_models()
    gen = gen.clone(layout=layout)
    tx = make_optimizer(lr=1e-3)
    cfg = _step_cfg(mode)

    opt_b = jnp.asarray(rng.integers(-500, 500, (8, *PATCH), dtype=np.int16))
    subopt_b = jnp.asarray(rng.integers(-500, 500, (8, *PATCH), dtype=np.int16))
    mask = jnp.asarray((rng.random((8, *PATCH)) < 0.01).astype(np.int16))

    state1 = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    combined1 = build_train_steps(gen, critic, tx, tx, cfg).combined_step
    state1, m1 = combined1(state1, opt_b, subopt_b, mask)

    mesh = data_mesh()
    state2 = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    state2 = put_replicated(state2, mesh)
    combined2 = build_train_steps(gen, critic, tx, tx, cfg, mesh=mesh).combined_step
    state2, m2 = combined2(
        state2, put_batch(opt_b, mesh), put_batch(subopt_b, mesh), put_batch(mask, mesh)
    )

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4, atol=1e-5)
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(state1.gen_params),
        jax.tree_util.tree_leaves(state2.gen_params),
    ):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-3, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["wc", "gp"])
@pytest.mark.parametrize("layout", ["direct", "packed"])
def test_dp_sp_step_matches_single_device(rng, layout, mode):
    """Spatial partitioning (dp x sp mesh): the same combined step compiled
    with the first patch dim sharded over the ``space`` axis — GSPMD inserts
    conv halo exchanges — must reproduce the single-device result. This is
    the training-side scaling axis for patches that overflow one chip's HBM
    (SURVEY.md §2.3: volume size is this model family's long-context axis).
    GP mode additionally proves the penalty's grad-of-grad through the
    halo-exchanged convs — the program PERF.md names as the escape hatch
    for the single-chip GP HBM ceiling."""
    patch = (32, 16, 16)  # 32 / sp=4 -> 8-wide shards (>= the 7^3 stem halo)
    gen, critic = _tiny_models()
    gen = gen.clone(layout=layout)
    tx = make_optimizer(lr=1e-3)
    cfg = _step_cfg(mode)

    opt_b = jnp.asarray(rng.integers(-500, 500, (4, *patch), dtype=np.int16))
    subopt_b = jnp.asarray(rng.integers(-500, 500, (4, *patch), dtype=np.int16))
    mask = jnp.asarray((rng.random((4, *patch)) < 0.01).astype(np.int16))

    state1 = init_state(gen, critic, tx, tx, jax.random.key(0), patch)
    combined1 = build_train_steps(gen, critic, tx, tx, cfg).combined_step
    state1, m1 = combined1(state1, opt_b, subopt_b, mask)

    mesh = dp_sp_mesh(2, 4)
    state2 = init_state(gen, critic, tx, tx, jax.random.key(0), patch)
    state2 = put_replicated(state2, mesh)
    combined2 = build_train_steps(gen, critic, tx, tx, cfg, mesh=mesh).combined_step
    state2, m2 = combined2(
        state2, put_batch(opt_b, mesh), put_batch(subopt_b, mesh), put_batch(mask, mesh)
    )

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4, atol=1e-5)
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(state1.gen_params),
        jax.tree_util.tree_leaves(state2.gen_params),
    ):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-3, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mesh_kind", ["dp", "dp_sp"])
def test_gp_cycle_under_mesh_matches_single_device(rng, mesh_kind):
    """The FUSED schedule cycle in WGAN-GP mode under the mesh (the
    production-default dispatch shape x the GP critic mode): a full
    4-critic+1-combined cycle compiled over dp and dp x sp meshes must
    reproduce the single-device cycle's post-cycle params and metrics.
    Every critic iteration runs the GP double-backward; under dp_sp each
    of those nests inside halo-exchanged convs."""
    from contrast_gan_3d_tpu.trainer.steps import (
        build_cycle_step, schedule_branches,
    )

    patch = (32, 16, 16) if mesh_kind == "dp_sp" else PATCH
    gen, critic = _tiny_models()
    tx = make_optimizer(lr=1e-3)
    cfg = _step_cfg("gp")
    pattern = schedule_branches(1, 5, 0, 5)
    k, b = len(pattern), 8 if mesh_kind == "dp" else 4

    opt_c = jnp.asarray(rng.integers(-500, 500, (k, b, *patch), dtype=np.int16))
    sub_c = jnp.asarray(rng.integers(-500, 500, (k, b, *patch), dtype=np.int16))
    msk_c = jnp.asarray((rng.random((k, b, *patch)) < 0.01).astype(np.int16))

    state1 = init_state(gen, critic, tx, tx, jax.random.key(0), patch)
    steps1 = build_train_steps(gen, critic, tx, tx, cfg)
    cycle1 = build_cycle_step(steps1, pattern)
    state1, m1 = cycle1(state1, opt_c, sub_c, msk_c)

    mesh = data_mesh() if mesh_kind == "dp" else dp_sp_mesh(2, 4)
    state2 = put_replicated(
        init_state(gen, critic, tx, tx, jax.random.key(0), patch), mesh
    )
    steps2 = build_train_steps(gen, critic, tx, tx, cfg, mesh=mesh)
    cycle2 = build_cycle_step(steps2, pattern, mesh=mesh)
    # (K, B, ...) cycle batches place via the cycle jit's own 'c'
    # in_shardings — put_batch would wrongly shard the CYCLE axis
    state2, m2 = cycle2(state2, opt_c, sub_c, msk_c)

    assert int(jax.device_get(state2.step)) == k
    for key in m1:
        np.testing.assert_allclose(
            float(m1[key]), float(m2[key]), rtol=5e-4, atol=1e-4
        )
    # five GP iterations of drift compound — the same 5e-4-scale fusion
    # reassociation tolerance as tests/test_cycle.py's single-device GP row
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(state1.gen_params)
        + jax.tree_util.tree_leaves(state1.critic_params),
        jax.tree_util.tree_leaves(state2.gen_params)
        + jax.tree_util.tree_leaves(state2.critic_params),
    ):
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=5e-3, atol=5e-5
        )


@pytest.mark.slow
def test_dp_sp_val_step_matches_single_device(rng):
    """Val steps under a dp x sp mesh: batch pads over ``data`` only, (B,)
    weights shard rank-aware, losses equal the single-device values."""
    from contrast_gan_3d_tpu.trainer.steps import build_val_steps

    patch = (32, 16, 16)
    gen, critic = _tiny_models()
    tx = make_optimizer(lr=1e-3)
    cfg = StepConfig(augment=None)
    batch = jnp.asarray(rng.integers(-500, 500, (4, *patch), dtype=np.int16))

    state = init_state(gen, critic, tx, tx, jax.random.key(0), patch)
    vo1, vs1 = build_val_steps(gen, critic, cfg)
    want_opt = float(vo1(state, batch, jnp.ones((4,), jnp.float32)))
    want_sub = vs1(state, batch, jnp.ones((4,), jnp.float32))

    mesh = dp_sp_mesh(2, 4)
    state_m = put_replicated(state, mesh)
    vo2, vs2 = build_val_steps(gen, critic, cfg, mesh=mesh)
    w = put_batch(np.ones((4,), np.float32), mesh)
    got_opt = float(vo2(state_m, put_batch(batch, mesh), w))
    got_sub = vs2(state_m, put_batch(batch, mesh), w)

    np.testing.assert_allclose(want_opt, got_opt, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(want_sub[0]), float(got_sub[0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(want_sub[1]), float(got_sub[1]), rtol=1e-5, atol=1e-6)


def test_trainer_rejects_nondivisible_spatial_dim():
    """Under a dp x sp mesh the first patch dim must divide the space axis."""
    from contrast_gan_3d_tpu.alias import ScanType
    from contrast_gan_3d_tpu.trainer.trainer import Trainer, TrainerConfig

    mesh = dp_sp_mesh(2, 4)
    gen, critic = _tiny_models()
    tx = make_optimizer(lr=1e-3)
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=None), TrainerConfig(),
        jax.random.key(0), (10, 8, 8), mesh=mesh,
    )
    batch = lambda b: {
        "data": np.zeros((b, 10, 8, 8), np.int16),
        "seg": np.zeros((b, 10, 8, 8), np.int16),
    }
    patches = {ScanType.OPT.value: batch(2), ScanType.LOW.value: batch(1),
               ScanType.HIGH.value: batch(1)}
    with pytest.raises(ValueError, match="spatial-partitioning"):
        trainer.train_step(patches, 0)


@pytest.mark.slow
def test_sharded_corrector_matches_single_chip(rng):
    """Patch-grid sharding must be numerically equivalent to the single-chip
    sliding window (identity + real generator)."""
    from contrast_gan_3d_tpu.ops.sliding_window import make_volume_corrector

    gen, _ = _tiny_models()
    variables = gen.init(jax.random.key(1), jnp.zeros((1, *PATCH, 1)), train=False)
    apply_fn = lambda x: gen.apply(variables, x, train=False)

    vol = jnp.asarray(rng.integers(-1024, 1500, (24, 20, 18), dtype=np.int16))
    single = make_volume_corrector(apply_fn, patch_size=PATCH, batch_size=2)
    sharded = make_sharded_volume_corrector(
        apply_fn, data_mesh(), patch_size=PATCH, batch_size=2
    )
    np.testing.assert_allclose(
        np.asarray(single(vol)), np.asarray(sharded(vol)), rtol=1e-4, atol=5e-2
    )


def test_pad_batch_to_multiple():
    x = np.arange(10).reshape(5, 2)
    out = pad_batch_to_multiple(x, 4)
    assert out.shape == (8, 2)
    np.testing.assert_array_equal(out[5:], np.repeat(x[:1], 3, axis=0))
    assert pad_batch_to_multiple(x, 5) is x


def test_corrector_shard_over_matches_unsharded(rng):
    """CCTAContrastCorrector.shard_over re-targets the (packed-default)
    corrector to the mesh with unchanged numerics — the one-call path
    scripts/correct_scans.py --sharded uses."""
    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector

    gen, _ = _tiny_models()
    variables = gen.init(jax.random.key(3), jnp.zeros((1, *PATCH, 1)), train=False)
    corrector = CCTAContrastCorrector(
        gen, variables["params"], variables.get("batch_stats"),
        inference_patch_size=PATCH, batch_size=2,
    )
    assert corrector._packed  # the production default layout carries over
    vol = jnp.asarray(rng.integers(-1024, 1500, (24, 20, 16), dtype=np.int16))
    want = np.asarray(corrector(vol))
    assert corrector.shard_over(data_mesh()) is corrector
    np.testing.assert_allclose(
        want, np.asarray(corrector(vol)), rtol=1e-4, atol=5e-2
    )


def test_sharded_packed_corrector_matches_direct(rng):
    """packed_io sharded correction == the direct sharded path (block-space
    gathers, f4 accumulator, packed psum_scatter slabs)."""
    gen, _ = _tiny_models()
    variables = gen.init(jax.random.key(2), jnp.zeros((1, *PATCH, 1)), train=False)
    apply_fn = lambda x: gen.apply(variables, x, train=False)
    gen_p = gen.clone(layout="packed", packed_input=True, packed_output=True)
    apply_p = lambda x: gen_p.apply(variables, x, train=False)

    # block-aligned dims -> identical patch grids (unaligned dims edge-pad
    # to blocks first, which legitimately shifts the Gaussian blend)
    vol = jnp.asarray(rng.integers(-1024, 1500, (24, 20, 16), dtype=np.int16))
    direct = make_sharded_volume_corrector(
        apply_fn, data_mesh(), patch_size=PATCH, batch_size=2
    )
    packed = make_sharded_volume_corrector(
        apply_p, data_mesh(), patch_size=PATCH, batch_size=2, packed_io=True
    )
    np.testing.assert_allclose(
        np.asarray(direct(vol)), np.asarray(packed(vol)), rtol=1e-4, atol=5e-2
    )
    # unaligned dims still run + return finite output
    vol2 = jnp.asarray(rng.integers(-1024, 1500, (24, 20, 18), dtype=np.int16))
    out2 = np.asarray(packed(vol2))
    assert out2.shape == (24, 20, 18) and np.isfinite(out2).all()


def test_trainer_rejects_nondivisible_train_batch(rng):
    """Train batches that do not divide the mesh must raise (padding them
    with repeated samples would bias loss means and BatchNorm statistics;
    validation pads exactly instead via masked reductions)."""
    import pytest

    from contrast_gan_3d_tpu.alias import ScanType
    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import StepConfig
    from contrast_gan_3d_tpu.trainer.trainer import Trainer, TrainerConfig

    mesh = data_mesh()  # 8 virtual devices
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    trainer = Trainer(
        gen, critic, tx, tx, StepConfig(augment=None), TrainerConfig(),
        jax.random.key(0), (8, 8, 8), mesh=mesh,
    )
    batch = lambda b: {
        "data": np.zeros((b, 8, 8, 8), np.int16),
        "seg": np.zeros((b, 8, 8, 8), np.int16),
    }
    patches = {ScanType.OPT.value: batch(6), ScanType.LOW.value: batch(3),
               ScanType.HIGH.value: batch(3)}
    with pytest.raises(ValueError, match="divisible by the mesh"):
        trainer.train_step(patches, 0)


def test_data_mesh_refuses_overrequest():
    import pytest

    from contrast_gan_3d_tpu.parallel.mesh import data_mesh

    with pytest.raises(ValueError, match="only"):
        data_mesh(n_devices=1000)


def test_put_batch_mixed_rank_tree():
    """put_batch shards rank-aware per leaf — rank-0 leaves replicate even on
    the 1-D mesh fast path."""
    import numpy as np

    from contrast_gan_3d_tpu.parallel.mesh import data_mesh, put_batch

    mesh = data_mesh(2)
    tree = {"data": np.ones((4, 3), np.float32), "count": np.float32(3.0)}
    out = put_batch(tree, mesh)
    assert out["data"].shape == (4, 3)
    assert float(out["count"]) == 3.0

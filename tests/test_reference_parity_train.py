"""Live-reference TRAIN-STEP parity.

Executes the ACTUAL reference ``Trainer.train_critic`` / ``train_generator``
methods (trainer/Trainer.py:108-161 — the exact ``train_step`` math at
iteration 0, minus its logging side effects) with the reference models,
losses, torch Adam + MultiStepLR and weight clipping, on identical weights
and batches, and asserts our fused ``combined_step`` / ``critic_step``
produce the same updated parameters, BatchNorm statistics and loss scalars.

This closes the loop on update semantics the per-component parity tests
can't see: optimizer math (incl. torch's eps conventions), scheduler
stepping, the critic-then-generator ordering against the stale ``opt_hat``,
weight-clip placement after the optimizer step, and BatchNorm train-mode
stat threading (critic stats update on real THEN fake; the reference's
third critic forward inside train_generator also touches running stats —
a documented divergence we do not replicate, so critic stats are compared
at the post-critic-update snapshot).

Writing this test surfaced (and fixed) three real semantic gaps: optax
RMSprop's eps-inside-sqrt default (torch puts it outside —
``make_optimizer`` now passes ``eps_in_sqrt=False``), the flax-convention
BIASED running-variance EMA (torch uses the unbiased n/(n-1) batch variance
— ``models/norm.BatchNorm`` now matches torch), and ``numpy_state_dict``
returning tensor-aliasing views that later in-place torch updates mutated.

Post-update parameters are compared with a two-tier bound: Adam's t=1
update is sign-like, so coordinates with near-zero gradients legitimately
differ by up to ~lr from fp-level gradient noise (see _assert_tree_close).
"""

import sys
import types
from functools import partial
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import importlib.util

import jax
import jax.numpy as jnp

from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler
from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.trainer.optim import make_optimizer
from contrast_gan_3d_tpu.trainer.steps import StepConfig, build_train_steps, init_state
from contrast_gan_3d_tpu.utils.torch_port import (
    critic_variables_from_torch,
    generator_variables_from_torch,
    numpy_state_dict,
)

from tests.test_reference_parity import fill_deterministic, load_reference_models
from tests.test_reference_parity_numpy import _ensure_stub

REF = Path("/root/reference/contrast_gan_3D")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="no reference checkout")

PATCH = (32, 32, 32)
B_OPT, B_LOW, B_HIGH = 3, 2, 2


@pytest.fixture(scope="module")
def ref_env():
    """The reference model modules plus its Trainer class, loaded live."""
    mods = load_reference_models()
    from enum import Enum

    class RefScanType(Enum):
        OPT = 0
        LOW = -1
        HIGH = 1

    _ensure_stub("contrast_gan_3D.alias", ScanType=RefScanType, BGenAugmenter=object)
    # utils package (real __init__ + logging_utils) for create_logger
    pkg = sys.modules["contrast_gan_3D"]
    pkg.__path__ = [str(REF)]
    import importlib

    importlib.import_module("contrast_gan_3D.utils")
    # trainer-side stubs: the real trainer/utils.py and logger/ import
    # batchgenerators / wandb (absent) — only these two names are touched
    trainer_pkg = _ensure_stub("contrast_gan_3D.trainer")
    tr_utils = _ensure_stub(
        "contrast_gan_3D.trainer.utils", find_latest_checkpoint=lambda d: None
    )
    trainer_pkg.utils = tr_utils
    logger_pkg = _ensure_stub("contrast_gan_3D.trainer.logger")
    li = _ensure_stub(
        "contrast_gan_3D.trainer.logger.LoggerInterface",
        MultiThreadedLogger=object, SingleThreadedLogger=object,
    )
    logger_pkg.LoggerInterface = li

    full = "contrast_gan_3D.trainer.Trainer"
    if full not in sys.modules:
        spec = importlib.util.spec_from_file_location(full, REF / "trainer" / "Trainer.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    mods["Trainer"] = sys.modules[full].Trainer
    return mods


def _make_reference_trainer(
    mods, gen_t, crit_t, scaler, milestones=(6000, 8000), train_generator_every=5,
    weight_clip=0.01, lr=2e-4, betas=(0.5, 0.999),
):
    lo, hi = float(scaler(350.0)), float(scaler(450.0))
    hu_loss = mods["loss"].HULoss(lo, hi, (B_LOW + B_HIGH, 1, *PATCH))
    sched = partial(
        torch.optim.lr_scheduler.MultiStepLR, milestones=list(milestones), gamma=0.1
    )
    return mods["Trainer"](
        train_iterations=10, val_iterations=1, validate_every=10**9,
        train_generator_every=train_generator_every, train_critic_every=1,
        log_every=10**9, log_images_every=10**9,
        generator_class=lambda: gen_t, critic_class=lambda: crit_t,
        generator_optim_class=partial(torch.optim.Adam, lr=lr, betas=betas),
        critic_optim_class=partial(torch.optim.Adam, lr=lr, betas=betas),
        hu_loss_instance=hu_loss,
        logger_interface=types.SimpleNamespace(logger=None),
        device=torch.device("cpu"),
        weight_clip=weight_clip,
        generator_lr_scheduler_class=sched,
        critic_lr_scheduler_class=sched,
    )


def _our_state_and_steps(gen_t, crit_t, milestones=(6000, 8000)):
    gen = ResnetGenerator(tconv_placement="torch")
    critic = PatchGANDiscriminator()
    tx = make_optimizer("adam", lr=2e-4, betas=(0.5, 0.999), milestones=list(milestones))
    cfg = StepConfig(weight_clip=0.01, dtype=jnp.float32, augment=None)
    state = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    gv = generator_variables_from_torch(numpy_state_dict(gen_t.state_dict()))
    cv = critic_variables_from_torch(numpy_state_dict(crit_t.state_dict()))
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gv["params"]),
        gen_stats=jax.tree.map(jnp.asarray, gv["batch_stats"]),
        critic_params=jax.tree.map(jnp.asarray, cv["params"]),
        critic_stats=jax.tree.map(jnp.asarray, cv["batch_stats"]),
    )
    return build_train_steps(gen, critic, tx, tx, cfg), state


def _batches(rng):
    opt = rng.integers(-200, 900, (B_OPT, *PATCH)).astype(np.int16)
    subopt = rng.integers(-200, 900, (B_LOW + B_HIGH, *PATCH)).astype(np.int16)
    mask = (rng.random((B_LOW + B_HIGH, *PATCH)) < 0.01).astype(np.int16)
    return opt, subopt, mask


def _torch_batches(scaler, opt, subopt, mask):
    t = lambda a: torch.from_numpy(np.asarray(scaler(a.astype(np.float32)))[:, None])
    return t(opt), t(subopt), torch.from_numpy(mask.astype(np.float32)[:, None])


def _assert_tree_close(got, want, atol, rtol, what, step_bound=None, frac_ok=0.999):
    """Leaf-wise comparison. With ``step_bound`` (post-Adam-update params):
    Adam's t=1 update is sign-like (m_hat/(sqrt(v_hat)+eps)), so coordinates
    with near-zero gradients may take an O(lr) step in either framework from
    fp-level gradient noise — those are bounded by ~lr each, not by the
    strict tolerance. Require >=99.9%% of elements strictly close AND every
    element within ``step_bound`` (a few x lr)."""
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    flat_want = jax.tree_util.tree_leaves_with_path(jax.tree.map(jnp.asarray, want))
    assert len(flat_got) == len(flat_want), what
    for (pg, g), (pw, w) in zip(flat_got, flat_want):
        assert pg == pw, (what, pg, pw)
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        name = f"{what}:{jax.tree_util.keystr(pg)}"
        if step_bound is None:
            np.testing.assert_allclose(g, w, atol=atol, rtol=rtol, err_msg=name)
        else:
            diff = np.abs(g - w)
            assert diff.max() <= step_bound, (name, float(diff.max()))
            ok = diff <= atol + rtol * np.abs(w)
            frac = float(ok.mean())
            # small leaves (e.g. a 32-element BatchNorm bias): one sensitive
            # coordinate would dominate the fraction — allow <= 2 outliers
            assert frac >= frac_ok or int((~ok).sum()) <= 2, (
                name, frac, float(diff.max()))


def test_combined_wc_iteration_parity(ref_env):
    """Iteration 0 (critic + generator both due, weight-clip mode): the full
    reference update — G forward, critic update on (real, detached fake) with
    clipping, generator update against the UPDATED critic reusing the stale
    opt_hat — must match our fused combined_step: params, stats, losses."""
    mods = ref_env
    gen_t = fill_deterministic(mods["generator"].ResnetGenerator(4, 2, 16), seed=20)
    crit_t = fill_deterministic(
        mods["discriminator"].PatchGANDiscriminator(1, 8, 3, negative_slope=0.2),
        seed=21,
    )
    scaler = FactorZeroCenterScaler()
    steps, state = _our_state_and_steps(gen_t, crit_t)  # port BEFORE torch updates

    rng = np.random.default_rng(22)
    opt, subopt, mask = _batches(rng)
    opt_t, subopt_t, mask_t = _torch_batches(scaler, opt, subopt, mask)

    tr = _make_reference_trainer(mods, gen_t, crit_t, scaler)
    gen_t.train()
    crit_t.train()
    attenuation = tr.generator(subopt_t)
    opt_hat = subopt_t - attenuation
    d_log = tr.train_critic(opt_t, opt_hat, True)
    crit_after_update = numpy_state_dict(crit_t.state_dict())  # pre-3rd-forward
    g_log = tr.train_generator(subopt_t, opt_hat, mask_t)

    new_state, metrics = steps.combined_step(
        state, jnp.asarray(opt), jnp.asarray(subopt), jnp.asarray(mask)
    )

    # losses
    assert float(metrics["D"]) == pytest.approx(float(d_log["D"].detach()), abs=2e-5)
    for k in ("G", "G-full", "sim", "HU"):
        assert float(metrics[k]) == pytest.approx(float(g_log[k].detach()), abs=2e-5), k

    want_g = generator_variables_from_torch(numpy_state_dict(gen_t.state_dict()))
    want_c = critic_variables_from_torch(crit_after_update)
    _assert_tree_close(
        new_state.gen_params, want_g["params"], 2e-6, 2e-4, "gen_params",
        step_bound=5e-4,  # ~2.5x lr
    )
    _assert_tree_close(
        new_state.gen_stats, want_g["batch_stats"], 1e-5, 1e-3, "gen_stats"
    )
    _assert_tree_close(
        new_state.critic_params, want_c["params"], 2e-6, 2e-4, "critic_params",
        step_bound=5e-4,
    )
    _assert_tree_close(
        new_state.critic_stats, want_c["batch_stats"], 1e-5, 1e-3, "critic_stats"
    )
    # weight clip actually engaged on both sides
    clipped = [
        np.abs(np.asarray(p)).max()
        for p in jax.tree_util.tree_leaves(new_state.critic_params)
    ]
    assert max(clipped) <= 0.01 + 1e-7


def test_combined_gp_iteration_parity(ref_env, monkeypatch):
    """Gradient-penalty mode (weight_clip=None, the gradient_penalty_conf
    hyperparams: Adam lr 1e-4 betas (0, 0.9), lambda=10): the critic update
    includes the eps-interpolated double-backward penalty; the generator
    then trains against the updated critic through the retained graph.
    eps is pinned on both sides (torch.rand monkeypatched / StepConfig.gp_eps)
    and the sub-optimal batch is sized to the real batch so the reference's
    random resampling never triggers. Critic running stats are NOT compared:
    the reference's GP forward on the interpolants advances torch's running
    stats a third time — a documented divergence (running stats play no role
    in training math)."""
    mods = ref_env
    gen_t = fill_deterministic(mods["generator"].ResnetGenerator(4, 2, 16), seed=40)
    crit_t = fill_deterministic(
        mods["discriminator"].PatchGANDiscriminator(1, 8, 3, negative_slope=0.2),
        seed=41,
    )
    scaler = FactorZeroCenterScaler()
    EPS = 0.37

    gen = ResnetGenerator(tconv_placement="torch")
    critic = PatchGANDiscriminator()
    tx = make_optimizer("adam", lr=1e-4, betas=(0.0, 0.9), milestones=[6000, 8000])
    cfg = StepConfig(weight_clip=None, dtype=jnp.float32, augment=None, gp_eps=EPS)
    state = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    gv = generator_variables_from_torch(numpy_state_dict(gen_t.state_dict()))
    cv = critic_variables_from_torch(numpy_state_dict(crit_t.state_dict()))
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gv["params"]),
        gen_stats=jax.tree.map(jnp.asarray, gv["batch_stats"]),
        critic_params=jax.tree.map(jnp.asarray, cv["params"]),
        critic_stats=jax.tree.map(jnp.asarray, cv["batch_stats"]),
    )
    steps = build_train_steps(gen, critic, tx, tx, cfg)

    rng = np.random.default_rng(42)
    opt = rng.integers(-200, 900, (B_OPT, *PATCH)).astype(np.int16)
    subopt = rng.integers(-200, 900, (B_OPT, *PATCH)).astype(np.int16)  # == real size
    mask = (rng.random((B_OPT, *PATCH)) < 0.01).astype(np.int16)
    opt_t, subopt_t, mask_t = _torch_batches(scaler, opt, subopt, mask)

    lo, hi = float(scaler(350.0)), float(scaler(450.0))
    hu_loss = mods["loss"].HULoss(lo, hi, (B_OPT, 1, *PATCH))
    sched = partial(
        torch.optim.lr_scheduler.MultiStepLR, milestones=[6000, 8000], gamma=0.1
    )
    tr = mods["Trainer"](
        train_iterations=10, val_iterations=1, validate_every=10**9,
        train_generator_every=5, train_critic_every=1,
        log_every=10**9, log_images_every=10**9,
        generator_class=lambda: gen_t, critic_class=lambda: crit_t,
        generator_optim_class=partial(torch.optim.Adam, lr=1e-4, betas=(0.0, 0.9)),
        critic_optim_class=partial(torch.optim.Adam, lr=1e-4, betas=(0.0, 0.9)),
        hu_loss_instance=hu_loss,
        logger_interface=types.SimpleNamespace(logger=None),
        device=torch.device("cpu"),
        weight_clip=None,
        generator_lr_scheduler_class=sched,
        critic_lr_scheduler_class=sched,
    )
    gen_t.train()
    crit_t.train()
    monkeypatch.setattr(
        torch, "rand", lambda *a, **k: torch.full(a[0] if isinstance(a[0], tuple) else a, EPS)
    )
    attenuation = tr.generator(subopt_t)
    opt_hat = subopt_t - attenuation
    d_log = tr.train_critic(opt_t, opt_hat, True)
    g_log = tr.train_generator(subopt_t, opt_hat, mask_t)

    new_state, metrics = steps.combined_step(
        state, jnp.asarray(opt), jnp.asarray(subopt), jnp.asarray(mask)
    )

    assert float(metrics["D"]) == pytest.approx(float(d_log["D"].detach()), abs=5e-5)
    for k in ("G", "G-full", "sim", "HU"):
        assert float(metrics[k]) == pytest.approx(float(g_log[k].detach()), abs=2e-5), k

    want_g = generator_variables_from_torch(numpy_state_dict(gen_t.state_dict()))
    want_c = critic_variables_from_torch(numpy_state_dict(crit_t.state_dict()))
    # b1=0 Adam is sign(g): near-zero-gradient coords are maximally
    # eps-sensitive, so a slightly larger share takes an O(lr) step from
    # fp-level gradient noise (each still bounded by step_bound)
    _assert_tree_close(
        new_state.gen_params, want_g["params"], 2e-6, 2e-4, "gen_params",
        step_bound=3e-4, frac_ok=0.995,
    )
    _assert_tree_close(
        new_state.gen_stats, want_g["batch_stats"], 1e-5, 1e-3, "gen_stats"
    )
    _assert_tree_close(
        new_state.critic_params, want_c["params"], 2e-6, 2e-4, "critic_params",
        step_bound=3e-4, frac_ok=0.995,
    )


def test_critic_only_iteration_parity(ref_env):
    """Iterations where only the critic trains (4 of 5 under the reference
    schedule): generator forward + critic update only."""
    mods = ref_env
    gen_t = fill_deterministic(mods["generator"].ResnetGenerator(4, 2, 16), seed=30)
    crit_t = fill_deterministic(
        mods["discriminator"].PatchGANDiscriminator(1, 8, 3, negative_slope=0.2),
        seed=31,
    )
    scaler = FactorZeroCenterScaler()
    steps, state = _our_state_and_steps(gen_t, crit_t)

    rng = np.random.default_rng(32)
    opt, subopt, mask = _batches(rng)
    opt_t, subopt_t, _ = _torch_batches(scaler, opt, subopt, mask)

    tr = _make_reference_trainer(mods, gen_t, crit_t, scaler)
    gen_t.train()
    crit_t.train()
    opt_hat = subopt_t - tr.generator(subopt_t)
    d_log = tr.train_critic(opt_t, opt_hat, False)

    new_state, metrics = steps.critic_step(
        state, jnp.asarray(opt), jnp.asarray(subopt), jnp.asarray(mask)
    )
    assert float(metrics["D"]) == pytest.approx(float(d_log["D"].detach()), abs=2e-5)

    want_c = critic_variables_from_torch(numpy_state_dict(crit_t.state_dict()))
    want_g = generator_variables_from_torch(numpy_state_dict(gen_t.state_dict()))
    _assert_tree_close(
        new_state.critic_params, want_c["params"], 2e-6, 2e-4, "critic_params",
        step_bound=5e-4,
    )
    _assert_tree_close(
        new_state.critic_stats, want_c["batch_stats"], 1e-5, 1e-3, "critic_stats"
    )
    # generator params untouched; its BatchNorm stats advanced by the forward
    _assert_tree_close(new_state.gen_params, want_g["params"], 0, 1e-7, "gen_params")
    _assert_tree_close(
        new_state.gen_stats, want_g["batch_stats"], 1e-5, 1e-3, "gen_stats"
    )


def test_multi_iteration_trajectory_parity(ref_env):
    """SIX-iteration trajectory through the reference's ACTUAL
    ``Trainer.train_step`` (its alternation dispatch, Trainer.py:163-187)
    vs our per-branch programs — with MultiStepLR milestones [2, 4] placed
    INSIDE the trajectory, so both LR decays fire mid-run (per-optimizer
    update counts: the critic crosses both, the generator — updating every
    2nd iteration — crosses the first).

    This is the loop-level composition the single-step tests can't see:
    optimizer-moment accumulation across steps, scheduler boundaries hit at
    different counts per network, the `iteration % every` phase alignment
    (iterations run 1..6 — generator trains on 2/4/6), weight clipping
    interacting with Adam state over time, and BatchNorm stat threading
    across iterations. Fresh batches every iteration from a shared stream.

    Critic running stats are NOT compared (the reference's third critic
    forward in train_generator advances them — same documented divergence
    as the single-step tests; running stats play no role in train math)."""
    mods = ref_env
    N, GEN_EVERY, MILESTONES = 6, 2, (2, 4)
    gen_t = fill_deterministic(mods["generator"].ResnetGenerator(4, 2, 16), seed=50)
    crit_t = fill_deterministic(
        mods["discriminator"].PatchGANDiscriminator(1, 8, 3, negative_slope=0.2),
        seed=51,
    )
    scaler = FactorZeroCenterScaler()
    steps, state = _our_state_and_steps(gen_t, crit_t, milestones=MILESTONES)

    tr = _make_reference_trainer(
        mods, gen_t, crit_t, scaler,
        milestones=MILESTONES, train_generator_every=GEN_EVERY,
    )
    gen_t.train()
    crit_t.train()

    rng = np.random.default_rng(52)
    our_losses = []
    for it in range(1, N + 1):
        opt, subopt, mask = _batches(rng)
        opt_t, subopt_t, mask_t = _torch_batches(scaler, opt, subopt, mask)
        patches = [
            {"data": opt_t, "seg": torch.zeros_like(opt_t)},
            {"data": subopt_t[:B_LOW], "seg": mask_t[:B_LOW]},
            {"data": subopt_t[B_LOW:], "seg": mask_t[B_LOW:]},
        ]
        tr.train_step(patches, it)

        fn = steps.combined_step if it % GEN_EVERY == 0 else steps.critic_step
        state, metrics = fn(
            state, jnp.asarray(opt), jnp.asarray(subopt), jnp.asarray(mask)
        )
        our_losses.append({k: float(v) for k, v in metrics.items()})

    # LR schedules actually decayed: torch's per-network schedulers report
    # gamma^2 (critic, 6 updates past both milestones) and gamma^1
    # (generator, 3 updates past the first)
    assert tr.lr_scheduler_D.get_last_lr()[0] == pytest.approx(2e-4 * 0.01)
    assert tr.lr_scheduler_G.get_last_lr()[0] == pytest.approx(2e-4 * 0.1)

    # loss trajectory sanity on our side (finite, critic loss present every
    # iteration, generator losses only on 2/4/6)
    for i, m in enumerate(our_losses, start=1):
        assert np.isfinite(m["D"])
        assert ("G" in m) == (i % GEN_EVERY == 0)

    want_g = generator_variables_from_torch(numpy_state_dict(gen_t.state_dict()))
    want_c = critic_variables_from_torch(numpy_state_dict(crit_t.state_dict()))
    # six compounding updates: per-coordinate drift is bounded by the summed
    # (decayed) step sizes; the strict-close fraction is looser than the
    # single-step tests but every coordinate must stay within the trajectory
    # step bound
    # (~98% observed: six compounding sign-like Adam updates flip more
    # near-zero-gradient coordinates than a single step; every one is still
    # bounded by a couple of lr-sized steps)
    _assert_tree_close(
        state.gen_params, want_g["params"], 1e-5, 1e-3, "gen_params",
        step_bound=3e-3, frac_ok=0.97,
    )
    # stats atol 1e-3: running means sit at O(0.1-1); near-zero coordinates
    # accumulate the params' drift through six batch-mean updates
    _assert_tree_close(
        state.gen_stats, want_g["batch_stats"], 1e-3, 1e-2, "gen_stats"
    )
    _assert_tree_close(
        state.critic_params, want_c["params"], 1e-5, 1e-3, "critic_params",
        step_bound=3e-3, frac_ok=0.97,
    )
    # weight clip engaged throughout
    clipped = [
        np.abs(np.asarray(p)).max()
        for p in jax.tree_util.tree_leaves(state.critic_params)
    ]
    assert max(clipped) <= 0.01 + 1e-7


def test_multi_iteration_trajectory_parity_gp(ref_env, monkeypatch):
    """GP-mode trajectory (5 iterations, gradient_penalty_conf hyperparams,
    eps pinned on both sides, equal real/fake batch sizes so the reference's
    random GP resampling never fires): the double-backward penalty composes
    with Adam(0, 0.9) moment accumulation and the alternation schedule across
    iterations. Generator trains on 2/4; no weight clipping. Critic running
    stats not compared (reference's extra GP + train_generator critic
    forwards advance them — documented divergence)."""
    mods = ref_env
    N, GEN_EVERY, EPS = 5, 2, 0.37
    B = B_LOW + B_HIGH  # equal real/fake batches
    gen_t = fill_deterministic(mods["generator"].ResnetGenerator(4, 2, 16), seed=60)
    crit_t = fill_deterministic(
        mods["discriminator"].PatchGANDiscriminator(1, 8, 3, negative_slope=0.2),
        seed=61,
    )
    scaler = FactorZeroCenterScaler()

    gen = ResnetGenerator(tconv_placement="torch")
    critic = PatchGANDiscriminator()
    tx = make_optimizer("adam", lr=1e-4, betas=(0.0, 0.9), milestones=[6000, 8000])
    cfg = StepConfig(weight_clip=None, dtype=jnp.float32, augment=None, gp_eps=EPS)
    state = init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)
    gv = generator_variables_from_torch(numpy_state_dict(gen_t.state_dict()))
    cv = critic_variables_from_torch(numpy_state_dict(crit_t.state_dict()))
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gv["params"]),
        gen_stats=jax.tree.map(jnp.asarray, gv["batch_stats"]),
        critic_params=jax.tree.map(jnp.asarray, cv["params"]),
        critic_stats=jax.tree.map(jnp.asarray, cv["batch_stats"]),
    )
    steps = build_train_steps(gen, critic, tx, tx, cfg)

    tr = _make_reference_trainer(
        mods, gen_t, crit_t, scaler, train_generator_every=GEN_EVERY,
        weight_clip=None, lr=1e-4, betas=(0.0, 0.9),
    )
    gen_t.train()
    crit_t.train()
    monkeypatch.setattr(
        torch, "rand",
        lambda *a, **k: torch.full(a[0] if isinstance(a[0], tuple) else a, EPS),
    )

    rng = np.random.default_rng(62)
    for it in range(1, N + 1):
        opt = rng.integers(-200, 900, (B, *PATCH)).astype(np.int16)
        subopt = rng.integers(-200, 900, (B, *PATCH)).astype(np.int16)
        mask = (rng.random((B, *PATCH)) < 0.01).astype(np.int16)
        opt_t, subopt_t, mask_t = _torch_batches(scaler, opt, subopt, mask)
        patches = [
            {"data": opt_t, "seg": torch.zeros_like(opt_t)},
            {"data": subopt_t[:B_LOW], "seg": mask_t[:B_LOW]},
            {"data": subopt_t[B_LOW:], "seg": mask_t[B_LOW:]},
        ]
        tr.train_step(patches, it)
        fn = steps.combined_step if it % GEN_EVERY == 0 else steps.critic_step
        state, metrics = fn(
            state, jnp.asarray(opt), jnp.asarray(subopt), jnp.asarray(mask)
        )
        assert np.isfinite(float(metrics["D"]))

    want_g = generator_variables_from_torch(numpy_state_dict(gen_t.state_dict()))
    want_c = critic_variables_from_torch(numpy_state_dict(crit_t.state_dict()))
    # b1=0 Adam is sign(g) at every step: looser strict fraction than the WC
    # trajectory (see the single-step GP test), drift still step-bounded
    _assert_tree_close(
        state.gen_params, want_g["params"], 1e-5, 1e-3, "gen_params",
        step_bound=2e-3, frac_ok=0.95,
    )
    _assert_tree_close(
        state.gen_stats, want_g["batch_stats"], 1e-3, 1e-2, "gen_stats"
    )
    _assert_tree_close(
        state.critic_params, want_c["params"], 1e-5, 1e-3, "critic_params",
        step_bound=2e-3, frac_ok=0.95,
    )

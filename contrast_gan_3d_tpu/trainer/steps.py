"""The WGAN training step — one jitted function per schedule branch.

TPU-native re-design of the reference train loop (``trainer/Trainer.py:
108-203``): instead of eager torch calls with retain_graph bookkeeping, the
whole iteration — HU scaling, (optional) on-device augmentation, generator
forward, critic update (Wasserstein loss + weight clipping OR gradient
penalty), generator update (adversarial + ZNCC + HU-corridor losses), both
optax updates and BatchNorm state threading — is ONE compiled XLA program
with donated state. The critic-every-1 / generator-every-5 alternation
(reference basic_conf.py:23-24) is a *static* schedule: one program per
branch (:class:`TrainSteps`), picked per-iteration on host — no lax.cond
over dead branches.

Update order matches the reference: the critic trains first on (real,
stop-grad fake); the generator then trains against the *updated* critic
(Trainer.py:179-184). The generator runs ONE forward per iteration — its
vjp is captured and the generator-loss cotangent is pulled back through it
after the critic update (the reference's retain_graph pattern, the JAX way).
Gradient penalty is a nested jax.grad through the critic wrt its input
(model/utils.py:12-41). Batches arrive as raw int16 HU patches; f32 cast +
scaling happen on device (half the host->HBM bytes of a float pipeline).
The split ``critic_phase``/``generator_phase`` pair trades one extra
generator forward for lower peak HBM (oversized configs).
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from contrast_gan_3d_tpu.data.augment import AugmentConfig, augment_batch
from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler, Scaler
from contrast_gan_3d_tpu.models import losses
from contrast_gan_3d_tpu.trainer.optim import clip_params


def _sharded_jit(
    mesh,
    batch_axis: str,
    arg_kinds: str,
    out_kinds: Optional[str] = None,
    donate: bool = True,
    compiler_options: Optional[dict] = None,
):
    """jax.jit partial with per-argument replicated ('r') / batch-sharded
    ('b') / batch-vector ('v', rank-1 (B,) leaves) NamedShardings when a
    mesh is given (plain jit otherwise). On a dp x sp mesh 'b' additionally
    shards the first spatial dim over the ``space`` axis — GSPMD inserts the
    conv halo exchanges. ``out_kinds`` pins one kind per output (pytree
    prefix): without it GSPMD may return state leaves with a propagated
    (e.g. space-sharded) layout that then mismatches the next call's
    replicated in_shardings.

    ``compiler_options``: per-program XLA option overrides
    (StepConfig.compiler_options — e.g. the measured
    ``xla_tpu_scoped_vmem_limit_kib`` training win, PERF.md "b96 backward
    accounting"). Platform-specific keys are the caller's responsibility:
    a ``xla_tpu_*`` option on the CPU backend is a compile error, which is
    why the builder only injects the TPU default on TPU."""
    donate_kw = {"donate_argnums": 0} if donate else {}
    if compiler_options:
        donate_kw["compiler_options"] = dict(compiler_options)
    if mesh is None:
        return partial(jax.jit, **donate_kw)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from contrast_gan_3d_tpu.parallel.mesh import replicate, shard_batch

    from contrast_gan_3d_tpu.parallel.mesh import batch_spec

    kinds = {
        "r": replicate(mesh),
        "b": shard_batch(mesh, batch_axis),
        "v": NamedSharding(mesh, P(batch_axis)),
        # cycle-stacked batches (K, B, ...): leading cycle axis unsharded,
        # batch (+ space) axes as in 'b'
        "c": NamedSharding(mesh, P(None, *batch_spec(mesh, batch_axis))),
    }
    out_kw = {}
    if out_kinds is not None:
        outs = tuple(kinds[k] for k in out_kinds)
        out_kw["out_shardings"] = outs if len(outs) > 1 else outs[0]
    return partial(
        jax.jit, in_shardings=tuple(kinds[k] for k in arg_kinds), **out_kw,
        **donate_kw,
    )


class GANTrainState(struct.PyTreeNode):
    """Full training state: both networks' params + BatchNorm stats, both
    optimizer states, the PRNG key and the iteration counter. Unlike the
    reference checkpoint (which silently drops the critic — Trainer.py:312-319
    quirk NOT replicated), everything needed for exact resume lives here."""

    step: jax.Array
    gen_params: Any
    gen_stats: Any
    critic_params: Any
    critic_stats: Any
    gen_opt: optax.OptState
    critic_opt: optax.OptState
    rng: jax.Array


@dataclass(frozen=True)
class StepConfig:
    """Static (compile-time) training-step configuration."""

    weight_clip: Optional[float] = 0.01  # None -> WGAN-GP
    gp_weight: float = 10.0
    gan_loss_weight: float = 1.0
    sim_loss_weight: float = 1.0
    hu_loss_weight: float = 1.0
    hu_bounds: Tuple[float, float] = (350.0, 450.0)  # UNscaled HU corridor
    scaler: Scaler = field(default_factory=FactorZeroCenterScaler)
    augment: Optional[AugmentConfig] = field(default_factory=AugmentConfig)
    dtype: Any = jnp.float32
    # fixed GP interpolation eps (scalar, applied to every sample) instead of
    # per-sample uniform draws — deterministic-penalty hook for the live
    # reference train-step parity tests; None (default) = random eps
    gp_eps: Optional[float] = None
    # XLA option overrides for the per-iteration TRAIN-step programs
    # (critic/combined/generator-only/phases) — math-preserving
    # scheduling/fusion knobs only. Production default on TPU
    # (experiments/builder.py, 3D only): scoped VMEM 64 MiB — a measured
    # per-step win at every batch (PERF.md round-5 A/B: 0.930 -> 0.892 s
    # at 48+48, 0.257 -> 0.254 at the reference mix). Deliberately NOT
    # applied to eval/preview programs, fused cycles or the 2D family —
    # each measured WORSE with it (same PERF.md section). Keys are
    # platform-specific; None = compiler defaults.
    compiler_options: Optional[dict] = None

    @property
    def hu_bounds_scaled(self) -> Tuple[float, float]:
        # reference train.py:146: HULoss receives scaler(desired_HU_bounds)
        return losses.scale_bounds(self.scaler, self.hu_bounds)


def _apply(model: nn.Module, params, stats, x, train: bool, rngs=None):
    """Model apply without threading state."""
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    if train and stats:
        out, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"], rngs=rngs
        )
        return out
    return model.apply(variables, x, train=train, rngs=rngs)


def _apply_mutable(model: nn.Module, params, stats, x, train: bool = True, rngs=None):
    """Model apply that returns (out, new_stats)."""
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
        out, updates = model.apply(
            variables, x, train=train, mutable=["batch_stats"], rngs=rngs
        )
        return out, updates.get("batch_stats", stats)
    return model.apply(variables, x, train=train, rngs=rngs), stats


def init_state(
    generator: nn.Module,
    critic: nn.Module,
    gen_tx: optax.GradientTransformation,
    critic_tx: optax.GradientTransformation,
    key: jax.Array,
    patch_shape: Tuple[int, ...],
) -> GANTrainState:
    """Initialize params/stats/optimizers from a single PRNG key."""
    kg, kc, krest = jax.random.split(key, 3)
    dummy = jnp.zeros((1, *patch_shape, 1), jnp.float32)
    gvars = generator.init(kg, dummy, train=False)
    cvars = critic.init(kc, dummy, train=False)
    gen_params = gvars["params"]
    critic_params = cvars["params"]
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_stats=gvars.get("batch_stats", {}),
        critic_params=critic_params,
        critic_stats=cvars.get("batch_stats", {}),
        gen_opt=gen_tx.init(gen_params),
        critic_opt=critic_tx.init(critic_params),
        rng=krest,
    )


def _prepare_batches(cfg: StepConfig, key, opt, subopt, subopt_mask):
    """Device-side input pipeline tail: int16 -> f32, per-sample spatial
    augmentation (train only), HU scaling, channel dim."""
    opt = opt.astype(jnp.float32)
    subopt = subopt.astype(jnp.float32)
    subopt_mask = subopt_mask.astype(jnp.float32)
    if cfg.augment is not None:
        k1, k2 = jax.random.split(key)
        # the OPT stream has no loss mask — augment data only (reuse the
        # data array as a dummy seg to keep one code path; the discarded seg
        # output is dead code inside the jit, so XLA DCEs its nearest-warp
        # gather — same for the whole unused opt path in generator_only_step)
        opt, _ = augment_batch(opt, opt, k1, cfg.augment)
        subopt, subopt_mask = augment_batch(subopt, subopt_mask, k2, cfg.augment)
    opt = cfg.scaler(opt).astype(cfg.dtype)[..., None]
    subopt = cfg.scaler(subopt).astype(cfg.dtype)[..., None]
    subopt_mask = subopt_mask[..., None]
    return opt, subopt, subopt_mask


class TrainSteps(NamedTuple):
    """The compiled per-iteration programs (see ``build_train_steps``)."""

    critic_step: Callable      # generator fwd + critic update only
    combined_step: Callable    # critic then generator update, one program
    generator_only_step: Callable
    critic_phase: Callable     # combined split in two: lower peak HBM —
    generator_phase: Callable  # critic_phase hands the prepared batch over


def build_train_steps(
    generator: nn.Module,
    critic: nn.Module,
    gen_tx: optax.GradientTransformation,
    critic_tx: optax.GradientTransformation,
    cfg: StepConfig,
    mesh: Optional[jax.sharding.Mesh] = None,
    batch_axis: str = "data",
):
    """Returns (critic_step, combined_step, generator_only_step), all jitted
    with donated state.

    critic_step: generator forward + critic update only (4 of 5 iterations
    under the default schedule).
    combined_step: critic update then generator update against the fresh
    critic params.

    With ``mesh``, the same programs compile data-parallel over the mesh's
    ``batch_axis`` (SURVEY.md §2.2): state replicated, batches sharded on
    their leading axis, gradients/BatchNorm reductions turned into ICI
    collectives by GSPMD — no NCCL analogue, no code change to the math.
    """
    hu_lo, hu_hi = cfg.hu_bounds_scaled
    use_gp = cfg.weight_clip is None
    # the reference's optional ResNet-block dropout (blocks.py:31-36): flax
    # Dropout needs a "dropout" rng at train time. The key folds out of the
    # branch's k_aug, so no-dropout configs keep bit-identical PRNG streams.
    # (Split-phase runs redraw the mask in the generator phase — the fused
    # paths share one mask per iteration like the reference's retain_graph.)
    has_dropout = float(getattr(generator, "resnet_dropout_prob", 0.0) or 0.0) > 0.0

    def _gen_rngs(key):
        return {"dropout": jax.random.fold_in(key, 7)} if has_dropout else None

    def critic_loss_fn(c_params, c_stats, real, fake, key):
        real_logits, stats1 = _apply_mutable(critic, c_params, c_stats, real)
        fake_logits, stats2 = _apply_mutable(critic, c_params, stats1, fake)
        loss = cfg.gan_loss_weight * losses.wasserstein_loss(fake_logits, real_logits)
        if use_gp:
            critic_fn = lambda x: _apply(critic, c_params, c_stats, x, train=True)
            fixed_eps = None
            if cfg.gp_eps is not None:
                n = min(real.shape[0], fake.shape[0])
                fixed_eps = jnp.full((n,) + (1,) * (real.ndim - 1), cfg.gp_eps, real.dtype)
            loss = loss + losses.gradient_penalty(
                critic_fn, real, fake, key, cfg.gp_weight, eps=fixed_eps
            )
        return loss, stats2

    def update_critic(state: GANTrainState, opt_b, opt_hat, key):
        (loss_d, new_c_stats), grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            state.critic_params, state.critic_stats, opt_b,
            jax.lax.stop_gradient(opt_hat), key,
        )
        updates, new_opt = critic_tx.update(grads, state.critic_opt, state.critic_params)
        new_params = optax.apply_updates(state.critic_params, updates)
        if cfg.weight_clip is not None:
            new_params = clip_params(new_params, cfg.weight_clip)
        state = state.replace(
            critic_params=new_params, critic_stats=new_c_stats, critic_opt=new_opt
        )
        return state, loss_d

    def gen_losses(opt_hat, subopt, mask, c_params, c_stats):
        """The generator's loss head (adversarial + ZNCC + HU corridor,
        reference Trainer.py:151-154) — the one definition every branch
        (fused, generator-only, split-phase) differentiates."""
        fake_logits = _apply(critic, c_params, c_stats, opt_hat, train=True)
        loss_g = cfg.gan_loss_weight * -losses.wasserstein_loss(fake_logits)
        loss_sim = cfg.sim_loss_weight * losses.zncc_loss(opt_hat, subopt)
        loss_hu = cfg.hu_loss_weight * losses.hu_loss(opt_hat, mask, hu_lo, hu_hi)
        full = loss_g + loss_sim + loss_hu
        return full, {"G": loss_g, "G-full": full, "sim": loss_sim, "HU": loss_hu}

    def gen_loss_fn(g_params, g_stats, c_params, c_stats, subopt, mask, drop_key):
        atten, _ = _apply_mutable(
            generator, g_params, g_stats, subopt, rngs=_gen_rngs(drop_key)
        )
        return gen_losses(subopt - atten, subopt, mask, c_params, c_stats)

    def update_generator(state: GANTrainState, subopt, mask, new_gen_stats):
        (_, metrics), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, state.gen_stats, state.critic_params,
            state.critic_stats, subopt, mask, state.rng,
        )
        updates, new_opt = gen_tx.update(grads, state.gen_opt, state.gen_params)
        new_params = optax.apply_updates(state.gen_params, updates)
        state = state.replace(
            gen_params=new_params, gen_stats=new_gen_stats, gen_opt=new_opt
        )
        return state, metrics

    def _common(state: GANTrainState, opt_b, subopt_b, subopt_mask):
        rng, k_aug, k_gp = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng, step=state.step + 1)
        opt_b, subopt_b, subopt_mask = _prepare_batches(
            cfg, k_aug, opt_b, subopt_b, subopt_mask
        )
        # single stats-updating generator forward per iteration (reference
        # Trainer.py:170-171); the gen-update branch recomputes the forward
        # for its own grads but reuses THIS stats update.
        atten, new_gen_stats = _apply_mutable(
            generator, state.gen_params, state.gen_stats, subopt_b,
            rngs=_gen_rngs(k_aug),
        )
        opt_hat = subopt_b - atten
        return state, opt_b, subopt_b, subopt_mask, opt_hat, new_gen_stats, k_gp

    _jit = _sharded_jit(mesh, batch_axis, "rbbb", out_kinds="rr",
                        compiler_options=cfg.compiler_options)

    @_jit
    def critic_step(state: GANTrainState, opt_b, subopt_b, subopt_mask):
        state, opt_b, _, _, opt_hat, new_gen_stats, k_gp = _common(
            state, opt_b, subopt_b, subopt_mask
        )
        state = state.replace(gen_stats=new_gen_stats)
        state, loss_d = update_critic(state, opt_b, opt_hat, k_gp)
        return state, {"D": loss_d}

    @_jit
    def combined_step(state: GANTrainState, opt_b, subopt_b, subopt_mask):
        """ONE generator forward per iteration (the reference's retain_graph
        pattern, reference Trainer.py:170-184, done the JAX way): capture the
        forward's vjp, update the critic on the stop-gradded output, then
        pull the generator-loss cotangent back through the saved vjp — no
        re-forward in the generator update."""
        rng, k_aug, k_gp = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng, step=state.step + 1)
        opt_b, subopt_b, subopt_mask = _prepare_batches(
            cfg, k_aug, opt_b, subopt_b, subopt_mask
        )

        def gen_fwd(g_params):
            atten, new_stats = _apply_mutable(
                generator, g_params, state.gen_stats, subopt_b,
                rngs=_gen_rngs(k_aug),
            )
            return subopt_b - atten, new_stats

        opt_hat, gen_vjp, new_gen_stats = jax.vjp(
            gen_fwd, state.gen_params, has_aux=True
        )
        state = state.replace(gen_stats=new_gen_stats)
        state, loss_d = update_critic(
            state, opt_b, jax.lax.stop_gradient(opt_hat), k_gp
        )

        def gen_head(oh):
            return gen_losses(
                oh, subopt_b, subopt_mask, state.critic_params, state.critic_stats
            )

        (_, metrics), d_opt_hat = jax.value_and_grad(gen_head, has_aux=True)(opt_hat)
        (g_grads,) = gen_vjp(d_opt_hat)
        updates, new_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        new_params = optax.apply_updates(state.gen_params, updates)
        state = state.replace(gen_params=new_params, gen_opt=new_opt)
        return state, {"D": loss_d, **metrics}

    @_jit
    def generator_only_step(state: GANTrainState, opt_b, subopt_b, subopt_mask):
        """For schedules where the critic skips an iteration (e.g.
        train_generator_more_3D: G every 1, D every 5). Single generator
        forward via saved vjp (same structure as combined_step minus the
        critic update)."""
        rng, k_aug, _ = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng, step=state.step + 1)
        _, subopt_b, subopt_mask = _prepare_batches(
            cfg, k_aug, opt_b, subopt_b, subopt_mask
        )

        def gen_fwd(g_params):
            atten, new_stats = _apply_mutable(
                generator, g_params, state.gen_stats, subopt_b,
                rngs=_gen_rngs(k_aug),
            )
            return subopt_b - atten, new_stats

        opt_hat, gen_vjp, new_gen_stats = jax.vjp(
            gen_fwd, state.gen_params, has_aux=True
        )
        state = state.replace(gen_stats=new_gen_stats)

        def gen_head(oh):
            return gen_losses(
                oh, subopt_b, subopt_mask, state.critic_params, state.critic_stats
            )

        (_, metrics), d_opt_hat = jax.value_and_grad(gen_head, has_aux=True)(opt_hat)
        (g_grads,) = gen_vjp(d_opt_hat)
        updates, new_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        state = state.replace(
            gen_params=optax.apply_updates(state.gen_params, updates), gen_opt=new_opt
        )
        return state, metrics

    # --- split variants: same iteration as combined_step but as TWO
    # sequential programs, so peak HBM liveness is max(phase) rather than
    # their union (a 128^3 batch-12 combined step overflows a 16 GB chip
    # even with remat). The critic phase hands the prepared (augmented +
    # scaled) sub-optimal batch to the generator phase — identical semantics
    # to combined_step / the reference's single-batch iteration.

    _jit_phase = _sharded_jit(mesh, batch_axis, "rbbb", out_kinds="rrbb",
                              compiler_options=cfg.compiler_options)

    @_jit_phase
    def critic_phase(state: GANTrainState, opt_b, subopt_b, subopt_mask):
        state, opt_b, subopt_s, mask_s, opt_hat, new_gen_stats, k_gp = _common(
            state, opt_b, subopt_b, subopt_mask
        )
        state = state.replace(gen_stats=new_gen_stats)
        state, loss_d = update_critic(state, opt_b, opt_hat, k_gp)
        return state, {"D": loss_d}, subopt_s, mask_s

    _jit_gen = _sharded_jit(mesh, batch_axis, "rbb", out_kinds="rr",
                            compiler_options=cfg.compiler_options)

    @_jit_gen
    def generator_phase(state: GANTrainState, subopt_s, mask_s):
        """Generator update against the (already prepared) sub-optimal batch;
        rng/step were advanced by the critic phase."""
        state, metrics = update_generator(state, subopt_s, mask_s, state.gen_stats)
        return state, metrics

    return TrainSteps(
        critic_step, combined_step, generator_only_step, critic_phase, generator_phase
    )


def schedule_branches(
    critic_every: Optional[int],
    generator_every: Optional[int],
    start: int,
    length: int,
) -> tuple:
    """Branch name per iteration for iterations ``[start, start+length)`` —
    the same decision ``Trainer.train_step`` makes per iteration (critic due
    iff ``i % critic_every == 0``, iteration 0 included; ``None`` = never)."""
    def due(i, every):
        return every is not None and i % every == 0

    out = []
    for i in range(start, start + length):
        c, g = due(i, critic_every), due(i, generator_every)
        out.append(
            "combined" if c and g else "critic" if c else "generator" if g
            else "none"
        )
    return tuple(out)


def build_cycle_step(
    steps: TrainSteps,
    pattern: tuple,
    mesh: Optional[jax.sharding.Mesh] = None,
    batch_axis: str = "data",
    compiler_options: Optional[dict] = None,
):
    # compiler_options default None ON PURPOSE even when the steps carry
    # them: the scoped-VMEM train-step win INVERTS on the fused cycle
    # (101.5 -> 97.2 patches/s measured, PERF.md round-5 A/B) — the bigger
    # inlined program needs the default scoped-memory budget for its
    # cross-iteration scheduling. The param stays for explicit A/Bs.
    """ONE compiled program running ``len(pattern)`` schedule iterations.

    The per-iteration programs already exist (``TrainSteps``); tracing them
    inside an outer jit inlines them, so the cycle is their exact
    composition — same math, same rng/step advancement — with host
    round-trips cut from K dispatches to 1. That matters wherever dispatch
    latency is non-trivial: high-latency links (the round-3 gap study
    measured the per-dispatch cost dominating a degraded tunnel) and fast
    steps on healthy hosts; it also hands XLA the whole cycle for
    cross-iteration scheduling. Batches arrive stacked on a leading cycle
    axis ``(K, B, ...)``; under a mesh the batch axis stays data-sharded
    ('c' kind) and the state replicated.

    Metrics: the last value per key across the cycle, except ``D`` which is
    the MEAN critic loss over the cycle's critic updates (a cycle spans
    several critic steps — the mean is the honest scalar for that window).
    Image previews at cycle boundaries pair the cycle's FIRST batch with
    POST-cycle params (up to K-1 updates of drift vs the 1-update skew of
    per-iteration mode — see ``Trainer._log_train_images``).

    The reference has no analogue (its eager loop pays Python+CUDA-launch
    per iteration, reference trainer/Trainer.py:218-241); this is the
    TPU-native "compile the schedule, not just the step" shape.
    """
    _jit = _sharded_jit(mesh, batch_axis, "rccc", out_kinds="rr",
                        compiler_options=compiler_options)

    # the per-iteration programs inline into this jit; their RAW bodies
    # (``__wrapped__``) are traced rather than the jitted wrappers, because
    # jax rejects ``compiler_options`` on a nested jit — same composition,
    # identical math (parity locked by tests/test_cycle.py and the
    # under-mesh cycle tests; the cycle's own in/out shardings pin the
    # boundary layouts the inner jits' annotations used to)
    combined_fn = getattr(steps.combined_step, "__wrapped__", steps.combined_step)
    critic_fn = getattr(steps.critic_step, "__wrapped__", steps.critic_step)
    gen_only_fn = getattr(
        steps.generator_only_step, "__wrapped__", steps.generator_only_step
    )

    @_jit
    def cycle_step(state: GANTrainState, opt_c, subopt_c, mask_c):
        metrics = {}
        d_losses = []
        for k, branch in enumerate(pattern):
            o, s, m = opt_c[k], subopt_c[k], mask_c[k]
            if branch == "combined":
                state, mt = combined_fn(state, o, s, m)
                metrics.update(mt)
                d_losses.append(mt["D"])
            elif branch == "critic":
                state, mt = critic_fn(state, o, s, m)
                metrics.update(mt)
                d_losses.append(mt["D"])
            elif branch == "generator":
                state, mt = gen_only_fn(state, o, s, m)
                metrics.update(mt)
            else:  # "none": advance the step counter only (Trainer parity)
                state = state.replace(step=state.step + 1)
        if d_losses:
            metrics["D"] = sum(d_losses) / len(d_losses)
        return state, metrics

    return cycle_step


def _wcast(w, x):
    """(B,) validity weights broadcast against x's shape."""
    return w.reshape((-1,) + (1,) * (x.ndim - 1)).astype(jnp.float32)


def _masked_mean(x, w):
    """Mean over valid samples only — equals jnp.mean(x) when w is all-ones
    (per-sample element counts are uniform)."""
    per = x.size // x.shape[0]
    return jnp.sum(x.astype(jnp.float32) * _wcast(w, x)) / (jnp.sum(w) * per)


def _masked_zncc(source, target, w):
    """Reference zncc_loss restricted to valid samples (ddof=1 std, same
    epsilons) — exact on padded batches, equal to losses.zncc_loss when w is
    all-ones."""
    wf = _wcast(w, source)
    per = source.size // source.shape[0]
    n = jnp.sum(w) * per
    ms = jnp.sum(source * wf) / n
    mt = jnp.sum(target * wf) / n
    cc = jnp.sum((source - ms) * (target - mt) * wf) / n
    std = jnp.sqrt(jnp.sum(jnp.square(source - ms) * wf) / (n - 1)) * jnp.sqrt(
        jnp.sum(jnp.square(target - mt) * wf) / (n - 1)
    )
    return -(cc / (std + 1e-8))


def build_val_steps(
    generator: nn.Module,
    critic: nn.Module,
    cfg: StepConfig,
    mesh: Optional[jax.sharding.Mesh] = None,
    batch_axis: str = "data",
):
    """Jitted eval-mode steps (reference Trainer.validate, Trainer.py:247-308):
    OPT batches score the critic on real data; sub-optimal batches run the
    generator and score realism + ZNCC similarity. No augmentation.

    Each step takes ``(state, batch, w)`` where ``w`` is a (B,) 0/1 validity
    vector: under a ``mesh`` the batch is padded to the device count and
    sharded (each chip computes only its shard — no redundant replicated
    compute), and the masked reductions make the losses exactly
    padding-invariant.
    """

    val_cfg_scaler = cfg.scaler
    # NOTE: no compiler_options here — the scoped-VMEM default is a
    # measured TRAIN-step win only; eval-mode forward programs measured
    # slightly WORSE with it (PERF.md round-5 A/B: corrector 0.621 vs
    # 0.612 s, 2D step -11%)
    _jit = _sharded_jit(mesh, batch_axis, "rbv", out_kinds="r", donate=False)
    _jit_sub = _sharded_jit(mesh, batch_axis, "rbv", out_kinds="rrbb",
                            donate=False)

    @_jit
    def val_opt_step(state: GANTrainState, batch, w):
        x = val_cfg_scaler(batch.astype(jnp.float32))[..., None]
        real_logits = _apply(critic, state.critic_params, state.critic_stats, x, train=False)
        return _masked_mean(real_logits, w)

    @_jit_sub
    def val_subopt_step(state: GANTrainState, batch, w):
        x = val_cfg_scaler(batch.astype(jnp.float32))[..., None]
        atten = _apply(generator, state.gen_params, state.gen_stats, x, train=False)
        sample_hat = x - atten
        fake_logits = _apply(
            critic, state.critic_params, state.critic_stats, sample_hat, train=False
        )
        loss_fake = _masked_mean(fake_logits, w)
        loss_sim = _masked_zncc(sample_hat, x, w)
        return loss_fake, loss_sim, sample_hat, atten

    return val_opt_step, val_subopt_step


def build_preview_step(
    generator: nn.Module,
    cfg: StepConfig,
    mesh: Optional[jax.sharding.Mesh] = None,
    batch_axis: str = "data",
):
    """Reproduce the on-device augmentation of a given train step for image
    logging: the reference logs the batch the step actually trained on
    (Trainer.py:187-203). ``rng_key`` is the state's PRNG key *before* that
    step — the same k_aug split chain as ``_common``/``combined_step`` is
    re-derived, so the returned (scaled) sub-optimal batch, reconstruction
    and attenuation match what the step saw. Only needed when
    ``cfg.augment`` is set (host-augmented batches arrive pre-augmented)."""
    assert cfg.augment is not None
    _jit = _sharded_jit(mesh, batch_axis, "rrbb", out_kinds="bbbb",
                        donate=False)  # eval-mode program: no options (see
    # build_val_steps note)

    @_jit
    def preview(state: GANTrainState, rng_key, subopt, mask):
        _, k_aug, _ = jax.random.split(rng_key, 3)
        _, k2 = jax.random.split(k_aug)  # _prepare_batches: k2 -> sub-optimal
        subopt = subopt.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        subopt, mask = augment_batch(subopt, mask, k2, cfg.augment)
        x = cfg.scaler(subopt).astype(cfg.dtype)[..., None]
        atten = _apply(generator, state.gen_params, state.gen_stats, x, train=False)
        return x, x - atten, atten, mask

    return preview

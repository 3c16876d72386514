"""Optimizer / LR-schedule factories (optax).

Capability parity with the reference's torch optimizers (``experiments/
basic_conf.py:33-37,56-66``, ``gradient_penalty_conf.py:7-11``,
``rmsprop_conf.py``): Adam(lr 2e-4, betas (0.5, 0.999)) or RMSprop, with a
MultiStepLR-style piecewise-constant decay (milestones [6k, 8k], gamma 0.1).
The schedule counts *updates of that optimizer* — matching torch semantics
where each network's scheduler steps only when that network trains (so with
``train_generator_every=5`` the generator decays 5x slower in wall-iterations,
a reference behavior kept deliberately). Weight clipping (WGAN) is exposed as
a pure function applied after the critic update (reference Trainer.py:136-137).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def multistep_schedule(
    lr: float, milestones: Optional[Sequence[int]] = None, gamma: float = 0.1
) -> optax.Schedule:
    """torch MultiStepLR equivalent: lr * gamma^(#milestones passed)."""
    if not milestones:
        return optax.constant_schedule(lr)
    return optax.piecewise_constant_schedule(
        init_value=lr, boundaries_and_scales={int(m): gamma for m in milestones}
    )


def make_optimizer(
    kind: str = "adam",
    lr: float = 2e-4,
    betas: Tuple[float, float] = (0.5, 0.999),
    milestones: Optional[Sequence[int]] = None,
    lr_gamma: float = 0.1,
    eps: float = 1e-8,
    alpha: float = 0.99,  # rmsprop decay
) -> optax.GradientTransformation:
    schedule = multistep_schedule(lr, milestones, lr_gamma)
    if kind == "adam":
        return optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    if kind == "rmsprop":
        # torch RMSprop puts eps OUTSIDE the sqrt (g / (sqrt(v) + eps));
        # optax's default is inside — eps_in_sqrt=False matches torch's
        # update exactly (verified numerically vs torch.optim.RMSprop;
        # tests/test_reference_parity_numpy.py::test_optimizer_update_parity)
        return optax.rmsprop(schedule, decay=alpha, eps=eps, eps_in_sqrt=False)
    if kind == "sgd":
        return optax.sgd(schedule)
    raise ValueError(f"Unknown optimizer kind {kind!r}")


def clip_params(params, clip: float):
    """WGAN weight clipping: clamp every parameter into [-clip, clip]
    (reference Trainer.py:136-137 clamps all critic parameters)."""
    return jax.tree_util.tree_map(lambda p: jnp.clip(p, -clip, clip), params)

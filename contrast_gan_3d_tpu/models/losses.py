"""WGAN losses as pure JAX functions.

Capability/numeric parity with reference ``contrast_gan_3D/model/loss.py`` and
``model/utils.py:12-41``:

- :func:`wasserstein_loss` — mean(fake) - mean(real) (loss.py:74-80).
- :func:`zncc_loss` — negative zero-normalized cross-correlation with an
  eps-stabilized std gradient. The reference implements a hand-written
  ``StableStd`` autograd.Function whose backward is the true unbiased-std
  gradient with an epsilon-guarded denominator (loss.py:11-29); here that is a
  ``jax.custom_vjp`` — same forward (ddof=1 std), same backward.
- :func:`hu_loss` — masked two-sided MSE corridor on centerline voxels with a
  NaN-safe denominator (loss.py:44-71).
- :func:`gradient_penalty` — WGAN-GP: eps-interpolate real/fake, differentiate
  the critic wrt its input, penalize ||grad||_2 away from 1 (model/utils.py:
  12-41). Double differentiation is native in JAX — no retain_graph gymnastics.
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def wasserstein_loss(fake: jax.Array, real: Optional[jax.Array] = None) -> jax.Array:
    ret = jnp.mean(fake)
    if real is not None:
        ret = ret - jnp.mean(real)
    return ret


@jax.custom_vjp
def stable_std(x: jax.Array) -> jax.Array:
    return jnp.std(x, ddof=1)


def _stable_std_fwd(x):
    res = jnp.std(x, ddof=1)
    return res, (x, res)


def _stable_std_bwd(residuals, g):
    x, std = residuals
    n = x.size
    # reference backward (loss.py:22-29): (2/(n-1)) * g / (2*std + 1e-6) * (x - mean)
    grad = (2.0 / (n - 1.0)) * (g / (std * 2 + 1e-6)) * (x - jnp.mean(x))
    return (grad,)


stable_std.defvjp(_stable_std_fwd, _stable_std_bwd)


def zncc_loss(source: jax.Array, target: jax.Array) -> jax.Array:
    """-ZNCC(source, target) over the whole batch (reference loss.py:32-41)."""
    cc = jnp.mean((source - jnp.mean(source)) * (target - jnp.mean(target)))
    std = stable_std(source) * stable_std(target)
    return -(cc / (std + 1e-8))


def hu_loss(
    batch: jax.Array,
    mask: jax.Array,
    min_hu: float,
    max_hu: float,
) -> jax.Array:
    """Two-sided HU-corridor MSE on masked (centerline) voxels. ``min_hu`` /
    ``max_hu`` are in *scaled* units (the scaler is applied to
    DESIRED_HU_BOUNDS upstream, reference train.py:146)."""
    below = jnp.square(jnp.minimum(batch, min_hu) - min_hu)
    above = jnp.square(jnp.maximum(batch, max_hu) - max_hu)
    loss = (below + above) * mask
    safe_denominator = jnp.sum(mask) + 1e-8
    return jnp.sum(loss) / safe_denominator


def gradient_penalty(
    critic_fn: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
    key: jax.Array,
    lambda_: float = 10.0,
    eps: Optional[jax.Array] = None,
) -> jax.Array:
    """WGAN-GP on eps-interpolated samples.

    ``critic_fn`` must be a closed-over apply function (params baked in): the
    penalty differentiates wrt the *input*, and the caller differentiates the
    whole thing wrt params — nested jax.grad handles the double backward.
    When batch sizes differ, both are resampled to the smaller one (reference
    model/utils.py:21-26).
    """
    n = min(real.shape[0], fake.shape[0])
    if real.shape[0] != fake.shape[0]:
        kr, kf, key = jax.random.split(key, 3)
        real = real[jax.random.randint(kr, (n,), 0, real.shape[0])]
        fake = fake[jax.random.randint(kf, (n,), 0, fake.shape[0])]
    if eps is None:  # fixed eps: deterministic penalty (parity tests)
        eps_shape = (n,) + (1,) * (real.ndim - 1)
        eps = jax.random.uniform(key, eps_shape, dtype=real.dtype)
    interp = eps * real + (1.0 - eps) * fake

    def critic_sum(x):
        return jnp.sum(critic_fn(x))

    grads = jax.grad(critic_sum)(interp)
    grad_norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(n, -1)), axis=-1) + 1e-12)
    return lambda_ * jnp.mean(jnp.square(grad_norms - 1.0))


def scale_bounds(scaler, bounds: Tuple[float, float]) -> Tuple[float, float]:
    """Apply the intensity scaler to the desired HU corridor (train.py:146)."""
    return tuple(float(scaler(jnp.float32(b))) for b in bounds)

"""Golden-value tests for the WGAN losses (formulas from SURVEY.md §2.1 /
reference model/loss.py semantics, computed independently in numpy)."""

import jax
import jax.numpy as jnp
import numpy as np

from contrast_gan_3d_tpu.models.losses import (
    gradient_penalty,
    hu_loss,
    stable_std,
    wasserstein_loss,
    zncc_loss,
)


def test_wasserstein_loss(rng):
    fake = rng.normal(size=(4, 3, 3, 3, 1)).astype(np.float32)
    real = rng.normal(size=(4, 3, 3, 3, 1)).astype(np.float32)
    np.testing.assert_allclose(
        float(wasserstein_loss(jnp.asarray(fake), jnp.asarray(real))),
        fake.mean() - real.mean(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(wasserstein_loss(jnp.asarray(fake))), fake.mean(), rtol=1e-6
    )


def test_zncc_perfect_correlation(rng):
    x = rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32)
    # identical arrays: ZNCC -> ~1 (unbiased-std denominators), loss -> ~-1
    loss = float(zncc_loss(jnp.asarray(x), jnp.asarray(x)))
    # cc uses biased mean while std is unbiased (ddof=1), matching the
    # reference exactly: cc/var_unbiased = (n-1)/n
    n = x.size
    np.testing.assert_allclose(loss, -(n - 1) / n, rtol=1e-3)


def test_zncc_golden(rng):
    a = rng.normal(size=(512,)).astype(np.float32)
    b = rng.normal(size=(512,)).astype(np.float32)
    cc = ((a - a.mean()) * (b - b.mean())).mean()
    expected = -(cc / (a.std(ddof=1) * b.std(ddof=1) + 1e-8))
    np.testing.assert_allclose(
        float(zncc_loss(jnp.asarray(a), jnp.asarray(b))), expected, rtol=1e-5
    )


def test_stable_std_grad_matches_reference_backward(rng):
    x = rng.normal(size=(64,)).astype(np.float32)
    g = jax.grad(lambda v: stable_std(v))(jnp.asarray(x))
    n = x.size
    std = x.std(ddof=1)
    expected = (2.0 / (n - 1.0)) * (1.0 / (std * 2 + 1e-6)) * (x - x.mean())
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4)


def test_hu_loss_inside_corridor_is_zero(rng):
    batch = jnp.full((2, 4, 4, 4, 1), 0.5)
    mask = jnp.ones_like(batch)
    assert float(hu_loss(batch, mask, 0.0, 1.0)) == 0.0


def test_hu_loss_golden(rng):
    batch = rng.normal(size=(2, 4, 4, 4, 1)).astype(np.float32) * 2
    mask = (rng.random(size=batch.shape) < 0.3).astype(np.float32)
    lo, hi = -0.5, 0.5
    below = np.square(np.minimum(batch, lo) - lo)
    above = np.square(np.maximum(batch, hi) - hi)
    expected = ((below + above) * mask).sum() / (mask.sum() + 1e-8)
    got = float(hu_loss(jnp.asarray(batch), jnp.asarray(mask), lo, hi))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_hu_loss_empty_mask_is_nan_safe():
    batch = jnp.full((1, 4, 4, 4, 1), 5.0)
    mask = jnp.zeros_like(batch)
    assert np.isfinite(float(hu_loss(batch, mask, 0.0, 1.0)))


def test_gradient_penalty_linear_critic(rng):
    # critic(x) = sum(w * x): grad wrt x is w everywhere, so the penalty is
    # exactly lambda * (||w|| - 1)^2 independent of the interpolation point.
    w = rng.normal(size=(4, 4)).astype(np.float32)
    critic_fn = lambda x: jnp.sum(x * w, axis=(1, 2), keepdims=True)
    real = jnp.asarray(rng.normal(size=(3, 4, 4)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(3, 4, 4)).astype(np.float32))
    gp = float(gradient_penalty(critic_fn, real, fake, jax.random.key(0), 10.0))
    expected = 10.0 * (np.linalg.norm(w) - 1.0) ** 2
    np.testing.assert_allclose(gp, expected, rtol=1e-4)


def test_gradient_penalty_unequal_batches(rng):
    critic_fn = lambda x: jnp.sum(x, axis=(1, 2), keepdims=True)
    real = jnp.asarray(rng.normal(size=(6, 4, 4)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(3, 4, 4)).astype(np.float32))
    gp = float(gradient_penalty(critic_fn, real, fake, jax.random.key(1)))
    assert np.isfinite(gp)


def test_gradient_penalty_is_differentiable_wrt_params(rng):
    # double-backward: grad of the penalty wrt critic weights must exist
    w0 = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    real = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))

    def penalty(w):
        critic_fn = lambda x: jnp.tanh(jnp.sum(x * w, axis=(1, 2), keepdims=True))
        return gradient_penalty(critic_fn, real, fake, jax.random.key(2))

    g = jax.grad(penalty)(w0)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0

"""Memory-lean BatchNorm must match flax nn.BatchNorm (same params /
batch_stats structure, same outputs). One DELIBERATE divergence: the
running-var EMA uses the UNBIASED batch variance (n/(n-1)) — torch
semantics, required for live train-step parity with the reference
(tests/test_reference_parity_train.py); flax uses the biased variance."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from contrast_gan_3d_tpu.models.norm import BatchNorm


def _pair(rng, shape=(4, 6, 6, 6, 5)):
    x = jnp.asarray(rng.normal(2.0, 3.0, shape), jnp.float32)
    ours = BatchNorm(use_running_average=False)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v_ours = ours.init(jax.random.key(0), x)
    v_ref = ref.init(jax.random.key(0), x)
    return x, ours, ref, v_ours, v_ref


def test_structure_matches_flax(rng):
    x, ours, ref, v_ours, v_ref = _pair(rng)
    assert jax.tree_util.tree_structure(v_ours) == jax.tree_util.tree_structure(v_ref)


def test_train_mode_matches_flax(rng):
    x, ours, ref, v_ours, v_ref = _pair(rng)
    # randomize scale/bias so the affine path is exercised
    v = {
        "params": {"scale": jnp.asarray(rng.normal(1, 0.2, 5), jnp.float32),
                   "bias": jnp.asarray(rng.normal(0, 0.5, 5), jnp.float32)},
        "batch_stats": v_ref["batch_stats"],
    }
    y_ours, upd_ours = ours.apply(v, x, mutable=["batch_stats"])
    y_ref, upd_ref = ref.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(upd_ours["batch_stats"]["mean"]),
        np.asarray(upd_ref["batch_stats"]["mean"]),
        rtol=1e-5, atol=1e-6,
    )
    # running var: ours applies the torch n/(n-1) unbiased correction to the
    # batch-var term before the EMA; flax's is biased
    n = int(np.prod(x.shape[:-1]))
    m = 0.9
    flax_var = np.asarray(upd_ref["batch_stats"]["var"])
    init_var = np.ones_like(flax_var)
    batch_var = (flax_var - m * init_var) / (1 - m)
    want_var = m * init_var + (1 - m) * batch_var * n / (n - 1)
    np.testing.assert_allclose(
        np.asarray(upd_ours["batch_stats"]["var"]), want_var, rtol=1e-5, atol=1e-6
    )


def test_eval_mode_matches_flax(rng):
    x, _, _, _, _ = _pair(rng)
    ours = BatchNorm(use_running_average=True)
    ref = nn.BatchNorm(use_running_average=True)
    v = {
        "params": {"scale": jnp.full((5,), 1.3), "bias": jnp.full((5,), -0.2)},
        "batch_stats": {"mean": jnp.asarray(np.arange(5), jnp.float32),
                        "var": jnp.asarray(np.arange(1, 6), jnp.float32)},
    }
    np.testing.assert_allclose(
        np.asarray(ours.apply(v, x)), np.asarray(ref.apply(v, x)), atol=2e-5
    )


def test_bf16_compute_f32_stats(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 8, 4)), jnp.bfloat16)
    bn = BatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    v = bn.init(jax.random.key(0), x)
    y, upd = bn.apply(v, x, mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    assert upd["batch_stats"]["mean"].dtype == jnp.float32
    # normalized output: ~zero mean, ~unit variance
    yf = np.asarray(y, np.float32)
    assert abs(yf.mean()) < 0.05
    assert abs(yf.std() - 1.0) < 0.1

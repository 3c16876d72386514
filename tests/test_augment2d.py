"""2D augmentation tests (conf_2D parity: rotation + mirror)."""

import jax
import jax.numpy as jnp
import numpy as np

from contrast_gan_3d_tpu.data.augment import Augment2DConfig, augment_batch


def test_2d_dispatch_and_shapes(rng):
    d = jnp.asarray(rng.normal(size=(3, 12, 12)), jnp.float32)
    s = jnp.asarray((rng.random((3, 12, 12)) < 0.1).astype(np.float32))
    do, so = augment_batch(d, s, jax.random.key(0), Augment2DConfig())
    assert do.shape == d.shape and so.shape == s.shape
    assert np.isfinite(np.asarray(do)).all()
    # masks stay binary under nearest-neighbour sampling
    assert set(np.unique(np.asarray(so))) <= {0.0, 1.0}


def test_2d_identity_when_disabled(rng):
    cfg = Augment2DConfig(do_rotation=False, do_mirror=False)
    d = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)
    s = jnp.zeros((2, 8, 8), jnp.float32)
    do, _ = augment_batch(d, s, jax.random.key(0), cfg)
    np.testing.assert_allclose(np.asarray(do), np.asarray(d), atol=1e-5)


def test_2d_deterministic_per_key(rng):
    d = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)
    s = jnp.zeros((2, 8, 8), jnp.float32)
    a1, _ = augment_batch(d, s, jax.random.key(7), Augment2DConfig())
    a2, _ = augment_batch(d, s, jax.random.key(7), Augment2DConfig())
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

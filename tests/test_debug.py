"""Checkify debugging helper tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.utils.debug import checkify_step


def test_checkify_catches_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    checked = checkify_step(bad)
    err, out = checked(jnp.asarray(-1.0))
    with pytest.raises(Exception, match="(?i)nan"):
        err.throw()  # must be the NaN check, not an unrelated failure


def test_checkify_passes_clean():
    def good(x):
        return x * 2.0

    checked = checkify_step(good)
    err, out = checked(jnp.asarray(3.0))
    err.throw()  # no error
    assert float(out) == 6.0

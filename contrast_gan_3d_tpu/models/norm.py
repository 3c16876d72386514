"""Memory-lean BatchNorm (drop-in for ``nn.BatchNorm``).

flax's BatchNorm materializes an f32 copy of the full activation for the
(x - mean) step; at this model's full-resolution stages (128^3 x 16 ch) XLA
additionally picks an 8x-padded layout for that copy (16 channels in the
128-lane dim), which alone overflows a 16 GB chip during the backward of a
batch-12 train step. This implementation never materializes x in f32:
statistics are computed with f32 ACCUMULATION over bf16 inputs
(``jnp.mean(..., dtype=f32)`` — XLA fuses the square into the reduce), and
normalization collapses to a single fused multiply-add in the compute dtype
(``y = x * mult + add`` with per-channel f32 scalars folded on the side).

Variable structure and initializers are identical to ``nn.BatchNorm`` —
params {scale, bias}, batch_stats {mean, var} — so checkpoint TOPOLOGY
interchanges freely. One deliberate semantic divergence from flax: the
running-variance EMA uses torch's UNBIASED n/(n-1) estimator (flax updates
with the biased batch variance) for reference parity — see the inline
comment at the update site; long-trained running_var drifts ~1/n per update
between the two conventions, so eval-mode outputs are flax-equal only at
init, torch-equal always (tests/test_reference_parity_train.py).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = (
            use_running_average
            if use_running_average is not None
            else self.use_running_average
        )
        C = x.shape[-1]
        axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (C,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (C,)
        )
        scale = (
            self.param("scale", nn.initializers.ones_init(), (C,), jnp.float32)
            if self.use_scale
            else jnp.ones((C,), jnp.float32)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (C,), jnp.float32)
            if self.use_bias
            else jnp.zeros((C,), jnp.float32)
        )

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            # f32 ACCUMULATION over the compute-dtype input; no f32 copy of x
            mean = jnp.mean(x, axes, dtype=jnp.float32)
            mean2 = jnp.mean(jnp.square(x), axes, dtype=jnp.float32)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                # torch semantics (reference parity, locked by
                # tests/test_reference_parity_train.py): the running update
                # uses the UNBIASED batch variance (n/(n-1)) while
                # normalization uses the biased one; flax uses biased for
                # both — a ~1/n relative drift per update
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / (n - 1)) if n > 1 else var
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased

        # fold everything into one fused multiply-add in the compute dtype
        mult = scale / jnp.sqrt(var + self.epsilon)
        add = bias - mean * mult
        dtype = self.dtype or x.dtype
        return x.astype(dtype) * mult.astype(dtype) + add.astype(dtype)

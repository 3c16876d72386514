"""Numerical debugging helpers (reference capability: ``--debug`` ->
``torch.autograd.set_detect_anomaly``, train.py:242-247).

Two tiers, both TPU-safe:
- :func:`enable_nan_debugging` — global ``jax_debug_nans`` (recompiles
  programs with NaN checks; coarse but zero code changes).
- :func:`checkify_step` — wrap one step function with
  ``jax.experimental.checkify`` float checks: errors carry the exact failing
  primitive and location, and surface on the host as the step's extra return
  value (call ``err.throw()``).
"""

from typing import Callable

import jax
from jax.experimental import checkify


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a (possibly jitted) step function with float checkification.

    Returns ``checked(*args) -> (err, out)``; call ``err.throw()`` on host to
    raise a located error (NaN/inf/div-by-zero) from inside the compiled
    program — the analogue of torch anomaly mode for XLA programs.
    """
    return checkify.checkify(step_fn, errors=checkify.float_checks)

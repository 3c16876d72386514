"""Driver-contract tests: __graft_entry__.entry compiles single-chip and
dryrun_multichip runs a full sharded step on the virtual CPU mesh."""

import sys

import jax
import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))  # repo root


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape
    assert out.dtype == args[1].dtype


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(2)

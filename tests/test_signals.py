"""Shared graceful-stop signal wiring (`utils/signals.py`) — the one
implementation behind training preemption, batch-correction interrupt and
the serving daemon's drain."""

import signal as sig
import threading
import time

import pytest

from contrast_gan_3d_tpu.utils.signals import install_graceful_stop


def test_first_signal_graceful_second_escalates_and_restores():
    stop = threading.Event()
    seen = []
    prev = install_graceful_stop(
        lambda name: (seen.append(name), stop.set()), stop.is_set,
        (sig.SIGUSR1,),
    )
    assert prev is not None
    try:
        sig.raise_signal(sig.SIGUSR1)
        time.sleep(0)  # let the handler run at a bytecode boundary
        assert stop.is_set() and seen == ["SIGUSR1"]
        with pytest.raises(KeyboardInterrupt, match="SIGUSR1 received twice"):
            sig.raise_signal(sig.SIGUSR1)
            time.sleep(0)
        # escalation restored the previous handler before raising
        assert sig.getsignal(sig.SIGUSR1) is prev[sig.SIGUSR1]
    finally:
        for signum, handler in prev.items():
            sig.signal(signum, handler)


def test_off_main_thread_installs_nothing():
    """signal.signal is main-thread-only: embedded runs (tests/notebooks
    driving a CLI main() off-thread) must get None back, not a crash."""
    out = {}

    def run():
        out["prev"] = install_graceful_stop(lambda name: None, lambda: False)

    before = sig.getsignal(sig.SIGTERM)
    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert out["prev"] is None
    assert sig.getsignal(sig.SIGTERM) is before

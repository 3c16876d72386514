"""First-signal-graceful / second-signal-escalate OS signal wiring.

One implementation for the three graceful-stop surfaces — training
preemption (``trainer.install_preemption_handler``), batch correction
(``scripts/correct_scans.py``) and the serving daemon
(``serving.CorrectionServer.serve_until_signaled``). The reference has no
analogue anywhere: a SIGTERM kills it mid-iteration/mid-write.
"""

import signal
import threading
from typing import Callable, Dict, Optional, Tuple

__all__ = ["install_graceful_stop"]


def install_graceful_stop(
    on_stop: Callable[[str], None],
    is_stopped: Callable[[], bool],
    signums: Tuple[int, ...] = (signal.SIGTERM, signal.SIGINT),
) -> Optional[Dict[int, object]]:
    """Route ``signums`` to a graceful stop, escalating on re-delivery.

    The first delivery calls ``on_stop(signal_name)``; a second delivery
    while ``is_stopped()`` is already true restores the previous handler for
    that signal and raises ``KeyboardInterrupt`` — the escape hatch for runs
    wedged past the graceful path (e.g. inside a device call).

    CPython restricts ``signal.signal`` to the main thread; when called off
    the main thread (tests/notebooks embedding a run) this installs nothing
    and returns ``None``. Otherwise returns ``{signum: previous_handler}``
    so callers can restore (nested runs, per-fold scopes).
    """
    if threading.current_thread() is not threading.main_thread():
        return None
    previous: Dict[int, object] = {}

    def _handler(signum, frame):
        name = signal.Signals(signum).name
        if is_stopped():  # second signal: escalate
            signal.signal(signum, previous[signum])
            raise KeyboardInterrupt(
                f"{name} received twice — aborting without waiting for the "
                "graceful stop"
            )
        on_stop(name)

    for signum in signums:
        previous[signum] = signal.signal(signum, _handler)
    return previous

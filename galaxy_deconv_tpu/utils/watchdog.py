"""Stall watchdog: failure detection for wedged device calls.

The reference has no failure-detection machinery (SURVEY.md §5); the one
real failure mode this framework has hit in production is a *wedged
device RPC*: the remote-TPU connection drops a response and the training
process blocks in a socket read forever while the device itself stays
healthy for new clients.  No exception is ever raised, so in-process
recovery (try/except, retries) cannot see it.

:class:`StallWatchdog` is the TPU-native answer: a daemon thread that is
``beat()`` after every completed step; if no beat arrives within
``timeout_s`` it invokes ``on_stall`` — by default logging a CRITICAL
diagnosis and hard-exiting the process with a distinctive status
(:data:`STALL_EXIT_CODE`) so a supervising driver (shell loop, scheduler,
``scripts/retrain_zoo_fixed_sim.sh``) can restart from the last
checkpoint.  Hard exit is deliberate: the blocked thread is inside a C
extension socket read and cannot be interrupted from Python.

Usage::

    with StallWatchdog(timeout_s=300, name="train") as dog:
        for step in range(n):
            state, loss = train_step(state, key)   # may block forever
            dog.beat()
"""

from __future__ import annotations

import logging
import os
import threading
import time
from typing import Callable, Optional

logger = logging.getLogger("galaxy_deconv_tpu.utils.watchdog")

#: exit status used by the default on_stall handler (EX_TEMPFAIL: the
#: condition is transient — a supervisor should retry from the last
#: checkpoint)
STALL_EXIT_CODE = 75


def _default_on_stall(name: str, elapsed: float) -> None:
    logger.critical(
        "watchdog '%s': no progress for %.0fs — device call presumed wedged; "
        "exiting with status %d for supervisor restart", name, elapsed, STALL_EXIT_CODE
    )
    os._exit(STALL_EXIT_CODE)


class StallWatchdog:
    """Daemon-thread progress monitor.  ``beat()`` after each unit of
    progress; ``on_stall(name, elapsed_s)`` fires once if beats stop for
    longer than ``timeout_s``.  ``timeout_s=None`` disables (no thread)."""

    def __init__(
        self,
        timeout_s: Optional[float],
        name: str = "watchdog",
        on_stall: Callable[[str, float], None] = _default_on_stall,
        poll_s: Optional[float] = None,
    ):
        self.timeout_s = timeout_s
        self.name = name
        self.on_stall = on_stall
        self.poll_s = poll_s if poll_s is not None else (
            min(5.0, timeout_s / 4.0) if timeout_s else 5.0
        )
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def beat(self) -> None:
        self._last = time.monotonic()

    def start(self) -> "StallWatchdog":
        if self.timeout_s and self._thread is None:
            self._last = time.monotonic()
            self._thread = threading.Thread(target=self._run, name=self.name, daemon=True)
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self.poll_s)
            self._thread = None

    def _run(self) -> None:
        while not self._stop.wait(self.poll_s):
            elapsed = time.monotonic() - self._last
            if elapsed > self.timeout_s:
                self.on_stall(self.name, elapsed)
                return

    def __enter__(self) -> "StallWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

"""Stall watchdog for wedged device sessions.

The tunneled TPU relay is effectively single-tenant: a second device client
(or a dropped tunnel) can leave a long-running training process blocked
forever inside a device fetch (futex wait) with no exception ever raised —
observed in round 2 as a silently dead MoveBucket run.  The reference has
nothing comparable (SURVEY §5.3: a crashed rank is fatal); this EXCEEDS it
the same way replay snapshotting does.

Design: the training loop "pets" the watchdog at every point of forward
progress (each collect/update cycle, around evals and checkpoints).  A
daemon thread checks the last-pet age; past ``timeout_s`` it runs the
optional ``on_stall`` callback in a side thread with a hard budget (a wedged
device usually makes state fetches hang too — the callback must only touch
HOST state, e.g. mark the work dir), then terminates the process with
``exit_code`` via ``os._exit`` (regular ``sys.exit`` would block on the
wedged thread).  A supervisor rerunning the CLI with ``--auto-resume`` then
continues warm from the last checkpoint + replay snapshot.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, Optional

from .logger import get_logger


class StallWatchdog:
    DEFAULT_EXIT_CODE = 3

    def __init__(
        self,
        timeout_s: float,
        on_stall: Optional[Callable[[], None]] = None,
        poll_s: float = 5.0,
        exit_code: int = DEFAULT_EXIT_CODE,
        callback_budget_s: float = 60.0,
        _exit=os._exit,  # injectable for tests
    ):
        assert timeout_s > 0
        self.timeout_s = float(timeout_s)
        self.poll_s = min(float(poll_s), self.timeout_s / 2)
        self.on_stall = on_stall
        self.exit_code = int(exit_code)
        self.callback_budget_s = float(callback_budget_s)
        self._exit = _exit
        self._last_pet = time.monotonic()
        self._paused = False
        self._stop = threading.Event()
        self.fired = False
        self._thread = threading.Thread(target=self._run, name="pcrl-stall-watchdog", daemon=True)
        self._thread.start()

    def pet(self) -> None:
        self._last_pet = time.monotonic()

    def pause(self) -> None:
        """Suspend stall detection (e.g. around a known-long first compile)."""
        self._paused = True

    def resume(self) -> None:
        self._last_pet = time.monotonic()
        self._paused = False

    def stop(self) -> None:
        self._stop.set()

    # ------------------------------------------------------------------
    def _run(self) -> None:
        log = get_logger("pcrl.watchdog")
        while not self._stop.wait(self.poll_s):
            if self._paused:
                continue
            age = time.monotonic() - self._last_pet
            if age < self.timeout_s:
                continue
            self.fired = True
            log.error(
                f"Stall watchdog: no progress for {age:.0f}s (> {self.timeout_s:.0f}s) — "
                f"device session presumed wedged; exiting {self.exit_code} for auto-resume"
            )
            if self.on_stall is not None:
                done = threading.Event()

                def _cb():
                    try:
                        self.on_stall()
                    except Exception as e:  # the callback must never block the exit
                        log.error(f"Stall callback failed: {e!r}")
                    finally:
                        done.set()

                t = threading.Thread(target=_cb, daemon=True)
                t.start()
                done.wait(self.callback_budget_s)
            self._exit(self.exit_code)
            return  # only reachable with an injected _exit (tests)

"""Graceful preemption handling.

The reference has no failure handling beyond a black-image decode fallback
(SURVEY §5.3).  Production TPU fleets preempt VMs with a SIGTERM grace
window; this module lets the engines finish the round in flight, write the
round checkpoint, and exit cleanly instead of dying mid-update (the next
launch resumes from ``--checkpoint_dir``).

Usage (both engines do this when a checkpoint_dir is configured)::

    with GracefulPreemption() as stop:
        for r in rounds:
            run_round(r); save_checkpoint(r)
            if stop.requested:
                break

Multi-host: signal delivery is per-process, so the SPMD engine must reach
ROUND-LEVEL consensus before breaking (one process leaving the collective
round loop early would deadlock the rest at the next psum) — see
:meth:`GracefulPreemption.any_process_requested`.
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger("feddat_tpu")


class GracefulPreemption:
    """Context manager that latches SIGTERM (and optionally others) into a
    flag instead of killing the process.  Handlers are installed on enter
    and the previous ones restored on exit; a second signal while latched
    still only sets the flag (the engine is finishing its round).  No-op
    (flag stays False, no handlers touched) when ``enabled`` is False or
    when not running in the main thread (CPython restricts ``signal.signal``
    to the main thread — e.g. engines driven from a test worker thread).
    """

    def __init__(self, enabled: bool = True, signals=(signal.SIGTERM,)):
        self.enabled = enabled
        self.signals = tuple(signals)
        self._prev = {}
        self.requested = False

    def _handler(self, signum, frame):
        if not self.requested:
            logger.warning(
                "signal %s received: finishing the current round, "
                "checkpointing, then exiting cleanly", signal.Signals(signum).name,
            )
        self.requested = True

    def __enter__(self):
        if self.enabled and threading.current_thread() is threading.main_thread():
            for s in self.signals:
                self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        return False

    def any_process_requested(self) -> bool:
        """Multi-host consensus: True when ANY process latched a signal.

        One tiny allgather per call — the SPMD engine calls this once per
        round so every process leaves the collective loop at the same round
        boundary (a lone early exit would deadlock the others at the next
        collective).  Single-process: just the local flag.
        """
        import jax

        if jax.process_count() == 1:
            return self.requested
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([1 if self.requested else 0], np.int32), tiled=True
        )
        return bool(np.asarray(flags).max())

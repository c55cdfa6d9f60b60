"""Small driver-side utilities mirrored from the reference's toolbox."""

from __future__ import annotations

import logging
import time


def format_runtime(seconds: float) -> str:
    """Human-readable runtime (reference: dbqt/tools/utils.py:157-169)."""
    seconds = int(seconds)
    hours, rem = divmod(seconds, 3600)
    minutes, secs = divmod(rem, 60)
    if hours:
        return f"{hours}h {minutes}m {secs}s"
    if minutes:
        return f"{minutes}m {secs}s"
    return f"{secs}s"


class Timer:
    """Context-manager timer logging elapsed runtime on exit
    (reference: dbqt/tools/utils.py Timer usage across tools)."""

    def __init__(self, label: str = "run", logger: logging.Logger | None = None):
        self.label = label
        self.logger = logger or logging.getLogger("dbqt_spark")
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0
        self.logger.info("%s completed in %s", self.label, format_runtime(self.elapsed))

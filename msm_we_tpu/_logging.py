"""Logging and progress-reporting utilities.

Capability parity with the reference's ``msm_we/_logging.py:7-43`` (RichHandler
logger, ``DefaultProgress``, ``ProgressBar`` context manager), implemented without
a hard dependency on ``rich`` -- if rich is unavailable we fall back to plain
logging and no-op progress objects so the compute paths never depend on a TTY.
"""
from __future__ import annotations

import logging

try:  # pragma: no cover - cosmetic only
    from rich.logging import RichHandler

    _handler: logging.Handler = RichHandler()
except Exception:  # pragma: no cover
    _handler = logging.StreamHandler()

log = logging.getLogger("msm_we_tpu")
if not log.handlers:
    log.addHandler(_handler)
# INFO by default, like the reference (_logging.py:16): without this,
# propagate=False + the root's WARNING default would silently drop every
# stage-timing report and plugin lifecycle message in the package. Only
# applied when unset, so embedders (e.g. bench.py's one-JSON-line stdout
# contract) can pin a level BEFORE importing the package
if log.level == logging.NOTSET:
    log.setLevel(logging.INFO)
log.propagate = False


class _NullTask:
    pass


class DefaultProgress:
    """Minimal stand-in for a ``rich.progress.Progress`` object.

    Mirrors the API surface the pipeline uses (``add_task``, ``update``,
    ``advance``) so callers can pass a real rich Progress or nothing at all.
    """

    def add_task(self, description="", total=None, completed=0, **kwargs):
        return _NullTask()

    def update(self, task, advance=None, visible=True, **kwargs):
        return None

    def advance(self, task, advance=1):
        return None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class ProgressBar:
    """Context manager wrapping an optional progress object.

    Reference behavior: ``msm_we/_logging.py:22-43`` -- enter/exit semantics that
    pass through a shared progress object, or construct a default one.
    """

    def __init__(self, progress_bar=None):
        self.progress_bar = progress_bar if progress_bar is not None else DefaultProgress()

    def __enter__(self):
        return self.progress_bar

    def __exit__(self, *exc):
        return False

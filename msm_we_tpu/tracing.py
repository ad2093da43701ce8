"""Structured per-stage timing and optional JAX profiler traces.

The reference's only observability is a rich Live step table with check-marks
(``msm_we.py:529-586``) and ad-hoc ``time.perf_counter`` calls. Here every
pipeline stage records wall-clock into a structured report, and a profiler
context can wrap any stage with a TensorBoard-compatible JAX trace.
"""
from __future__ import annotations

import contextlib
import json
import time

from ._logging import log

__all__ = ["StageTimer", "profile_trace"]


class StageTimer:
    """Collects named stage durations; renderable as text or JSON."""

    def __init__(self):
        self.stages = []  # list of (name, seconds, note)

    @contextlib.contextmanager
    def stage(self, name, note=""):
        # Append at entry so set_note() inside the block targets this stage
        self.stages.append((name, 0.0, note))
        idx = len(self.stages) - 1
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            elapsed = time.perf_counter() - t0
            n, _, note_now = self.stages[idx]
            self.stages[idx] = (n, elapsed, note_now)
            log.info(f"[stage] {name}: {elapsed:.3f}s {note_now}")

    def set_note(self, note):
        if self.stages:
            name, elapsed, _ = self.stages[-1]
            self.stages[-1] = (name, elapsed, note)

    @property
    def total(self):
        return sum(s[1] for s in self.stages)

    def as_dict(self):
        return {
            "stages": [
                {"name": n, "seconds": round(s, 4), "note": note}
                for n, s, note in self.stages
            ],
            "total_seconds": round(self.total, 4),
        }

    def report(self):
        lines = ["haMSM build timing:"]
        for name, seconds, note in self.stages:
            lines.append(f"  {name:<32s} {seconds:8.3f}s  {note}")
        lines.append(f"  {'TOTAL':<32s} {self.total:8.3f}s")
        return "\n".join(lines)

    def to_json(self, path):
        with open(path, "w") as fp:
            json.dump(self.as_dict(), fp, indent=2)


@contextlib.contextmanager
def profile_trace(log_dir=None):
    """Optionally wrap a block in a JAX profiler trace (TensorBoard format).

    No-op when ``log_dir`` is None, so callers can pass a config value
    straight through.
    """
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info(f"JAX profiler trace written to {log_dir}")

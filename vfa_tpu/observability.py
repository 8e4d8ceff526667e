"""Observability: metrics writers, profiler tracing, numerics debugging.

The reference's observability is tensorboardX scalars/figures + hand-rolled
wall-clock timers (`vfa/trainer.py:19-20,44-45`; `train.py:153-156`). Here:

  * MetricsWriter — TensorBoard scalars/figures (torch.utils.tensorboard)
    plus an always-on jsonl mirror (machine-readable, no TB needed);
  * profile_trace — a context manager around jax.profiler for step traces
    viewable in TensorBoard / Perfetto (replaces the hand timers);
  * enable_nan_debugging — jax_debug_nans for fail-fast numerics
    (SURVEY.md §5: the reference has no sanitizers at all).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricsWriter:
    """Scalars to TensorBoard (if available) + metrics.jsonl, figures to TB."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(logdir, "tensorboard"))
        except Exception:  # noqa: BLE001 — TB optional
            pass

    def scalars(self, tag: str, values: dict, step: int):
        rec = {"tag": tag, "step": step, "time": time.time(), **values}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb:
            for k, v in values.items():
                self._tb.add_scalar(f"{tag}/{k}", float(v), step)

    def text(self, tag: str, content: str, step: int = 0):
        if self._tb:
            self._tb.add_text(tag, content, step)

    def figure(self, tag: str, fig, step: int):
        if self._tb:
            self._tb.add_figure(tag, fig, step)

    def close(self):
        self._jsonl.close()
        if self._tb:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging():
    """Fail fast on NaNs in any jitted computation (debug runs only)."""
    import jax

    jax.config.update("jax_debug_nans", True)

"""Profiling / tracing subsystem.

The reference has no profiler hooks at all (SURVEY.md §5.1 — tqdm bars
only); on TPU this is a first-class subsystem: XLA device traces via
jax.profiler (viewable in xprof/tensorboard-profile), host-side scope
annotations that show up inside those traces, and a step timer that is
honest about the async dispatch + tunneled-device pitfalls (naive
per-step wall clocks measure enqueue time, not device time — see
bench.py's marginal-cost protocol).

Usage:
    from deepfepe_tpu.utils.profiling import device_trace, annotate

    with device_trace("logs/exp0/trace"):
        for _ in range(20):
            state, m = train_step(state, batch)

    with annotate("data-prep"):
        batch = next(stream)

Trainer integration: set training.profile_dir in the config (or
--profile_dir on the CLI) and iterations [profile_start,
profile_start + profile_steps) of Trainer.fit are traced.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import numpy as np

import jax

# Host-side scope annotation that appears on the trace timeline.
annotate = jax.profiler.TraceAnnotation


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA/TPU profiler trace of the enclosed block into
    log_dir (xprof format; open with tensorboard --logdir or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timer with a sync-aware summary.

    Records enqueue-to-enqueue times; `summary()` reports the steady-state
    median over the second half, which converges to true step time when
    the dispatch queue is saturated (steps chain on device). For exact
    numbers use the marginal-cost protocol (bench.py).
    """

    def __init__(self, path: Optional[str] = None):
        self._t = []
        self._last = None
        self._path = path

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._t.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        if not self._t:
            return {"steps": 0}
        arr = np.asarray(self._t[len(self._t) // 2 :])
        out = {
            "steps": len(self._t),
            "median_step_s": float(np.median(arr)),
            "mean_step_s": float(np.mean(arr)),
        }
        if self._path:
            with open(self._path, "a") as f:
                f.write(json.dumps(out) + "\n")
        return out

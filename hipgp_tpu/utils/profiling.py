"""Tracing and phase timing.

The reference's observability is ad-hoc `time.time()` prints aggregated to
time_report.csv (`ziggy/svi_gp.py:285-388,426-440`); here: a `PhaseTimer`
that brackets device work with `block_until_ready`, and a `trace` context
manager around `jax.profiler` for real TPU timelines (view with
tensorboard / xprof).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import pandas as pd

__all__ = ["PhaseTimer", "trace"]


class PhaseTimer:
    """Accumulate wall-clock per named phase, device-synchronized.

    >>> t = PhaseTimer()
    >>> with t("fit"):
    ...     state = train_step(...)   # any jax values returned are synced
    >>> t.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str):
        (jax.device_put(0.0)).block_until_ready()  # drain pending work
        t0 = time.perf_counter()
        try:
            yield
        finally:
            (jax.device_put(0.0)).block_until_ready()
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def report(self) -> pd.DataFrame:
        rows = [
            {
                "phase": k,
                "total_s": v,
                "calls": self.counts[k],
                "mean_s": v / max(self.counts[k], 1),
            }
            for k, v in self.totals.items()
        ]
        return pd.DataFrame(rows).set_index("phase")

    def to_csv(self, path: str) -> None:
        self.report().to_csv(path)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Performance measurement tools.

Rebuild of /root/reference/src/auxilliary/logging.py (PerformanceLog,
log_summary) and /root/reference/src/auxilliary/utils.py:11-46 (Averager).
Timers are host-side wall clocks; callers must block on device results inside
the timed region (the solve loops do ``jax.block_until_ready``) so jitted
dispatch does not leak out of the measurement — the TPU analogue of the
reference's synchronous PETSc solves.
"""

from time import perf_counter
from collections import defaultdict, namedtuple
from contextlib import ContextDecorator

import numpy as np

__all__ = ["PerformanceLog", "log_summary", "Averager"]


class PerformanceLog(ContextDecorator):
    """Accumulate wall-clock per label (reference logging.py:11-31)."""

    data = defaultdict(list)

    def __init__(self, label):
        self.label = label

    def __enter__(self):
        self.time = perf_counter()
        return self

    def __exit__(self, *exc):
        t_elapsed = perf_counter() - self.time
        PerformanceLog.data[self.label].append(t_elapsed)

    @classmethod
    def reset(cls):
        cls.data = defaultdict(list)


def log_summary():
    """Print an n_call/total/avg/std table sorted by total (logging.py:34-60)."""
    if len(PerformanceLog.data) == 0:
        return
    Timing = namedtuple("Timing", ["label", "n_call", "total", "avg", "std"])
    print(
        f"{'timer':>32s} : {'ncall':>6s}    {'total':>10s} {'avg':>10s} {'std':>10s}"
    )
    print(77 * "-")
    summary_data = []
    for label, timings in PerformanceLog.data.items():
        timings = np.asarray(timings)
        summary_data.append(
            Timing(label, len(timings), np.sum(timings), np.average(timings), np.std(timings))
        )
    for t in sorted(summary_data, key=lambda x: x.total, reverse=True):
        print(
            f"{t.label:>32s} : {t.n_call:6d}    {t.total:10.4e} {t.avg:10.4e} {t.std:10.4e}"
        )


class Averager:
    """Streaming mean (reference utils.py:11-46)."""

    def __init__(self):
        self.reset()

    @property
    def value(self):
        return self._average

    @property
    def n_samples(self):
        return self._n_samples

    def update(self, x):
        self._n_samples += 1
        self._average += (x - self._average) / self._n_samples

    def reset(self):
        self._n_samples = 0
        self._average = 0

    def __repr__(self):
        return f"{self.value} (averaged over {self.n_samples} samples)"

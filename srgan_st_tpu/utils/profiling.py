"""Tracing / profiling utilities.

The reference has no profiling beyond tqdm (SURVEY.md §5). TPU-native
replacements: a patches/sec/chip throughput meter (the north-star metric)
and an xprof-compatible `jax.profiler` trace context for kernel-level
inspection.
"""

from __future__ import annotations

import contextlib
import time

import jax


class ThroughputMeter:
    """Steady-state patches/sec/chip counter with warmup exclusion."""

    def __init__(self, n_chips: int | None = None, warmup_steps: int = 2):
        self.n_chips = n_chips or len(jax.devices())
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._steps = 0
        self._patches = 0
        self._start = None

    def step(self, n_patches: int) -> None:
        self._steps += 1
        if self._steps == self.warmup_steps:
            self._start = time.perf_counter()
            self._patches = 0
            return
        if self._steps > self.warmup_steps:
            self._patches += n_patches

    @property
    def patches_per_sec_per_chip(self) -> float:
        if self._start is None or self._patches == 0:
            return 0.0
        return self._patches / (time.perf_counter() - self._start) / self.n_chips


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None. View with
    xprof/tensorboard-profile."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

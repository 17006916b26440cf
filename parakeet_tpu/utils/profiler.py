"""Profiling hooks: windowed trace capture + wall timing.

Equivalent of the reference profiler integration (reference:
parakeet/utils/profiler.py:26-110 ProfilerOptions/add_profiler_step and
parakeet/utils/profile.py:21-37 synchronize/nvtx_span) mapped to the TPU
stack: ``jax.profiler`` trace windows (viewable in TensorBoard/Perfetto),
``block_until_ready`` for sync timing, and named trace annotations.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["ProfilerOptions", "add_profiler_step", "synchronize", "span",
           "StepTimer"]


class ProfilerOptions:
    """Parse 'batch_range=[50,60];profile_path=/tmp/trace;exit_on_finished
    =true' option strings (reference profiler.py:26-80)."""

    def __init__(self, options_str: Optional[str] = None):
        self.batch_range = [10, 20]
        self.profile_path = "/tmp/parakeet_tpu_profile"
        self.exit_on_finished = False
        if options_str:
            self._parse(options_str)
        self._started = False
        self._done = False

    def _parse(self, options_str: str):
        for kv in options_str.replace(" ", "").split(";"):
            if not kv:
                continue
            key, value = kv.split("=", 1)
            if key == "batch_range":
                vals = value.strip("[]").split(",")
                lo, hi = int(vals[0]), int(vals[1])
                if lo < 0 or hi <= lo:
                    raise ValueError(f"invalid batch_range {value}")
                self.batch_range = [lo, hi]
            elif key == "profile_path":
                self.profile_path = value
            elif key == "exit_on_finished":
                self.exit_on_finished = value.lower() in ("1", "true", "yes")


def add_profiler_step(options: Optional[ProfilerOptions],
                      iteration: int) -> None:
    """Call once per training iteration; starts/stops the jax trace when
    the iteration window is entered/left (reference profiler.py:82-110)."""
    if options is None or options._done:
        return
    lo, hi = options.batch_range
    if not options._started and iteration >= lo:
        jax.profiler.start_trace(options.profile_path)
        options._started = True
    elif options._started and iteration >= hi:
        jax.profiler.stop_trace()
        options._started = False
        options._done = True
        if options.exit_on_finished:
            raise SystemExit(0)


def synchronize(*arrays) -> None:
    """Block until device work is done (analog of cuda sync,
    reference profile.py:21)."""
    if arrays:
        for a in arrays:
            jax.block_until_ready(a)
    else:
        jax.effects_barrier()


@contextlib.contextmanager
def span(name: str):
    """Named range in the trace (analog of nvtx_span,
    reference profile.py:29)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """reader/batch-cost/ips accounting like the reference Trainer log line
    (reference trainer.py:152-168)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._reader_cost = 0.0
        self._batch_cost = 0.0
        self._samples = 0
        self._steps = 0
        self._t0 = time.perf_counter()

    def tick_reader(self):
        now = time.perf_counter()
        self._reader_cost += now - self._t0
        self._t0 = now

    def tick_batch(self, batch_size: int):
        now = time.perf_counter()
        self._batch_cost += now - self._t0
        self._t0 = now
        self._samples += batch_size
        self._steps += 1

    @property
    def stats(self):
        total = self._reader_cost + self._batch_cost
        steps = max(self._steps, 1)
        return {
            "avg_reader_cost": self._reader_cost / steps,
            "avg_batch_cost": total / steps,
            "avg_ips": self._samples / total if total > 0 else 0.0,
        }

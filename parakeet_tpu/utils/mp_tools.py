"""Multi-host helpers (reference: parakeet/utils/mp_tools.py:21-30).

On TPU, "rank" = ``jax.process_index()`` — SPMD replaces process spawning,
but multi-host runs still need host-0-only IO.
"""
from __future__ import annotations

import functools

import jax

__all__ = ["rank_zero_only", "is_main_process", "thread_map"]


def thread_map(fn, items, num_workers: int = 8):
    """Map ``fn`` over ``items`` with a thread pool, preserving order
    (the reference preprocessors use ThreadPoolExecutor the same way,
    examples/fastspeech2/preprocess.py:122)."""
    from concurrent.futures import ThreadPoolExecutor
    if num_workers <= 1:
        return [fn(x) for x in items]
    with ThreadPoolExecutor(num_workers) as pool:
        return list(pool.map(fn, items))


def is_main_process() -> bool:
    return jax.process_index() == 0


def rank_zero_only(fn):
    """Run ``fn`` only on process 0 (checkpoint/eval/log guard)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None
    return wrapper

"""Standalone step -> value schedulers (reference:
parakeet/utils/scheduler.py:20-81).

These mirror the reference's tiny scheduler registry used outside the
optimizer (e.g. noise/teacher-forcing schedules); optimizer learning-rate
schedules should use optax schedules via training.optimizer instead.
"""
from __future__ import annotations

from typing import List, Sequence

__all__ = ["Constant", "PieceWise", "StepWise", "SchedulerBase",
           "register_scheduler", "make_scheduler"]

_REGISTRY = {}


def register_scheduler(cls):
    _REGISTRY[cls.__name__.lower()] = cls
    return cls


def make_scheduler(name: str, *args, **kwargs):
    return _REGISTRY[name.lower()](*args, **kwargs)


class SchedulerBase:
    def __call__(self, step: int) -> float:
        raise NotImplementedError


@register_scheduler
class Constant(SchedulerBase):
    def __init__(self, value: float):
        self.value = value

    def __call__(self, step: int) -> float:
        return self.value


@register_scheduler
class PieceWise(SchedulerBase):
    """Linear interpolation through (step, value) anchors; clamps at the
    ends (reference scheduler.py:30)."""

    def __init__(self, anchors: Sequence[Sequence[float]]):
        if len(anchors) < 2:
            raise ValueError("need at least 2 anchors")
        self.xs: List[float] = [float(a[0]) for a in anchors]
        self.ys: List[float] = [float(a[1]) for a in anchors]
        if sorted(self.xs) != self.xs:
            raise ValueError("anchor steps must be increasing")

    def __call__(self, step: int) -> float:
        if step <= self.xs[0]:
            return self.ys[0]
        if step >= self.xs[-1]:
            return self.ys[-1]
        for i in range(len(self.xs) - 1):
            if self.xs[i] <= step < self.xs[i + 1]:
                frac = (step - self.xs[i]) / (self.xs[i + 1] - self.xs[i])
                return self.ys[i] + frac * (self.ys[i + 1] - self.ys[i])
        return self.ys[-1]


@register_scheduler
class StepWise(SchedulerBase):
    """Right-continuous staircase through (step, value) anchors
    (reference scheduler.py:45)."""

    def __init__(self, anchors: Sequence[Sequence[float]]):
        if not anchors:
            raise ValueError("need at least 1 anchor")
        self.xs: List[float] = [float(a[0]) for a in anchors]
        self.ys: List[float] = [float(a[1]) for a in anchors]
        if sorted(self.xs) != self.xs:
            raise ValueError("anchor steps must be increasing")

    def __call__(self, step: int) -> float:
        value = self.ys[0]
        for x, y in zip(self.xs, self.ys):
            if step >= x:
                value = y
        return value

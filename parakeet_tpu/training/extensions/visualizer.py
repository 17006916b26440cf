"""TensorBoard scalar/figure writer extension.

The TPU-stack replacement for the reference's VisualDL extension
(reference: parakeet/training/extensions/visualizer.py:18-37): every scalar
in the per-iteration observation goes to TensorBoard (tensorboardX).
"""
from __future__ import annotations

from ..extension import Extension, PRIORITY_READER

__all__ = ["TensorBoardWriter"]


class TensorBoardWriter(Extension):
    trigger = (1, "iteration")
    priority = PRIORITY_READER - 1  # run after plain loggers
    default_name = "tensorboard_writer"

    def __init__(self, logdir=None, writer=None):
        if writer is None:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(logdir=str(logdir))
        self.writer = writer

    def __call__(self, trainer) -> None:
        step = trainer.updater.state.iteration
        for name, value in trainer.observation.items():
            try:
                value = float(value)
            except (TypeError, ValueError):
                continue
            self.writer.add_scalar(name, value, global_step=step)

    def finalize(self, trainer) -> None:
        self.writer.close()

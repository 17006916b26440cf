"""Figure-logging extension: alignments / spectrograms to TensorBoard.

The TPU-stack replacement for the reference's in-loop VisualDL figure
logging (reference: examples/tacotron2_aishell3/train.py:100-141, which
calls utils.display plot helpers and visualizer.add_figure during the
valid loop): a trainer extension that, at its trigger, calls a
user-supplied ``fn(trainer) -> {tag: matplotlib figure}`` and writes each
figure to the TensorBoard writer.

Typical use (AR model recipes):

    def figures(trainer):
        out = eval_step(trainer.updater.train_state, dev_batch)
        return {
            "alignment": display.plot_alignment(
                np.asarray(out["alignments"][0])),   # (T_dec, T_enc)
            "mel_pred": display.plot_spectrogram(
                np.asarray(out["after_outs"][0]).T),
        }

    trainer.extend(FigureWriter(figures, writer=tb.writer),
                   trigger=(cfg.valid_interval, "iteration"))
"""
from __future__ import annotations

from ..extension import Extension, PRIORITY_READER

__all__ = ["FigureWriter"]


class FigureWriter(Extension):
    trigger = (1000, "iteration")
    priority = PRIORITY_READER - 2  # after the scalar writer
    default_name = "figure_writer"

    def __init__(self, fn, writer):
        """``fn(trainer) -> {tag: figure}``; ``writer`` is a tensorboardX
        SummaryWriter (share TensorBoardWriter's via ``.writer``)."""
        self.fn = fn
        self.writer = writer

    def __call__(self, trainer) -> None:
        step = trainer.updater.state.iteration
        for tag, fig in self.fn(trainer).items():
            self.writer.add_figure(tag, fig, global_step=step)

"""Updaters: the training-step abstraction.

Same role as the reference's UpdaterBase/StandardUpdater (reference:
parakeet/training/updater.py:21-85, standard_updater.py:31-199) with the
TPU-first twist: the actual step is a *pure jitted function*
``(TrainState, batch) -> (TrainState, metrics)`` — autograd, optimizer
update, and collective gradient reduction all live inside one XLA program.
The updater owns the host-side iteration/epoch counters and the data
iterator.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

from .checkpoint import load_pytree, save_pytree
from .reporter import report
from .state import TrainState

__all__ = ["UpdaterState", "UpdaterBase", "StandardUpdater"]


@dataclasses.dataclass
class UpdaterState:
    iteration: int = 0
    epoch: int = 0


class UpdaterBase:
    """Protocol: update() performs one training step."""

    def __init__(self):
        self.state = UpdaterState()

    def update(self) -> None:
        raise NotImplementedError

    def state_dict(self):
        return {"iteration": self.state.iteration, "epoch": self.state.epoch}

    def set_state_dict(self, state_dict) -> None:
        self.state.iteration = int(state_dict["iteration"])
        self.state.epoch = int(state_dict["epoch"])

    def save(self, path) -> None:
        save_pytree(path, {}, metadata=self.state_dict())

    def load(self, path) -> None:
        _, meta = load_pytree(path)
        self.set_state_dict(meta)


class StandardUpdater(UpdaterBase):
    """One jitted step over one dataloader.

    Parameters
    ----------
    step_fn : (TrainState, batch) -> (TrainState, metrics dict).  Should be
        jit-compiled (donate the state argument for in-place updates).
    train_state : initial TrainState pytree.
    dataloader : iterable of batches; re-iterated each epoch.  If its
        ``batch_sampler`` has ``set_epoch`` it is called on epoch renewal
        (the DistributedBatchSampler semantics, standard_updater.py:162-168).
    reports_prefix : prepended to metric names in report().
    mesh : optional jax.sharding.Mesh with a "data" axis.  When given,
        the train state is replicated once and every batch is sharded on
        its leading axis — the wrap-free data-parallel surface replacing
        the reference's paddle.DataParallel + DistributedBatchSampler
        (SURVEY §2.9); XLA inserts the gradient all-reduce over ICI.
    param_spec_rule : optional ``(path, leaf) -> PartitionSpec`` rule
        (e.g. ``parallel.mesh.transformer_tp_spec``).  When given with a
        mesh, every train-state leaf is placed by the rule instead of
        replicated — tensor parallelism over the mesh's 'model' axis
        (optimizer moments inherit their param's spec because their
        tree paths end with the same param path).  The recipe surface
        is ``train.py --tp N`` (mesh data x model); XLA/GSPMD inserts
        the row-contraction all-reduces.
    """

    def __init__(self, step_fn: Callable, train_state: TrainState,
                 dataloader, reports_prefix: str = "train/", mesh=None,
                 param_spec_rule=None):
        super().__init__()
        self.step_fn = step_fn
        self.mesh = mesh
        self.param_spec_rule = param_spec_rule
        if mesh is not None and param_spec_rule is not None:
            from ..parallel.mesh import shard_params_by_rule
            train_state = shard_params_by_rule(train_state, mesh,
                                               param_spec_rule)
        elif mesh is not None:
            from ..parallel.mesh import replicate
            train_state = replicate(train_state, mesh)
        self.train_state = train_state
        self.dataloader = dataloader
        self.reports_prefix = reports_prefix
        self._iterator: Optional[Iterator] = None
        self.last_metrics: Dict[str, Any] = {}

    def read_batch(self):
        if self._iterator is None:
            self._set_epoch()
            self._iterator = iter(self.dataloader)
            self._epoch_count = 0
        try:
            batch = next(self._iterator)
        except StopIteration:
            # fallback for dataloaders without a known length
            self.state.epoch += 1
            self._set_epoch()
            self._iterator = iter(self.dataloader)
            self._epoch_count = 0
            batch = next(self._iterator)
        self._epoch_count += 1
        # Epoch completion is detected AT the last batch (chainer
        # is_new_epoch semantics, like the reference's iterators), not
        # when the next epoch's first batch is fetched: an N-epoch run
        # does exactly N * len(dataloader) updates, and an
        # epoch-triggered Snapshot captures the state exactly at the
        # epoch boundary — resume then continues with the next epoch's
        # data, no batch replayed (exact resume-at-N+1).
        n = self._epoch_len()
        if n is not None and self._epoch_count >= n:
            self.state.epoch += 1
            self._iterator = None
            self._epoch_count = 0
        return batch

    def _epoch_len(self) -> Optional[int]:
        try:
            return len(self.dataloader)
        except TypeError:
            return None

    def _set_epoch(self) -> None:
        sampler = getattr(self.dataloader, "batch_sampler", None)
        if sampler is not None and hasattr(sampler, "set_epoch"):
            sampler.set_epoch(self.state.epoch)

    def update(self) -> None:
        tic = time.time()
        batch = self.read_batch()
        self.last_reader_cost = time.time() - tic
        self.update_core(batch)
        self.state.iteration += 1

    def update_core(self, batch) -> None:
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
        self.train_state, metrics = self.step_fn(self.train_state, batch)
        self.last_metrics = metrics
        for name, value in metrics.items():
            report(self.reports_prefix + name, value)

    # -- persistence --------------------------------------------------------
    def state_dict(self):
        return super().state_dict()

    def save(self, path) -> None:
        # flatten_tree gathers sharded leaves to full global host arrays,
        # so the snapshot is topology-free (resumable under any mesh).
        save_pytree(path, self.train_state, metadata=self.state_dict())

    def load(self, path) -> None:
        """Load a snapshot and re-place it for THIS updater's topology.

        Snapshots hold full (gathered) arrays regardless of the mesh
        they were written under; placement is decided here — by the
        param_spec_rule for TP/PP, replicated for DP, default device
        otherwise.  This is what makes cross-topology resume work
        (save under --tp 2, resume under --dp 8 or vice versa); the
        reference's resume semantics (snapshot.py:36-111, exact
        resume-at-N+1) are unchanged.
        """
        tree, meta = load_pytree(path, template=self.train_state)
        if self.mesh is not None and self.param_spec_rule is not None:
            from ..parallel.mesh import shard_params_by_rule
            self.train_state = shard_params_by_rule(
                tree, self.mesh, self.param_spec_rule)
        elif self.mesh is not None:
            from ..parallel.mesh import replicate
            self.train_state = replicate(tree, self.mesh)
        else:
            self.train_state = jax.device_put(tree)
        self.set_state_dict(meta)


def to_device_batch(batch: Dict[str, np.ndarray]):
    """Utility: move a numpy batch dict onto the default device(s)."""
    return jax.tree_util.tree_map(jax.numpy.asarray, batch)

"""Training runtime: trainer, updaters, extensions, checkpointing, config."""
from .checkpoint import (SnapshotRing, flatten_tree, latest_record,
                         load_pytree, save_pytree, unflatten_tree)
from .config import Config, default_training_config
from .extension import (PRIORITY_EDITOR, PRIORITY_READER, PRIORITY_WRITER,
                        Extension, make_extension)
from .extensions import Snapshot, StandardEvaluator, TensorBoardWriter
from .optimizer import (build_optimizer, constant_schedule,
                        piecewise_schedule, step_decay_schedule)
from .reporter import DictSummary, Summary, report, scope
from .seeding import seed_everything
from .state import TrainState, create_train_state
from .trainer import Trainer
from .triggers import (IntervalTrigger, LimitTrigger, TimeTrigger,
                       get_trigger)
from .updater import StandardUpdater, UpdaterBase, UpdaterState

__all__ = [
    "Trainer", "StandardUpdater", "UpdaterBase", "UpdaterState",
    "TrainState", "create_train_state",
    "Extension", "make_extension", "PRIORITY_WRITER", "PRIORITY_EDITOR",
    "PRIORITY_READER",
    "Snapshot", "StandardEvaluator", "TensorBoardWriter",
    "IntervalTrigger", "LimitTrigger", "TimeTrigger", "get_trigger",
    "report", "scope", "Summary", "DictSummary",
    "Config", "default_training_config",
    "build_optimizer", "step_decay_schedule", "piecewise_schedule",
    "constant_schedule",
    "seed_everything",
    "save_pytree", "load_pytree", "flatten_tree", "unflatten_tree",
    "SnapshotRing", "latest_record",
]

from .evaluator import StandardEvaluator
from .snapshot import Snapshot
from .visualizer import TensorBoardWriter

__all__ = ["Snapshot", "StandardEvaluator", "TensorBoardWriter"]

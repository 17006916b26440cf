"""Cross-cutting utilities (reference: parakeet/utils/)."""
from .error_rate import cer, char_errors, levenshtein, wer, word_errors
from .layer_tools import (freeze_mask, freeze_optimizer, gradient_norm,
                          num_parameters, summary)
from .mp_tools import is_main_process, rank_zero_only
from .profiler import (ProfilerOptions, StepTimer, add_profiler_step, span,
                       synchronize)

__all__ = [
    "levenshtein", "wer", "cer", "word_errors", "char_errors",
    "num_parameters", "summary", "gradient_norm", "freeze_mask",
    "freeze_optimizer",
    "rank_zero_only", "is_main_process",
    "ProfilerOptions", "add_profiler_step", "synchronize", "span",
    "StepTimer",
]

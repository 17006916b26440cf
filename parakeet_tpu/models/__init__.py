"""Task models: acoustic models, vocoders, speaker encoder."""
from .fastspeech2 import FastSpeech2, fastspeech2_loss
from .fs2_updater import (init_fs2_train_state, make_fs2_eval_step,
                          make_fs2_train_step)
from .parallel_wavegan import (PWGDiscriminator, PWGGenerator,
                               ResidualPWGDiscriminator, pwg_inference)
from .pwg_updater import (init_pwg_train_state, make_pwg_eval_step,
                          make_pwg_train_step)

__all__ = [
    "FastSpeech2", "fastspeech2_loss",
    "make_fs2_train_step", "make_fs2_eval_step", "init_fs2_train_state",
    "PWGGenerator", "PWGDiscriminator", "ResidualPWGDiscriminator",
    "pwg_inference",
    "make_pwg_train_step", "make_pwg_eval_step", "init_pwg_train_state",
]

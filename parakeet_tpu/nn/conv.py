"""Causal Conv1D usable as an RNN-like cell, and Conv1D+BatchNorm.

Equivalent of the reference conv utilities (reference:
parakeet/modules/conv.py:23-260): ``Conv1dCell`` runs as one parallel
causal conv at training time and as an explicit-state per-step cell at
decode time.  TPU-first difference: instead of mutable ring-buffer layer
attributes (reference conv.py:103-135 start_sequence/add_input), the
receptive-field buffer is a value the caller carries through
``lax.scan`` — the whole decode stays one XLA program.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Conv1dCell", "Conv1dBatchNorm", "GLU"]


class Conv1dCell(nn.Module):
    """Causal dilated Conv1D: (B, T, Cin) -> (B, T, Cout).

    ``__call__`` applies the conv over a whole (teacher-forced) sequence
    with left-only padding; ``initial_state``/``step`` expose the same
    parameters as a per-timestep cell whose state is the last
    ``receptive_field - 1`` input frames.
    """
    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def receptive_field(self) -> int:
        return 1 + (self.kernel_size - 1) * self.dilation

    def setup(self):
        self.conv = nn.Conv(self.features, (self.kernel_size,),
                            kernel_dilation=(self.dilation,),
                            padding="VALID", use_bias=self.use_bias,
                            dtype=self.dtype)

    def __call__(self, x):
        pad = self.receptive_field - 1
        return self.conv(jnp.pad(x, ((0, 0), (pad, 0), (0, 0))))

    def initial_state(self, batch: int, in_features: int) -> jnp.ndarray:
        """Zero history buffer (B, receptive_field - 1, Cin)."""
        return jnp.zeros((batch, self.receptive_field - 1, in_features),
                         self.dtype)

    def step(self, state: jnp.ndarray, x_t: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One decode step: state (B, rf-1, Cin), x_t (B, Cin) ->
        (new_state, y_t (B, Cout)); identical numerics to one column of
        ``__call__`` (reference conv.py:103-135)."""
        window = jnp.concatenate([state, x_t[:, None]], axis=1)
        y = self.conv(window)[:, -1]
        return window[:, 1:], y


class Conv1dBatchNorm(nn.Module):
    """Conv1D + BatchNorm (NLC throughout; the reference wraps paddle's
    NCL BatchNorm1D, conv.py:186-260)."""
    features: int
    kernel_size: int = 3
    padding: str = "SAME"
    use_bias: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.Conv(self.features, (self.kernel_size,),
                    padding=self.padding, use_bias=self.use_bias,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train,
                            momentum=self.momentum, epsilon=self.epsilon,
                            dtype=self.dtype, name="bn")(y)


class GLU(nn.Module):
    """Gated linear unit over the last axis (reference modules/glu)."""
    axis: int = -1

    @nn.compact
    def __call__(self, x):
        a, b = jnp.split(x, 2, axis=self.axis)
        return a * nn.sigmoid(b)

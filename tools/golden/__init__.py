"""Torch-based golden oracles for checkpoint-conversion value parity.

The released Paddle checkpoints are unobtainable in this environment
(no network egress, paddle not installed), so numerical parity is
proven against independent PyTorch implementations of the reference
math instead: each oracle consumes a state dict in the *paddle naming
and tensor layout* (the exact format `parakeet_tpu.utils.convert`
expects), computes the reference model's forward, and the tests assert
our converted JAX models reproduce it.  This catches the layout failure
classes fake-shape tests cannot: transposed LSTM gate order, flipped
ConvTranspose kernels, BatchNorm-NLC statistics, weight-norm folding.

See PARITY.md for the measured results and the protocol's limits.
"""

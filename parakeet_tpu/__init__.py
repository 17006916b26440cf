"""parakeet_tpu: a TPU-native text-to-speech framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
PaddlePaddle/Parakeet (text frontend -> acoustic model -> vocoder), designed
TPU-first: jit-compiled static-shape models, on-device autoregressive decode
loops, fused Pallas DSP kernels, and SPMD parallelism over device meshes.

Subpackages
-----------
audio     host-side (numpy) signal processing: STFT/mel/pitch/energy
ops       device-side (JAX/Pallas) compute: STFT, mel, losses, masking
nn        reusable flax.linen network modules
models    task models: FastSpeech2, SpeedySpeech, Tacotron2, TransformerTTS,
          WaveFlow, ParallelWaveGAN, GE2E speaker encoder
frontend  text frontends (English / Chinese normalization + G2P)
data      metadata tables, batching, collators
training  trainer runtime: updaters, extensions, checkpoints, optimizers
parallel  mesh / sharding helpers for SPMD data (and tensor) parallelism
utils     cross-cutting helpers (display, error rate, profiling)
"""

__version__ = "0.1.0"

#!/usr/bin/env python
"""WaveFlow batch synthesis: mel .npy files -> waveform.

Equivalent of the reference synthesizer (reference:
examples/waveflow/synthesize.py): loads every .npy in --input, runs the
flow inverse sampler, writes <utt>.wav.

Usage:
  python synthesize.py --config conf/default.yaml \
      --checkpoint exp/checkpoints/step-N.npz --input mels/ --output wavs/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.models import ConditionalWaveFlow
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config, \
    inference_model_kwargs
from parakeet_tpu.utils.device import add_device_arg, set_device


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--input", type=Path, required=True,
                        help="directory of mel .npy files (T, n_mels)")
    parser.add_argument("--output", type=Path, default=Path("wavs"))
    parser.add_argument("--max-frames", type=int, default=1024)
    parser.add_argument("--sigma", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sample-dtype", default="float32",
                        choices=("float32", "bfloat16"),
                        help="sampling-scan activation dtype; bfloat16 "
                             "halves the sampler's matmul passes and "
                             "carried-buffer HBM traffic (params and the "
                             "affine inversion stay fp32)")
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    cfg = Config.from_yaml(args.config)
    model_kwargs = inference_model_kwargs(cfg.get("model", {}))
    model_kwargs["sigma"] = args.sigma
    if args.sample_dtype == "bfloat16":
        model_kwargs["sample_act_dtype"] = jnp.bfloat16
    model = ConditionalWaveFlow(**model_kwargs)
    params = load_variables(args.checkpoint)["params"]

    upsample = 1
    for f in model.upsample_factors:
        upsample *= f

    @jax.jit
    def infer(params, mel, rng):
        return model.apply({"params": params}, mel, rng,
                           method=ConditionalWaveFlow.infer)

    args.output.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    for path in sorted(args.input.glob("*.npy")):
        mel = np.load(path).astype(np.float32)
        n = min(mel.shape[0], args.max_frames)
        padded = np.zeros((args.max_frames, mel.shape[1]), np.float32)
        padded[:n] = mel[:n]
        key, sub = jax.random.split(key)
        wav = infer(params, jnp.asarray(padded)[None], sub)
        wav = np.asarray(wav)[0, :n * upsample]
        out = args.output / f"{path.stem}.wav"
        save_wav(out, wav, cfg.fs)
        print(f"{path.stem}: {n} frames -> {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Parallel WaveGAN batch synthesis: normalized mel .npy -> waveform.

Equivalent of the reference vocoder synthesizer (reference:
examples/parallelwave_gan/baker/synthesize.py).

Usage:
  python synthesize.py --config conf/default.yaml \
      --checkpoint exp/checkpoints/snapshot_iter_N.npz \
      --test-metadata dump/norm_dev/metadata.jsonl --output-dir wavs/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.data.datatable import read_jsonl
from parakeet_tpu.models import PWGGenerator, pwg_inference
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config
from parakeet_tpu.utils.device import add_device_arg, set_device


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--test-metadata", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--max-frames", type=int, default=1024,
                        help="mel frames are padded to this static length")
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    cfg = Config.from_yaml(args.config)
    gen = PWGGenerator(**cfg.get("generator_params", {}))
    params = load_variables(args.checkpoint)["params"]

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for row in read_jsonl(args.test_metadata):
        mel = np.load(row["feats"]) if isinstance(row["feats"], str) \
            else np.asarray(row["feats"], np.float32)
        n = min(mel.shape[0], args.max_frames)
        padded = np.zeros((args.max_frames, mel.shape[1]), np.float32)
        padded[:n] = mel[:n]
        wav = pwg_inference(gen, {"params": params}, jnp.asarray(padded),
                            rng=jax.random.PRNGKey(0))
        wav = np.asarray(wav)[:n * gen.upsample_factor]
        out = args.output_dir / f"{row['utt_id']}.wav"
        save_wav(out, wav, cfg.fs)
        print(f"{row['utt_id']}: {n} frames -> {out}")


if __name__ == "__main__":
    main()

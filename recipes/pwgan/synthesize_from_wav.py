#!/usr/bin/env python
"""Copy-synthesis: wav -> log-mel -> z-score -> PWGAN -> wav.

Equivalent of the reference copy-synthesis CLI (reference:
examples/GANVocoder/parallelwave_gan/baker/synthesize_from_wav.py):
extract the log-mel of an input waveform, normalize it with the
training-set stats, and re-synthesize it with the vocoder.  The sanity
check of a trained vocoder — output should sound like the input.

Usage:
  python synthesize_from_wav.py --config conf/default.yaml \
      --checkpoint exp/checkpoints/snapshot_iter_N.npz \
      --stats dump/feats_stats.npy --input-wav in.wav --output-dir wavs/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import load_wav, save_wav
from parakeet_tpu.audio.features import LogMelFBank
from parakeet_tpu.models import PWGGenerator, pwg_inference
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config
from parakeet_tpu.utils.device import add_device_arg, set_device


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--stats", type=Path, required=True,
                        help="feats_stats.npy from the normalize stage")
    parser.add_argument("--input-wav", type=Path, required=True,
                        nargs="+", help="one or more waveforms")
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--max-frames", type=int, default=1024,
                        help="mel frames are padded to this static length")
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    cfg = Config.from_yaml(args.config)
    gen = PWGGenerator(**cfg.get("generator_params", {}))
    params = load_variables(args.checkpoint)["params"]
    mel_extractor = LogMelFBank(sr=cfg.fs, n_fft=cfg.n_fft,
                                hop_length=cfg.n_shift,
                                win_length=cfg.win_length,
                                fmin=cfg.fmin, fmax=cfg.fmax,
                                n_mels=cfg.n_mels)
    arr = np.load(args.stats)
    mean, std = arr[0], np.maximum(arr[1], 1e-8)

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for wav_path in args.input_wav:
        wav, _ = load_wav(wav_path, sr=cfg.fs)
        mel = (mel_extractor.get_log_mel_fbank(wav) - mean) / std
        n = min(mel.shape[0], args.max_frames)
        padded = np.zeros((args.max_frames, mel.shape[1]), np.float32)
        padded[:n] = mel[:n]
        out_wav = pwg_inference(gen, {"params": params},
                                jnp.asarray(padded),
                                rng=jax.random.PRNGKey(0))
        out_wav = np.asarray(out_wav)[:n * gen.upsample_factor]
        out = args.output_dir / f"{Path(wav_path).stem}_gen.wav"
        save_wav(out, out_wav, cfg.fs)
        print(f"{wav_path} -> {out} ({n} frames)")


if __name__ == "__main__":
    main()

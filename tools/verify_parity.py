#!/usr/bin/env python
"""Numerical-parity check of a converted checkpoint against reference
goldens (the BASELINE.md acceptance criterion: mel MSE < 1e-3 on the
same inputs).

The golden file is a .npz dumped from the reference implementation (the
reference's own test strategy: golden-implementation comparison,
tests/unit/test_pwg.py).  Dump it on a machine with Paddle installed:

    # fastspeech2 / speedyspeech (deterministic, non-AR):
    np.savez("golden.npz", text=text_ids, text_lengths=[n],
             mel=model.inference(paddle.to_tensor(text_ids)).numpy())
    # parallel_wavegan: include the exact noise used
    np.savez("golden.npz", mel=mel, noise=noise,
             wav=generator.inference(c=mel, x=noise).numpy())

Then here:

    python tools/verify_parity.py --model fastspeech2 \
        --config conf/default.yaml --checkpoint converted.npz \
        --golden golden.npz [--threshold 1e-3]

Exit code 0 iff MSE < threshold; prints one JSON line either way.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _load(args):
    from parakeet_tpu.training.checkpoint import load_variables
    from parakeet_tpu.training.config import (Config,
                                              inference_model_kwargs)
    cfg = Config.from_yaml(args.config)
    variables = load_variables(args.checkpoint)
    return cfg, inference_model_kwargs, variables


def run_fastspeech2(args, golden):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2
    cfg, imk, variables = _load(args)
    text = jnp.asarray(golden["text"])
    if text.ndim == 1:
        text = text[None]
    idim = int(variables["params"]["encoder"]["embed"][
        "embedding"].shape[0])
    model = FastSpeech2(idim=idim, odim=cfg.n_mels,
                        **imk(cfg.get("model", {})))
    ref = np.asarray(golden["mel"])
    if ref.ndim == 2:
        ref = ref[None]
    n = ref.shape[1]
    out = model.apply(variables, text,
                      jnp.asarray(golden["text_lengths"]),
                      max_frames=max(n, 8), min_duration=0,
                      method=FastSpeech2.inference)  # reference allows
                      # zero-length tokens; flooring would shift frames
    mel = np.asarray(out["after_outs"])[:, :n]
    return mel, ref


def run_speedyspeech(args, golden):
    import jax.numpy as jnp
    from parakeet_tpu.models import SpeedySpeech
    cfg, imk, variables = _load(args)
    text = jnp.asarray(golden["text"])
    if text.ndim == 1:
        text = text[None]
    tones = golden.get("tones")
    if tones is not None:
        tones = jnp.asarray(tones)
        if tones.ndim == 1:
            tones = tones[None]
    vocab = int(variables["params"]["embedding"]["text_embed"]
                ["embedding"].shape[0])
    model = SpeedySpeech(vocab_size=vocab, **imk(cfg.get("model", {})))
    ref = np.asarray(golden["mel"])
    if ref.ndim == 2:
        ref = ref[None]
    n = ref.shape[1]
    out = model.apply(variables, text, tones, max_frames=max(n, 8),
                      method=SpeedySpeech.inference)
    mel = np.asarray(out["mel"])[:, :n]
    return mel, ref


def run_pwgan(args, golden):
    import jax.numpy as jnp
    from parakeet_tpu.models import PWGGenerator, pwg_inference
    cfg, imk, variables = _load(args)
    gen = PWGGenerator(**imk(cfg.get("generator_params", {})))
    mel = jnp.asarray(golden["mel"])
    noise = golden.get("noise")
    if noise is None:
        raise SystemExit(
            "pwgan goldens must include the exact 'noise' array the "
            "reference used — random noise can never match the wav")
    wav = pwg_inference(gen, variables, mel, noise=jnp.asarray(noise))
    ref = np.asarray(golden["wav"]).reshape(-1)
    got = np.asarray(wav).reshape(-1)[:len(ref)]
    return got, ref


RUNNERS = {"fastspeech2": run_fastspeech2,
           "speedyspeech": run_speedyspeech,
           "pwgan": run_pwgan}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True, choices=sorted(RUNNERS))
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--golden", type=Path, required=True)
    parser.add_argument("--threshold", type=float, default=1e-3)
    from parakeet_tpu.utils.device import add_device_arg, set_device
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    golden = np.load(args.golden)
    got, ref = RUNNERS[args.model](args, golden)
    mse = float(np.mean((got.astype(np.float64)
                         - ref.astype(np.float64)) ** 2))
    ok = mse < args.threshold
    print(json.dumps({"metric": f"{args.model}_golden_mse", "value": mse,
                      "threshold": args.threshold,
                      "pass": bool(ok)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""GE2E embedding export: mel .npy utterances -> speaker embedding .npy.

Equivalent of the reference exporter (reference:
examples/ge2e/inference.py:28 + speaker_encoder.embed_utterance): each
utterance is split into partial windows of ``partial_frames`` with 50%
overlap, every partial is embedded, and the L2-normalized mean is the
utterance embedding (used to condition the voice-cloning Tacotron2).

Usage:
  python inference.py --checkpoint exp/checkpoints/step-N.npz \
      --input dump/ge2e_mels --output dump/ge2e_embeds
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.models import LSTMSpeakerEncoder, partial_slices
from parakeet_tpu.training.checkpoint import load_pytree, nest_flat
from parakeet_tpu.utils.device import add_device_arg, set_device


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--input", type=Path, required=True,
                        help="tree of mel .npy files (from preprocess.py)")
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--n-mels", type=int, default=40)
    parser.add_argument("--num-layers", type=int, default=3)
    parser.add_argument("--hidden-size", type=int, default=256)
    parser.add_argument("--output-size", type=int, default=256)
    parser.add_argument("--partial-frames", type=int, default=160)
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    model = LSTMSpeakerEncoder(n_mels=args.n_mels,
                               num_layers=args.num_layers,
                               hidden_size=args.hidden_size,
                               output_size=args.output_size)
    flat, _ = load_pytree(args.checkpoint)
    tree = nest_flat(flat)
    params = tree.get("params", tree)

    @jax.jit
    def embed(params, partials):
        return model.apply({"params": params}, partials)

    hop = args.partial_frames // 2
    files = sorted(args.input.rglob("*.npy"))
    for path in files:
        mel = np.load(path).astype(np.float32)
        if mel.shape[0] < args.partial_frames:
            mel = np.pad(mel,
                         ((0, args.partial_frames - mel.shape[0]), (0, 0)))
        starts = partial_slices(mel.shape[0], args.partial_frames, hop)
        partials = np.stack([mel[s:s + args.partial_frames]
                             for s in starts])
        # bucket the partial count to a multiple of 8 so the jit cache
        # is reused across utterance lengths (each new shape would
        # otherwise cost a 20-40 s TPU compile); padded windows are
        # embedded and discarded
        n = partials.shape[0]
        bucket = -(-n // 8) * 8
        if bucket != n:
            partials = np.pad(partials,
                              ((0, bucket - n), (0, 0), (0, 0)))
        embeds = np.asarray(embed(params, jnp.asarray(partials)))[:n]
        mean = embeds.mean(axis=0)
        emb = mean / max(np.linalg.norm(mean), 1e-12)
        rel = path.relative_to(args.input)
        out = args.output / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(out, emb.astype(np.float32))
        print(f"{rel} -> {out}")


if __name__ == "__main__":
    main()

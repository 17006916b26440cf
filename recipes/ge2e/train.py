#!/usr/bin/env python
"""GE2E speaker-encoder training CLI (reference: examples/ge2e/train.py).

Expects per-speaker directories of mel .npy partials:
  <data-root>/<speaker>/*.npy  each (T, n_mels)
Each batch = N speakers x M utterances, random fixed-length crops.
"""
import argparse
import random
from pathlib import Path

import jax
import numpy as np

from parakeet_tpu.models import LSTMSpeakerEncoder
from parakeet_tpu.training.checkpoint import SnapshotRing, save_pytree
from parakeet_tpu.training.optimizer import build_optimizer
from parakeet_tpu.models.ge2e_updater import (init_ge2e_train_state,
                                              make_ge2e_train_step)
from parakeet_tpu.training.seeding import seed_everything
from parakeet_tpu.utils.device import (add_device_arg,
                                       maybe_initialize_multihost,
                                       set_device)


class MultiSpeakerSampler:
    """N speakers x M utterances per batch (reference:
    examples/ge2e/speaker_verification_dataset.py:70)."""

    def __init__(self, root: Path, n_speakers: int, n_utts: int,
                 frames: int, seed: int = 0):
        self.speakers = [d for d in sorted(root.iterdir()) if d.is_dir()]
        if len(self.speakers) < n_speakers:
            raise ValueError(
                f"need >= {n_speakers} speakers, found {len(self.speakers)}")
        self.files = {d: sorted(d.glob("*.npy")) for d in self.speakers}
        self.n_speakers = n_speakers
        self.n_utts = n_utts
        self.frames = frames
        self.rng = random.Random(seed)

    def _crop(self, mel: np.ndarray) -> np.ndarray:
        if mel.shape[0] <= self.frames:
            mel = np.pad(mel, ((0, self.frames - mel.shape[0] + 1), (0, 0)))
        start = self.rng.randrange(0, mel.shape[0] - self.frames)
        return mel[start:start + self.frames]

    def batch(self) -> np.ndarray:
        spk = self.rng.sample(self.speakers, self.n_speakers)
        utts = []
        for s in spk:
            files = self.files[s]
            chosen = (self.rng.sample(files, self.n_utts)
                      if len(files) >= self.n_utts
                      else [self.rng.choice(files)
                            for _ in range(self.n_utts)])
            utts.extend(self._crop(np.load(f)) for f in chosen)
        return np.stack(utts).astype(np.float32)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-root", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("exp"))
    parser.add_argument("--speakers-per-batch", type=int, default=64)
    parser.add_argument("--utterances-per-speaker", type=int, default=10)
    parser.add_argument("--frames", type=int, default=160)
    parser.add_argument("--n-mels", type=int, default=40)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--max-iteration", type=int, default=1560000)
    parser.add_argument("--save-interval", type=int, default=10000)
    parser.add_argument("--seed", type=int, default=0)
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)
    maybe_initialize_multihost()

    seed_everything(args.seed)
    sampler = MultiSpeakerSampler(args.data_root, args.speakers_per_batch,
                                  args.utterances_per_speaker, args.frames,
                                  args.seed)
    model = LSTMSpeakerEncoder(n_mels=args.n_mels)

    tx = build_optimizer("adam", args.learning_rate)
    state = init_ge2e_train_state(
        model, tx, jax.random.PRNGKey(args.seed),
        {"utterances": sampler.batch()}, args.speakers_per_batch)
    step = make_ge2e_train_step(model, tx, args.speakers_per_batch)

    ring = SnapshotRing(args.output_dir / "checkpoints", max_size=5)
    for it in range(1, args.max_iteration + 1):
        state, metrics = step(state, {"utterances": sampler.batch()})
        if it % 100 == 0:
            print(f"iter {it}: loss {float(metrics['loss']):.4f} "
                  f"acc {float(metrics['accuracy']):.3f}")
        if it % args.save_interval == 0:
            path = ring.path_for(it)
            save_pytree(path, jax.device_get(state),
                        metadata={"iteration": it})
            ring.register(path, it)


if __name__ == "__main__":
    main()

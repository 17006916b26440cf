#!/usr/bin/env python
"""WaveFlow training CLI (reference: examples/waveflow/train.py:18-140).

Uses the pwgan preprocess stage output (wave/feats .npy + metadata.jsonl);
random fixed-length (wav, mel) clips per batch keep shapes static.
"""
import argparse
from pathlib import Path

import jax
import numpy as np

from parakeet_tpu.data.dataloader import BatchSampler, DataLoader
from parakeet_tpu.data.datatable import DataTable
from parakeet_tpu.models import ConditionalWaveFlow
from parakeet_tpu.models.waveflow_updater import (
    init_waveflow_train_state, make_waveflow_eval_step,
    make_waveflow_train_step)
from parakeet_tpu.training.config import Config, \
    resolve_model_kwargs
from parakeet_tpu.training.extensions.evaluator import StandardEvaluator
from parakeet_tpu.training.extensions.snapshot import Snapshot
from parakeet_tpu.training.extensions.visualizer import TensorBoardWriter
from parakeet_tpu.training.optimizer import build_optimizer
from parakeet_tpu.training.seeding import seed_everything
from parakeet_tpu.training.trainer import Trainer
from parakeet_tpu.training.updater import StandardUpdater
from parakeet_tpu.utils.device import (add_device_arg,
                                       maybe_initialize_multihost,
                                       set_device)


class WaveFlowClip:
    """Random aligned (wav, mel) clip of ``clip_frames`` mel frames
    (reference: examples/waveflow/ljspeech.py LJSpeechClipCollector)."""

    def __init__(self, clip_frames: int, hop: int, seed: int = 0):
        self.clip_frames = clip_frames
        self.hop = hop
        self.rng = np.random.default_rng(seed)

    def __call__(self, examples):
        wavs, mels = [], []
        for ex in examples:
            wav = np.asarray(ex["wave"], np.float32)
            mel = np.asarray(ex["feats"], np.float32)
            frames = mel.shape[0]
            if frames <= self.clip_frames:
                pad = self.clip_frames - frames + 1
                mel = np.pad(mel, ((0, pad), (0, 0)))
                wav = np.pad(wav, (0, pad * self.hop))
                frames = mel.shape[0]
            start = int(self.rng.integers(0, frames - self.clip_frames))
            mels.append(mel[start:start + self.clip_frames])
            s = start * self.hop
            need = self.clip_frames * self.hop
            clip = wav[s:s + need]
            if len(clip) < need:
                clip = np.pad(clip, (0, need - len(clip)))
            wavs.append(clip)
        return {"wav": np.stack(wavs), "mel": np.stack(mels)}


def build_dataloader(metadata, cfg, shuffle, seed=0):
    table = DataTable.from_jsonl(
        metadata, converters={"wave": np.load, "feats": np.load})
    sampler = BatchSampler(len(table), cfg.batch_size, shuffle=shuffle,
                           drop_last=True)
    return DataLoader(table, sampler,
                      WaveFlowClip(cfg.clip_frames, cfg.n_shift, seed))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--train-metadata", type=Path, required=True)
    parser.add_argument("--dev-metadata", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("exp"))
    parser.add_argument("--opts", nargs="*", default=[])
    parser.add_argument("--profiler-options", default=None,
                        help="'batch_range=[50,60];profile_path=...;"
                             "exit_on_finished=true' jax-trace window "
                             "(reference --profiler_options)")
    add_device_arg(parser)
    parser.add_argument("--dp", type=int, default=0,
                        help="data-parallel devices (0 = single device; "
                             "batch_size must be divisible by this)")
    args = parser.parse_args()
    set_device(args.device)
    maybe_initialize_multihost()

    cfg = Config.from_yaml(args.config).merge_opts(args.opts)
    seed_everything(cfg.get("seed", 0),
                    rng_impl=cfg.get("rng_impl"))

    train_dl = build_dataloader(args.train_metadata, cfg, True,
                                cfg.get("seed", 0))
    dev_dl = build_dataloader(args.dev_metadata, cfg, False)
    sample = next(iter(train_dl))

    model = ConditionalWaveFlow(
        **resolve_model_kwargs(cfg.get("model", {})))
    opt_cfg = cfg.get("optimizer", {})
    tx = build_optimizer(opt_cfg.get("optim", "adam"),
                         opt_cfg.get("learning_rate", 2e-4))
    sigma = cfg.get("model", {}).get("sigma", 1.0)
    state = init_waveflow_train_state(
        model, tx, jax.random.PRNGKey(cfg.get("seed", 0)), sample)
    train_step = make_waveflow_train_step(model, tx, sigma=sigma)
    eval_step = make_waveflow_eval_step(model, sigma=sigma)

    mesh = None
    if args.dp:
        from parakeet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=args.dp)
    updater = StandardUpdater(train_step, state, train_dl, mesh=mesh)
    trainer = Trainer(updater, (cfg.max_iteration, "iteration"),
                      out=args.output_dir, log_interval=100,
                      profiler_options=args.profiler_options,
                      config=cfg)
    trainer.extend(StandardEvaluator(eval_step, dev_dl),
                   trigger=(cfg.get("valid_interval", 1000), "iteration"))
    trainer.extend(TensorBoardWriter(logdir=args.output_dir / "tb"),
                   trigger=(100, "iteration"))
    trainer.extend(Snapshot(max_size=cfg.get("num_snapshots", 5)),
                   trigger=(cfg.get("save_interval", 10000), "iteration"),
                   priority=-100)
    trainer.run()


if __name__ == "__main__":
    main()

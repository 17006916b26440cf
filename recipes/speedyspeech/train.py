#!/usr/bin/env python
"""SpeedySpeech training CLI (reference: examples/speedyspeech/baker/
train.py).  Expects normalized metadata with phones/tones/durations/feats.
"""
import argparse
from pathlib import Path

import jax
import numpy as np

from parakeet_tpu.data.collate import speedyspeech_batch_fn
from parakeet_tpu.data.dataloader import BatchSampler, DataLoader
from parakeet_tpu.data.datatable import DataTable
from parakeet_tpu.models.speedyspeech import SpeedySpeech
from parakeet_tpu.models.speedyspeech_updater import (
    init_speedyspeech_train_state, make_speedyspeech_eval_step,
    make_speedyspeech_train_step)
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


def build_dataloader(metadata, cfg, shuffle):
    table = DataTable.from_jsonl(metadata, converters={"feats": np.load})
    sampler = BatchSampler(len(table), cfg.batch_size, shuffle=shuffle,
                           drop_last=shuffle)
    return DataLoader(table, sampler, speedyspeech_batch_fn)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--train-metadata", type=Path, required=True)
    parser.add_argument("--dev-metadata", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("exp"))
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--tones-dict", type=Path, default=None)
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

    train_dl = build_dataloader(args.train_metadata, cfg, True)
    dev_dl = build_dataloader(args.dev_metadata, cfg, False)
    sample = next(iter(train_dl))

    vocab_size = sum(1 for _ in open(args.phones_dict))
    tone_size = (sum(1 for _ in open(args.tones_dict))
                 if args.tones_dict else None)
    model = SpeedySpeech(vocab_size=vocab_size, tone_size=tone_size,
                         **resolve_model_kwargs(cfg.get("model", {})))
    opt_cfg = cfg.get("optimizer", {})
    tx = build_optimizer(opt_cfg.get("optim", "adam"),
                         opt_cfg.get("learning_rate", 2e-3))
    state = init_speedyspeech_train_state(
        model, tx, jax.random.PRNGKey(cfg.get("seed", 0)), sample)
    train_step = make_speedyspeech_train_step(model, tx)
    eval_step = make_speedyspeech_eval_step(model)

    mesh = None
    if args.dp:
        from parakeet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=args.dp)
    updater = StandardUpdater(train_step, state, train_dl, mesh=mesh)
    trainer = Trainer(updater, (cfg.max_epoch, "epoch"),
                      out=args.output_dir,
                      profiler_options=args.profiler_options,
                      config=cfg)
    trainer.extend(StandardEvaluator(eval_step, dev_dl),
                   trigger=(1, "epoch"))
    trainer.extend(TensorBoardWriter(logdir=args.output_dir / "tb"),
                   trigger=(1, "iteration"))
    trainer.extend(Snapshot(max_size=cfg.get("num_snapshots", 5)),
                   trigger=(1, "epoch"), priority=-100)
    trainer.run()


if __name__ == "__main__":
    main()

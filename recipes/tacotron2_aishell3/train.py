#!/usr/bin/env python
"""GE2E-conditioned Tacotron2 training on AISHELL-3 (voice cloning).

Equivalent of the reference trainer (reference:
examples/tacotron2_aishell3/train.py:36 + aishell3.py:31-56): each batch
row carries a precomputed GE2E utterance embedding (``spk_emb``) that
conditions the encoder (Tacotron2 ``d_global_condition``).

Usage:
  python train.py --config conf/default.yaml \
      --train-metadata dump/metadata_train.jsonl \
      --dev-metadata dump/metadata_dev.jsonl \
      --phones-dict dump/phone_id_map.txt --output-dir exp
"""
import argparse
from pathlib import Path

import jax
import numpy as np

from parakeet_tpu.data.batch import batch_sequences, bucket_length
from parakeet_tpu.data.dataloader import BatchSampler, DataLoader
from parakeet_tpu.data.datatable import DataTable
from parakeet_tpu.models import (Tacotron2, init_tacotron2_train_state,
                                 make_tacotron2_eval_step,
                                 make_tacotron2_train_step)
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


def batch_fn(examples, text_bucket=16, frame_bucket=64):
    text_len = bucket_length(
        max(len(np.asarray(x["text"])) for x in examples), text_bucket)
    frame_len = bucket_length(
        max(np.asarray(x["speech"]).shape[0] for x in examples),
        frame_bucket)
    return {
        "text": batch_sequences(
            [np.asarray(x["text"], np.int64) for x in examples],
            length=text_len),
        "text_lengths": np.array(
            [len(np.asarray(x["text"])) for x in examples], np.int64),
        "speech": batch_sequences(
            [np.asarray(x["speech"], np.float32) for x in examples],
            length=frame_len),
        "speech_lengths": np.array(
            [np.asarray(x["speech"]).shape[0] for x in examples],
            np.int64),
        "spk_emb": np.stack([np.asarray(x["spk_emb"], np.float32)
                             for x in examples]),
    }


def build_dataloader(metadata, cfg, shuffle):
    converters = {"speech": np.load, "spk_emb": np.load}
    table = DataTable.from_jsonl(metadata, converters=converters)
    sampler = BatchSampler(len(table), cfg.batch_size, shuffle=shuffle,
                           drop_last=shuffle)
    return DataLoader(table, sampler, batch_fn)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--train-metadata", type=Path, required=True)
    parser.add_argument("--dev-metadata", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("exp"))
    parser.add_argument("--phones-dict", type=Path, required=True)
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

    train_dl = build_dataloader(args.train_metadata, cfg, shuffle=True)
    dev_dl = build_dataloader(args.dev_metadata, cfg, shuffle=False)
    sample = next(iter(train_dl))

    vocab_size = sum(1 for _ in open(args.phones_dict))
    model_kwargs = resolve_model_kwargs(cfg.get("model", {}))
    model_kwargs.setdefault("d_global_condition", 256)
    model = Tacotron2(vocab_size=vocab_size, **model_kwargs)
    opt_cfg = cfg.get("optimizer", {})
    tx = build_optimizer(opt_cfg.get("optim", "adam"),
                         opt_cfg.get("learning_rate", 1e-3))
    state = init_tacotron2_train_state(
        model, tx, jax.random.PRNGKey(cfg.get("seed", 0)), sample)
    upd = cfg.get("updater", {})
    train_step = make_tacotron2_train_step(model, tx, **upd)
    eval_step = make_tacotron2_eval_step(model, **upd)

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
    tb = TensorBoardWriter(logdir=args.output_dir / "tb")
    trainer.extend(tb, trigger=(1, "iteration"))
    # alignment/spectrogram figures on a fixed dev batch (reference logs
    # these to VisualDL in the valid loop, tacotron2_aishell3/train.py)
    from parakeet_tpu.models import make_tacotron2_predict_step
    from parakeet_tpu.training.extensions.figures import FigureWriter
    from parakeet_tpu.utils import display
    fig_batch = next(iter(dev_dl))
    predict_step = make_tacotron2_predict_step(model)

    def _figures(trainer):
        out = predict_step(trainer.updater.train_state, fig_batch)
        return {
            "alignment": display.plot_alignment(
                np.asarray(out["alignments"][0])),
            "mel_target": display.plot_spectrogram(
                np.asarray(fig_batch["speech"][0]).T),
            "mel_pred": display.plot_spectrogram(
                np.asarray(out["mel_outputs_postnet"][0]).T),
        }

    trainer.extend(FigureWriter(_figures, tb.writer), trigger=(1, "epoch"))
    trainer.extend(Snapshot(max_size=cfg.get("num_snapshots", 5)),
                   trigger=(1, "epoch"), priority=-100)
    trainer.run()


if __name__ == "__main__":
    main()

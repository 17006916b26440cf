#!/usr/bin/env python
"""FastSpeech2 training CLI.

Equivalent of the reference training entry (reference:
examples/fastspeech2/train.py:44-208), TPU-native: one jitted train step
(grad + update in one XLA program), data-parallel over all local devices
via batch sharding, Trainer/Snapshot/Evaluator/TensorBoard extensions.

Usage:
  python train.py --config conf/default.yaml \
      --train-metadata dump_norm/train/metadata.jsonl \
      --dev-metadata dump_norm/dev/metadata.jsonl \
      --output-dir exp/default [--opts batch_size 32 max_epoch 10]
"""
import argparse
import functools
from pathlib import Path

import jax
import numpy as np

from parakeet_tpu.data.collate import fastspeech2_batch_fn
from parakeet_tpu.data.dataloader import BatchSampler, DataLoader
from parakeet_tpu.data.datatable import DataTable
from parakeet_tpu.models import (FastSpeech2, init_fs2_train_state,
                                 make_fs2_eval_step, make_fs2_train_step)
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


def build_dataloader(metadata, cfg, shuffle, spk):
    table = DataTable.from_jsonl(
        metadata, converters={"speech": np.load, "pitch": np.load,
                              "energy": np.load})
    sampler = BatchSampler(len(table), cfg.batch_size, shuffle=shuffle,
                           drop_last=shuffle)
    collate = functools.partial(fastspeech2_batch_fn, spk=spk)
    return DataLoader(table, sampler, collate)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--train-metadata", type=Path, required=True)
    parser.add_argument("--dev-metadata", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("exp"))
    parser.add_argument("--phones-dict", type=Path, default=None)
    parser.add_argument("--speaker-dict", type=Path, default=None)
    parser.add_argument("--opts", nargs="*", default=[])
    parser.add_argument("--profiler-options", default=None,
                        help="'batch_range=[50,60];profile_path=...;"
                             "exit_on_finished=true' jax-trace window "
                             "(reference --profiler_options)")
    add_device_arg(parser)
    parser.add_argument("--dp", type=int, default=0,
                        help="data-parallel devices (0 = single device; "
                             "batch_size must be divisible by this)")
    parser.add_argument("--tp", type=int, default=0,
                        help="tensor-parallel devices: attention heads "
                             "and FFN hidden dims shard over a 'model' "
                             "mesh axis (composes with --dp as a "
                             "dp x tp mesh)")
    parser.add_argument("--pp", type=int, default=0,
                        help="pipeline-parallel stages: the encoder/"
                             "decoder layer stacks stream microbatches "
                             "through pp stages on the 'model' axis "
                             "(composes with --dp; mutually exclusive "
                             "with --tp; elayers/dlayers must be "
                             "divisible by pp)")
    parser.add_argument("--pp-microbatches", type=int, default=0,
                        help="microbatches per pipeline step (default: "
                             "pp stages; batch_size/dp must be "
                             "divisible by this)")
    args = parser.parse_args()
    if args.tp and args.pp:
        parser.error("--tp and --pp are mutually exclusive (both use "
                     "the 'model' mesh axis)")
    set_device(args.device)
    maybe_initialize_multihost()

    cfg = Config.from_yaml(args.config).merge_opts(args.opts)
    seed_everything(cfg.get("seed", 0),
                    rng_impl=cfg.get("rng_impl"))

    spk = args.speaker_dict is not None
    train_dl = build_dataloader(args.train_metadata, cfg, True, spk)
    dev_dl = build_dataloader(args.dev_metadata, cfg, False, spk)

    sample = next(iter(train_dl))
    odim = sample["speech"].shape[-1]
    if args.phones_dict:
        idim = sum(1 for _ in open(args.phones_dict))
    else:
        idim = int(max(sample["text"].max() + 1, 2))
    spk_num = (sum(1 for _ in open(args.speaker_dict))
               if args.speaker_dict else None)

    model_kwargs = resolve_model_kwargs(cfg.get("model", {}))
    if spk_num is not None:
        model_kwargs.setdefault("num_speakers", spk_num)
        model_kwargs.setdefault("spk_embed_dim", 256)
    init_type = model_kwargs.pop("init_type", None)
    model = FastSpeech2(idim=idim, odim=odim, **model_kwargs)
    opt_cfg = cfg.get("optimizer", {})
    tx = build_optimizer(opt_cfg.get("optim", "adam"),
                         opt_cfg.get("learning_rate", 1e-3))
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(
        cfg.get("seed", 0)), sample)
    if init_type:
        from parakeet_tpu.nn.initializer import initialize_pytree
        state = state.replace(params=initialize_pytree(
            state.params, jax.random.PRNGKey(cfg.get("seed", 0) + 1),
            init_type))

    mesh, spec_rule = None, None
    if args.dp or args.tp or args.pp:
        from parakeet_tpu.parallel import make_mesh
        mesh = make_mesh(data=args.dp or 1,
                         model=args.tp or args.pp or 1)
    if args.tp:
        from parakeet_tpu.parallel import fs2_tp_spec
        spec_rule = fs2_tp_spec
    if args.pp:
        # init stays the standard per-layer layout (identical numbers
        # to a non-PP run); convert the transformer stacks to the
        # depth-stacked layout the pipeline runner consumes and rebuild
        # the model/optimizer around it
        from parakeet_tpu.parallel import (make_pp_layer_runner,
                                           pp_stack_spec,
                                           stack_layer_params)
        spec_rule = pp_stack_spec
        runner = make_pp_layer_runner(
            mesh, "model",
            n_microbatches=args.pp_microbatches or args.pp)
        model = model.clone(layer_runner=runner)
        params = dict(state.params)
        for stack in ("encoder", "decoder"):
            params[stack] = stack_layer_params(
                params[stack], model.elayers if stack == "encoder"
                else model.dlayers)
        state = state.replace(params=params, opt_state=tx.init(params))

    train_step = make_fs2_train_step(model, tx,
                                     **cfg.get("updater", {}))
    eval_step = make_fs2_eval_step(model, **cfg.get("updater", {}))

    updater = StandardUpdater(train_step, state, train_dl, mesh=mesh,
                              param_spec_rule=spec_rule)
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

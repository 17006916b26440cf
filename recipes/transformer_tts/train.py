#!/usr/bin/env python
"""TransformerTTS training CLI (reference:
examples/transformer_tts/train.py)."""
import argparse
from pathlib import Path

import jax
import numpy as np

from parakeet_tpu.data.collate import transformer_tts_batch_fn
from parakeet_tpu.data.dataloader import BatchSampler, DataLoader
from parakeet_tpu.data.datatable import DataTable
from parakeet_tpu.models import TransformerTTS
from parakeet_tpu.models.transformer_tts_updater import (
    init_transformer_tts_train_state, make_transformer_tts_eval_step,
    make_transformer_tts_train_step)
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
    table = DataTable.from_jsonl(metadata, converters={"speech": np.load})
    sampler = BatchSampler(len(table), cfg.batch_size, shuffle=shuffle,
                           drop_last=shuffle)
    return DataLoader(table, sampler, transformer_tts_batch_fn)


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
    parser.add_argument("--tp", type=int, default=0,
                        help="tensor-parallel devices: attention heads "
                             "and FFN hidden dims shard over a 'model' "
                             "mesh axis (composes with --dp as a "
                             "dp x tp mesh)")
    args = parser.parse_args()
    set_device(args.device)
    maybe_initialize_multihost()

    cfg = Config.from_yaml(args.config).merge_opts(args.opts)
    seed_everything(cfg.get("seed", 0),
                    rng_impl=cfg.get("rng_impl"))

    train_dl = build_dataloader(args.train_metadata, cfg, True)
    dev_dl = build_dataloader(args.dev_metadata, cfg, False)
    sample = next(iter(train_dl))

    idim = sum(1 for _ in open(args.phones_dict))
    odim = sample["speech"].shape[-1]
    model_kwargs = resolve_model_kwargs(cfg.get("model", {}))
    init_type = model_kwargs.pop("init_type", None)
    model = TransformerTTS(idim=idim, odim=odim, **model_kwargs)
    opt_cfg = cfg.get("optimizer", {})
    tx = build_optimizer(opt_cfg.get("optim", "adam"),
                         opt_cfg.get("learning_rate", 1e-3))
    state = init_transformer_tts_train_state(
        model, tx, jax.random.PRNGKey(cfg.get("seed", 0)), sample)
    if init_type:
        from parakeet_tpu.nn.initializer import initialize_pytree
        state = state.replace(params=initialize_pytree(
            state.params, jax.random.PRNGKey(cfg.get("seed", 0) + 1),
            init_type))
    upd = cfg.get("updater", {})
    train_step = make_transformer_tts_train_step(model, tx, **upd)
    eval_step = make_transformer_tts_eval_step(model, **upd)

    mesh, spec_rule = None, None
    if args.dp or args.tp:
        from parakeet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=args.dp or 1, model=args.tp or 1)
    if args.tp:
        from parakeet_tpu.parallel.mesh import transformer_tp_spec
        spec_rule = transformer_tp_spec
    updater = StandardUpdater(train_step, state, train_dl, mesh=mesh,
                              param_spec_rule=spec_rule)
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
    from parakeet_tpu.models import make_transformer_tts_predict_step
    from parakeet_tpu.training.extensions.figures import FigureWriter
    from parakeet_tpu.utils import display
    fig_batch = next(iter(dev_dl))
    predict_step = make_transformer_tts_predict_step(model)

    def _figures(trainer):
        out = predict_step(trainer.updater.train_state, fig_batch)
        return {
            "alignment": display.plot_alignment(
                np.asarray(out["dec_cross_attns"][-1, 0].mean(0))),
            "mel_target": display.plot_spectrogram(
                np.asarray(fig_batch["speech"][0]).T),
            "mel_pred": display.plot_spectrogram(
                np.asarray(out["after_outs"][0]).T),
        }

    trainer.extend(FigureWriter(_figures, tb.writer), trigger=(1, "epoch"))
    trainer.extend(Snapshot(max_size=cfg.get("num_snapshots", 5)),
                   trigger=(1, "epoch"), priority=-100)
    trainer.run()


if __name__ == "__main__":
    main()

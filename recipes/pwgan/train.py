#!/usr/bin/env python
"""Parallel WaveGAN training CLI.

Equivalent of the reference training entry (reference:
examples/parallelwave_gan/baker/train.py), TPU-native: the two-optimizer
GAN step (generator + discriminator, warmup gating, multi-resolution STFT
loss) is ONE jitted XLA program per iteration.

Usage:
  python train.py --config conf/default.yaml \
      --train-metadata dump/metadata_train.jsonl \
      --dev-metadata dump/metadata_dev.jsonl --output-dir exp/default
"""
import argparse
from pathlib import Path

import jax
import numpy as np

from parakeet_tpu.data.collate import VocoderClip
from parakeet_tpu.data.dataloader import BatchSampler, DataLoader
from parakeet_tpu.data.datatable import DataTable
from parakeet_tpu.models import (PWGDiscriminator, PWGGenerator,
                                 init_pwg_train_state, make_pwg_eval_step,
                                 make_pwg_train_step)
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


def build_dataloader(metadata, cfg, shuffle, aux_context_window):
    table = DataTable.from_jsonl(
        metadata, converters={"wave": np.load, "feats": np.load})
    sampler = BatchSampler(len(table), cfg.batch_size, shuffle=shuffle,
                           drop_last=True)
    clip = VocoderClip(batch_max_steps=cfg.batch_max_steps,
                       hop_size=cfg.n_shift,
                       aux_context_window=aux_context_window)
    return DataLoader(table, sampler, clip)


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

    gen_params_cfg = resolve_model_kwargs(cfg.get("generator_params", {}))
    acw = gen_params_cfg.get("aux_context_window", 2)
    train_dl = build_dataloader(args.train_metadata, cfg, True, acw)
    dev_dl = build_dataloader(args.dev_metadata, cfg, False, acw)

    generator = PWGGenerator(**gen_params_cfg)
    discriminator = PWGDiscriminator(
        **resolve_model_kwargs(cfg.get("discriminator_params", {})))

    sample = next(iter(train_dl))
    g_cfg = cfg.get("generator_optimizer", {})
    d_cfg = cfg.get("discriminator_optimizer", {})
    gen_tx = build_optimizer(g_cfg.get("optim", "adam"),
                             g_cfg.get("learning_rate", 1e-4))
    disc_tx = build_optimizer(d_cfg.get("optim", "adam"),
                              d_cfg.get("learning_rate", 5e-5))

    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    import jax.numpy as jnp
    wav = jnp.asarray(sample["wav"])
    mel = jnp.asarray(sample["mel"])
    noise = jnp.zeros((*wav.shape, 1))
    gv = generator.init(rng, noise, mel)["params"]
    dv = discriminator.init(jax.random.fold_in(rng, 1),
                            wav[..., None])["params"]
    state = init_pwg_train_state(gv, dv, gen_tx, disc_tx,
                                 jax.random.fold_in(rng, 2))

    stft_cfg = cfg.get("stft_loss_params", {})
    step_kwargs = dict(
        lambda_adv=cfg.get("updater", {}).get("lambda_adv", 4.0),
        discriminator_train_start_steps=cfg.get("updater", {}).get(
            "discriminator_train_start_steps", 100000),
        fft_sizes=tuple(stft_cfg.get("fft_sizes", (1024, 2048, 512))),
        hop_sizes=tuple(stft_cfg.get("hop_sizes", (120, 240, 50))),
        win_lengths=tuple(stft_cfg.get("win_lengths", (600, 1200, 240))))
    train_step = make_pwg_train_step(generator, discriminator, gen_tx,
                                     disc_tx, **step_kwargs)
    eval_step = make_pwg_eval_step(generator, discriminator, **{
        k: v for k, v in step_kwargs.items()
        if k not in ("discriminator_train_start_steps",)})

    mesh = None
    if args.dp:
        from parakeet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=args.dp)
    updater = StandardUpdater(train_step, state, train_dl, mesh=mesh)
    trainer = Trainer(updater, (cfg.train_max_steps, "iteration"),
                      out=args.output_dir, log_interval=100,
                      profiler_options=args.profiler_options,
                      config=cfg)
    trainer.extend(StandardEvaluator(eval_step, dev_dl),
                   trigger=(cfg.get("eval_interval_steps", 1000),
                            "iteration"))
    trainer.extend(TensorBoardWriter(logdir=args.output_dir / "tb"),
                   trigger=(100, "iteration"))
    trainer.extend(Snapshot(max_size=cfg.get("num_snapshots", 5)),
                   trigger=(cfg.get("save_interval_steps", 10000),
                            "iteration"), priority=-100)
    trainer.run()


if __name__ == "__main__":
    main()

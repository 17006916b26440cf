"""SpeedySpeech training/eval steps (jitted).

Equivalent of the reference updater (reference:
parakeet/models/speedyspeech/speedyspeech_updater.py:33-157).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..training.state import TrainState
from .speedyspeech import speedyspeech_loss

__all__ = ["init_speedyspeech_train_state", "make_speedyspeech_train_step",
           "make_speedyspeech_eval_step"]


def _apply_args(batch):
    return dict(tones=batch.get("tones"), spk_id=batch.get("spk_id"))


def init_speedyspeech_train_state(model, tx, rng,
                                  sample_batch) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng}, jnp.asarray(sample_batch["phones"]),
        jnp.asarray(sample_batch["durations"]),
        **_apply_args(sample_batch),
        max_frames=int(sample_batch["feats"].shape[1]),
        deterministic=False)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      opt_state=tx.init(variables["params"]),
                      batch_stats=variables.get("batch_stats"),
                      rng=state_rng)


def make_speedyspeech_train_step(model, tx, *, jit: bool = True):
    def train_step(state: TrainState, batch):
        # expansion capacity = padded target length (bucketed; one jit
        # cache entry per frame bucket)
        max_frames = batch["feats"].shape[1]

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["phones"], batch["durations"], **_apply_args(batch),
                max_frames=max_frames, deterministic=False,
                mutable=["batch_stats"])
            losses = speedyspeech_loss(outputs, batch)
            return losses["loss"], (losses, mutated["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state,
                                  batch_stats=new_stats)
        return new_state, dict(losses)

    if jit:
        return jax.jit(train_step, donate_argnums=0)
    return train_step


def make_speedyspeech_eval_step(model, *, jit: bool = True):
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(
            variables, batch["phones"], batch["durations"],
            **_apply_args(batch), max_frames=batch["feats"].shape[1],
            deterministic=True)
        return speedyspeech_loss(outputs, batch)

    if jit:
        return jax.jit(eval_step)
    return eval_step

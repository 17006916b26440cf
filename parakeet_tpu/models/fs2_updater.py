"""FastSpeech2 training/eval steps (jitted).

Equivalent of the reference's FastSpeech2Updater/Evaluator (reference:
parakeet/models/fastspeech2/fastspeech2_updater.py:28-166) as pure
functions: forward + loss + grad + optimizer update in one XLA program,
with the Postnet's BatchNorm statistics carried in TrainState.batch_stats.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..training.state import TrainState
from .fastspeech2 import fastspeech2_loss

__all__ = ["make_fs2_train_step", "make_fs2_eval_step",
           "init_fs2_train_state"]

_BATCH_KEYS = ("text", "text_lengths", "speech", "speech_lengths",
               "durations", "pitch", "energy")


def init_fs2_train_state(model, tx, rng, sample_batch) -> TrainState:
    init_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng, "dropout": dropout_rng},
        *[jnp.asarray(sample_batch[k]) for k in _BATCH_KEYS],
        spk_id=(jnp.asarray(sample_batch["spk_id"])
                if "spk_id" in sample_batch else None),
        deterministic=False)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
        rng=state_rng,
    )


def make_fs2_train_step(model, tx, *, use_masking: bool = True,
                        use_weighted_masking: bool = False,
                        jit: bool = True):
    def train_step(state: TrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["text"], batch["text_lengths"], batch["speech"],
                batch["speech_lengths"], batch["durations"], batch["pitch"],
                batch["energy"],
                spk_id=batch.get("spk_id"), spk_emb=batch.get("spk_emb"),
                tone_id=batch.get("tone_id"),
                deterministic=False,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            losses = fastspeech2_loss(outputs, batch, use_masking,
                                      use_weighted_masking)
            return losses["loss"], (losses, mutated["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state,
                                  batch_stats=new_stats, rng=rng)
        metrics = dict(losses)
        metrics["batch_size"] = jnp.asarray(batch["text"].shape[0],
                                            jnp.float32)
        return new_state, metrics

    if jit:
        return jax.jit(train_step, donate_argnums=0)
    return train_step


def make_fs2_eval_step(model, *, use_masking: bool = True,
                       use_weighted_masking: bool = False, jit: bool = True):
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(
            variables,
            batch["text"], batch["text_lengths"], batch["speech"],
            batch["speech_lengths"], batch["durations"], batch["pitch"],
            batch["energy"],
            spk_id=batch.get("spk_id"), spk_emb=batch.get("spk_emb"),
            tone_id=batch.get("tone_id"),
            deterministic=True)
        return fastspeech2_loss(outputs, batch, use_masking,
                                use_weighted_masking)

    if jit:
        return jax.jit(eval_step)
    return eval_step

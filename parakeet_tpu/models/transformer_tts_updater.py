"""TransformerTTS training/eval steps (jitted).

Equivalent of the reference updater (reference:
parakeet/models/transformer_tts/transformer_tts_updater.py:31-322):
L1/L2 + stop BCE, optional guided (multi-head) attention losses on
selected encoder/decoder/cross attention stacks.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..training.state import TrainState
from .transformer_tts import (guided_multihead_attention_loss,
                              transformer_tts_loss)

__all__ = ["init_transformer_tts_train_state",
           "make_transformer_tts_train_step",
           "make_transformer_tts_eval_step",
           "make_transformer_tts_predict_step"]


def init_transformer_tts_train_state(model, tx, rng,
                                     sample_batch) -> TrainState:
    init_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng, "dropout": dropout_rng},
        jnp.asarray(sample_batch["text"]),
        jnp.asarray(sample_batch["text_lengths"]),
        jnp.asarray(sample_batch["speech"]),
        jnp.asarray(sample_batch["speech_lengths"]),
        spk_emb=(jnp.asarray(sample_batch["spk_emb"])
                 if "spk_emb" in sample_batch else None),
        deterministic=False)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      opt_state=tx.init(variables["params"]),
                      batch_stats=variables.get("batch_stats"),
                      rng=state_rng)


def _losses(model, outputs, batch, *, loss_type, bce_pos_weight,
            use_guided_attn_loss, guided_attn_sigma, guided_attn_lambda,
            num_layers_applied_guided_attn, num_heads_applied_guided_attn):
    losses = transformer_tts_loss(outputs, batch["speech"],
                                  batch["speech_lengths"],
                                  loss_type=loss_type,
                                  bce_pos_weight=bce_pos_weight)
    if use_guided_attn_loss:
        r = model.reduction_factor
        ga = guided_multihead_attention_loss(
            outputs["dec_cross_attns"], batch["speech_lengths"] // r,
            batch["text_lengths"] + 1,  # model appends <eos> to the text
            sigma=guided_attn_sigma,
            num_layers=num_layers_applied_guided_attn,
            num_heads=num_heads_applied_guided_attn)
        losses["guided_attn_loss"] = ga
        losses["loss"] = losses["loss"] + guided_attn_lambda * ga
    return losses


def make_transformer_tts_train_step(
        model, tx, *, loss_type: str = "L1", bce_pos_weight: float = 5.0,
        use_guided_attn_loss: bool = True, guided_attn_sigma: float = 0.4,
        guided_attn_lambda: float = 1.0,
        num_layers_applied_guided_attn: Optional[int] = 2,
        num_heads_applied_guided_attn: Optional[int] = 2,
        jit: bool = True):
    kwargs = dict(
        loss_type=loss_type, bce_pos_weight=bce_pos_weight,
        use_guided_attn_loss=use_guided_attn_loss,
        guided_attn_sigma=guided_attn_sigma,
        guided_attn_lambda=guided_attn_lambda,
        num_layers_applied_guided_attn=num_layers_applied_guided_attn,
        num_heads_applied_guided_attn=num_heads_applied_guided_attn)

    def train_step(state: TrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            outputs, mutated = model.apply(
                variables, batch["text"], batch["text_lengths"],
                batch["speech"], batch["speech_lengths"],
                spk_emb=batch.get("spk_emb"), deterministic=False,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            losses = _losses(model, outputs, batch, **kwargs)
            return losses["loss"], (losses,
                                    mutated.get("batch_stats"))

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state,
                                  batch_stats=new_stats, rng=rng)
        return new_state, dict(losses)

    if jit:
        return jax.jit(train_step, donate_argnums=0)
    return train_step


def make_transformer_tts_eval_step(
        model, *, loss_type: str = "L1", bce_pos_weight: float = 5.0,
        use_guided_attn_loss: bool = True, guided_attn_sigma: float = 0.4,
        guided_attn_lambda: float = 1.0,
        num_layers_applied_guided_attn: Optional[int] = 2,
        num_heads_applied_guided_attn: Optional[int] = 2,
        jit: bool = True):
    kwargs = dict(
        loss_type=loss_type, bce_pos_weight=bce_pos_weight,
        use_guided_attn_loss=use_guided_attn_loss,
        guided_attn_sigma=guided_attn_sigma,
        guided_attn_lambda=guided_attn_lambda,
        num_layers_applied_guided_attn=num_layers_applied_guided_attn,
        num_heads_applied_guided_attn=num_heads_applied_guided_attn)

    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        rng = state.rng if state.rng is not None else jax.random.PRNGKey(0)
        outputs = model.apply(
            variables, batch["text"], batch["text_lengths"],
            batch["speech"], batch["speech_lengths"],
            spk_emb=batch.get("spk_emb"), deterministic=True,
            rngs={"dropout": rng})
        return _losses(model, outputs, batch, **kwargs)

    if jit:
        return jax.jit(eval_step)
    return eval_step


def make_transformer_tts_predict_step(model, jit: bool = True):
    """Teacher-forced forward returning the raw output dict (attention
    stacks, mel predictions) for figure logging (reference logs
    multi-head alignments during eval, transformer_tts notebook/recipe)."""
    def predict_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        rng = state.rng if state.rng is not None else jax.random.PRNGKey(0)
        return model.apply(
            variables, batch["text"], batch["text_lengths"],
            batch["speech"], batch["speech_lengths"],
            spk_emb=batch.get("spk_emb"), deterministic=True,
            rngs={"dropout": rng})

    if jit:
        return jax.jit(predict_step)
    return predict_step

"""Parallel WaveGAN training: one jitted two-optimizer GAN step.

Behavioral equivalent of the reference's PWGUpdater (reference:
parakeet/models/parallel_wavegan/parallel_wavegan_updater.py:36-151):
generator loss = multi-resolution STFT (sc + mag) + lambda_adv * MSE(D(y^),1)
once past ``discriminator_train_start_steps``; discriminator loss =
MSE(D(y),1) + MSE(D(y^detached),0), with the fake regenerated from the
*updated* generator (matching the reference's post-step regeneration).
TPU-first: the whole step — both grads, both optimizer updates — is one
XLA program.  The warm-up gating is resolved on the HOST, not with
``lax.cond``: XLA conditionals block fusion and copy their operands
(measured 14.6 ms on the bs6 bf16 GAN step, docs/tpu_performance.md
round 5), so ``make_pwg_train_step`` compiles two specialized programs
(discriminator statically off / statically on) and dispatches by a
host-side step counter — data-dependent control flow stays out of the
compiled graph (net +2.4–3.7 ms/step on the bs6 bf16 GAN step).
State buffers are donated, schedulers are optax schedules inside the
optimizer chains.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from ..ops.stft_loss import multi_resolution_stft_loss
from ..training.state import TrainState

__all__ = ["make_pwg_train_step", "make_pwg_eval_step",
           "init_pwg_train_state"]


def _mse(x, target):
    # losses reduce in fp32 regardless of the model compute dtype (also
    # keeps lax.cond branch types equal against fp32 zero branches)
    x = x.astype(jnp.float32)
    return jnp.mean(jnp.square(x - target))


def init_pwg_train_state(gen_params, disc_params, gen_tx, disc_tx, rng
                         ) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"generator": gen_params, "discriminator": disc_params},
        opt_state={"generator": gen_tx.init(gen_params),
                   "discriminator": disc_tx.init(disc_params)},
        rng=rng,
    )


def make_pwg_train_step(generator, discriminator, gen_tx, disc_tx, *,
                        lambda_adv: float = 4.0,
                        discriminator_train_start_steps: int = 100000,
                        fft_sizes=(1024, 2048, 512),
                        hop_sizes=(120, 240, 50),
                        win_lengths=(600, 1200, 240),
                        jit: bool = True):
    """Build ``(TrainState, {wav, mel}) -> (TrainState, metrics)``.

    When ``jit`` is on and ``discriminator_train_start_steps > 0`` the
    returned callable is a host-side dispatcher over TWO compiled
    programs — discriminator statically off (pure generator pre-training)
    and statically on — switched by a python step counter initialised
    from ``state.step`` on first call (one host sync total).  A
    ``lax.cond`` gate instead costs a net 2.4–3.7 ms/step on the bs6
    bf16 GAN step (round-5, docs/tpu_performance.md): XLA conditionals
    block fusion and copy their operands, and they pay that price on
    EVERY step of the run, long after the warm-up boundary has passed.
    """

    def mrstft(x, y):
        return multi_resolution_stft_loss(
            x, y, fft_sizes, hop_sizes, win_lengths)

    def _build(disc_static: str):
        # disc_static: 'on' | 'off' (statically specialized programs)
        # | 'cond' (single program, lax.cond gating — the jit=False
        # reference semantics, and the shape every variant must match)
        assert disc_static in ("on", "off", "cond")

        def train_step(state: TrainState, batch):
            wav, mel = batch["wav"], batch["mel"]
            rng, noise_rng, drop_rng = jax.random.split(state.rng, 3)
            noise = jax.random.normal(noise_rng, (*wav.shape, 1),
                                      dtype=wav.dtype)
            disc_on = state.step >= discriminator_train_start_steps
            d_params = state.params["discriminator"]

            # ---------------- generator update ----------------
            def gen_loss_fn(g_params):
                # deterministic=False selects the training forward:
                # dropout is live, and stack_impl='pallas' routes the
                # residual stack through the custom-VJP fused kernels
                # (pwg_stack_train.py; 'auto'/'xla' differentiate
                # through the XLA path)
                fake = generator.apply({"params": g_params}, noise, mel,
                                       deterministic=False,
                                       rngs={"dropout": drop_rng})
                sc_loss, mag_loss = mrstft(fake[..., 0], wav)

                def adv_fn(_):
                    logits = discriminator.apply({"params": d_params},
                                                 fake)
                    return _mse(logits, 1.0)

                if disc_static == "on":
                    adv_loss = adv_fn(None)
                    loss = sc_loss + mag_loss + lambda_adv * adv_loss
                elif disc_static == "off":
                    adv_loss = jnp.asarray(0.0)
                    loss = sc_loss + mag_loss
                else:
                    adv_loss = jax.lax.cond(disc_on, adv_fn,
                                            lambda _: jnp.asarray(0.0),
                                            None)
                    loss = sc_loss + mag_loss \
                        + jnp.where(disc_on, lambda_adv, 0.0) * adv_loss
                return loss, (sc_loss, mag_loss, adv_loss)

            (gen_loss, (sc_loss, mag_loss, adv_loss)), g_grads = \
                jax.value_and_grad(gen_loss_fn, has_aux=True)(
                    state.params["generator"])
            g_updates, g_opt = gen_tx.update(
                g_grads, state.opt_state["generator"],
                state.params["generator"])
            g_params = optax.apply_updates(state.params["generator"],
                                           g_updates)

            # ---------------- discriminator update ----------------
            def disc_update(operand):
                d_params, d_opt = operand
                # same training-mode forward as the generator update — D
                # must see the exact fake distribution G was optimized
                # against (under stack_impl='pallas' the stop_gradient
                # keeps this regeneration on the saveless primal kernel,
                # so it pays no residual-stream writes)
                fake = jax.lax.stop_gradient(
                    generator.apply({"params": g_params}, noise, mel,
                                    deterministic=False,
                                    rngs={"dropout": drop_rng}))

                def d_loss_fn(dp):
                    real_logits = discriminator.apply({"params": dp},
                                                      wav[..., None])
                    fake_logits = discriminator.apply({"params": dp},
                                                      fake)
                    real_loss = _mse(real_logits, 1.0)
                    fake_loss = _mse(fake_logits, 0.0)
                    return real_loss + fake_loss, (real_loss, fake_loss)

                (d_loss, (real_loss, fake_loss)), d_grads = \
                    jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
                d_updates, d_opt = disc_tx.update(d_grads, d_opt,
                                                  d_params)
                d_params = optax.apply_updates(d_params, d_updates)
                return d_params, d_opt, d_loss, real_loss, fake_loss

            def disc_noop(operand):
                d_params, d_opt = operand
                zero = jnp.asarray(0.0)
                return d_params, d_opt, zero, zero, zero

            operand = (d_params, state.opt_state["discriminator"])
            if disc_static == "on":
                d_params, d_opt, d_loss, real_loss, fake_loss = \
                    disc_update(operand)
            elif disc_static == "off":
                d_params, d_opt, d_loss, real_loss, fake_loss = \
                    disc_noop(operand)
            else:
                d_params, d_opt, d_loss, real_loss, fake_loss = \
                    jax.lax.cond(disc_on, disc_update, disc_noop, operand)

            new_state = state.replace(
                step=state.step + 1,
                params={"generator": g_params,
                        "discriminator": d_params},
                opt_state={"generator": g_opt, "discriminator": d_opt},
                rng=rng,
            )
            metrics = {
                "generator_loss": gen_loss,
                "spectral_convergence_loss": sc_loss,
                "log_stft_magnitude_loss": mag_loss,
                "adversarial_loss": adv_loss,
                "discriminator_loss": d_loss,
                "real_loss": real_loss,
                "fake_loss": fake_loss,
            }
            return new_state, metrics

        return train_step

    if not jit:
        return _build("cond")
    if discriminator_train_start_steps <= 0:
        return jax.jit(_build("on"), donate_argnums=0)

    step_off = jax.jit(_build("off"), donate_argnums=0)
    step_on = jax.jit(_build("on"), donate_argnums=0)
    counter = [None]                       # host-side step mirror

    def dispatch(state: TrainState, batch):
        if counter[0] is None:
            # one-time sync: resume lands on the right program
            counter[0] = int(jax.device_get(state.step))
        fn = (step_on if counter[0] >= discriminator_train_start_steps
              else step_off)
        counter[0] += 1
        return fn(state, batch)

    return dispatch


def make_pwg_eval_step(generator, discriminator, *,
                       lambda_adv: float = 4.0,
                       fft_sizes=(1024, 2048, 512),
                       hop_sizes=(120, 240, 50),
                       win_lengths=(600, 1200, 240),
                       jit: bool = True):
    """Loss-only evaluation step (reference: PWGEvaluator)."""

    def eval_step(state: TrainState, batch):
        wav, mel = batch["wav"], batch["mel"]
        noise = jax.random.normal(jax.random.PRNGKey(0),
                                  (*wav.shape, 1), dtype=wav.dtype)
        fake = generator.apply({"params": state.params["generator"]},
                               noise, mel)
        sc_loss, mag_loss = multi_resolution_stft_loss(
            fake[..., 0], wav, fft_sizes, hop_sizes, win_lengths)
        logits = discriminator.apply(
            {"params": state.params["discriminator"]}, fake)
        adv_loss = _mse(logits, 1.0)
        return {
            "generator_loss": sc_loss + mag_loss + lambda_adv * adv_loss,
            "spectral_convergence_loss": sc_loss,
            "log_stft_magnitude_loss": mag_loss,
            "adversarial_loss": adv_loss,
        }

    if jit:
        return jax.jit(eval_step)
    return eval_step

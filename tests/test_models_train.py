"""Model-training integration: FastSpeech2 + PWG jitted steps, DP sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

from parakeet_tpu import training as T
from parakeet_tpu.models import (FastSpeech2, PWGDiscriminator, PWGGenerator,
                                 init_fs2_train_state, init_pwg_train_state,
                                 make_fs2_eval_step, make_fs2_train_step,
                                 make_pwg_train_step, pwg_inference)
from parakeet_tpu.parallel import make_mesh, replicate, shard_batch


def tiny_fs2():
    return FastSpeech2(idim=30, odim=10, adim=16, aheads=2, elayers=1,
                       eunits=32, dlayers=1, dunits=32, postnet_layers=2,
                       postnet_chans=8, postnet_filts=5,
                       duration_predictor_chans=16,
                       pitch_predictor_chans=16, energy_predictor_chans=16)


def fs2_batch(b=2, t=8, frames=32, odim=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": jnp.asarray(rng.integers(1, 30, (b, t))),
        "text_lengths": jnp.asarray(np.full(b, t)),
        "speech": jnp.asarray(
            rng.standard_normal((b, frames, odim)).astype(np.float32)),
        "speech_lengths": jnp.asarray(np.full(b, frames)),
        "durations": jnp.asarray(np.full((b, t), frames // t, np.int64)),
        "pitch": jnp.asarray(rng.standard_normal((b, t, 1)).astype(
            np.float32)),
        "energy": jnp.asarray(rng.standard_normal((b, t, 1)).astype(
            np.float32)),
    }


def test_fs2_train_step_reduces_loss():
    model = tiny_fs2()
    tx = T.build_optimizer("adam", 1e-2)
    batch = fs2_batch()
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_fs2_train_step(model, tx)
    first = None
    for _ in range(12):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert int(state.step) == 12
    assert float(metrics["loss"]) < first
    assert np.isfinite(float(metrics["loss"]))

    eval_step = make_fs2_eval_step(model)
    ev = eval_step(state, batch)
    assert np.isfinite(float(ev["loss"]))


def test_fs2_trainer_end_to_end(tmp_path):
    model = tiny_fs2()
    tx = T.build_optimizer("adam", 1e-3)
    batches = [fs2_batch(seed=s) for s in range(3)]
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0),
                                 batches[0])
    step = make_fs2_train_step(model, tx)
    updater = T.StandardUpdater(step, state, batches)
    trainer = T.Trainer(updater, stop_trigger=(7, "iteration"),
                        out=tmp_path)
    trainer.extend(T.Snapshot(max_size=2), trigger=(5, "iteration"))
    eval_step = make_fs2_eval_step(model)
    trainer.extend(T.StandardEvaluator(eval_step, batches[:1]),
                   trigger=(5, "iteration"))
    trainer.run()
    assert updater.state.iteration == 7
    assert (tmp_path / "checkpoints" / "snapshot_iter_5.npz").exists()
    # resume from snapshot
    state2 = init_fs2_train_state(model, tx, jax.random.PRNGKey(1),
                                  batches[0])
    updater2 = T.StandardUpdater(step, state2, batches)
    trainer2 = T.Trainer(updater2, stop_trigger=(9, "iteration"),
                         out=tmp_path)
    trainer2.extend(T.Snapshot(max_size=2), trigger=(5, "iteration"))
    trainer2.run()
    assert updater2.state.iteration == 9


def test_pwg_gan_step_warmup_gating():
    gen = PWGGenerator(layers=2, stacks=1, residual_channels=4,
                       gate_channels=8, skip_channels=4,
                       upsample_scales=(2, 2), aux_context_window=1)
    disc = PWGDiscriminator(layers=3, conv_channels=4)
    hop = gen.upsample_factor
    b, frames = 2, 12
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, frames * hop)).astype(np.float32))
    mel = jnp.asarray(np.random.default_rng(1).standard_normal(
        (b, frames + 2, 80)).astype(np.float32))
    noise = jnp.zeros((b, frames * hop, 1))
    gv = gen.init(jax.random.PRNGKey(0), noise, mel)["params"]
    dv = disc.init(jax.random.PRNGKey(1), wav[..., None])["params"]

    gen_tx = T.build_optimizer("adam", 1e-3)
    disc_tx = T.build_optimizer("adam", 1e-3)
    state = init_pwg_train_state(gv, dv, gen_tx, disc_tx,
                                 jax.random.PRNGKey(2))
    step = make_pwg_train_step(gen, disc, gen_tx, disc_tx,
                               lambda_adv=4.0,
                               discriminator_train_start_steps=2)
    batch = {"wav": wav, "mel": mel}
    # Snapshot to host: the jitted step donates `state`, which deletes the
    # device buffers d0 would otherwise alias.
    d0 = jax.device_get(state.params["discriminator"])

    # steps 0, 1: warm-up — disc untouched, adversarial loss zero
    state, m = step(state, batch)
    assert float(m["adversarial_loss"]) == 0.0
    assert float(m["discriminator_loss"]) == 0.0
    state, m = step(state, batch)
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)),
        state.params["discriminator"], d0))
    assert same
    # step 2: discriminator kicks in
    state, m = step(state, batch)
    assert float(m["discriminator_loss"]) > 0.0
    changed = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)),
        state.params["discriminator"], d0))
    assert changed
    assert np.isfinite(float(m["generator_loss"]))


def test_pwg_inference_length():
    gen = PWGGenerator(layers=2, stacks=1, residual_channels=4,
                       gate_channels=8, skip_channels=4,
                       upsample_scales=(2, 2), aux_context_window=1)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (7, 80)).astype(np.float32))
    noise = jnp.zeros((1, 7 * 4, 1))
    variables = gen.init(jax.random.PRNGKey(0), noise,
                         jnp.zeros((1, 9, 80)))
    wav = pwg_inference(gen, variables, mel, rng=jax.random.PRNGKey(1))
    assert wav.shape == (28,)


def test_fs2_data_parallel_8dev():
    assert jax.device_count() == 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh(data=8)
    model = tiny_fs2()
    tx = T.build_optimizer("adam", 1e-3)
    batch = fs2_batch(b=16)
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0), batch)
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    step = make_fs2_train_step(model, tx)
    state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated after the step
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_pwg_train_step_bf16():
    """GAN train step with bf16 compute models: losses reduce in fp32
    (lax.cond branch types stay equal) and stay finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from parakeet_tpu.models import (PWGDiscriminator, PWGGenerator,
                                     init_pwg_train_state,
                                     make_pwg_train_step)
    from parakeet_tpu.training.optimizer import build_optimizer
    gen = PWGGenerator(layers=2, stacks=1, residual_channels=4,
                       gate_channels=8, skip_channels=4, aux_channels=10,
                       aux_context_window=1, upsample_scales=(4, 5),
                       dtype=jnp.bfloat16)
    disc = PWGDiscriminator(layers=3, conv_channels=4,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames, hop = 10, 20
    batch = {
        "wav": jnp.asarray(rng.standard_normal(
            (2, frames * hop)).astype(np.float32)),
        "mel": jnp.asarray(rng.standard_normal(
            (2, frames + 2, 10)).astype(np.float32)),
    }
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    gp = gen.init({"params": k1, "dropout": k2},
                  jnp.zeros((2, frames * hop, 1)),
                  batch["mel"], deterministic=False)["params"]
    dp = disc.init(k3, jnp.zeros((2, frames * hop, 1)))["params"]
    gen_tx = build_optimizer("adam", 1e-4)
    disc_tx = build_optimizer("adam", 5e-5)
    state = init_pwg_train_state(gp, dp, gen_tx, disc_tx,
                                 jax.random.PRNGKey(1))
    step = make_pwg_train_step(
        gen, disc, gen_tx, disc_tx,
        fft_sizes=(64,), hop_sizes=(16,), win_lengths=(32,),
        discriminator_train_start_steps=1)
    for _ in range(2):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["generator_loss"]))


# ---- bf16 compute sweep: every family's train step under mixed
# precision (params fp32, activations bf16) must run and stay finite ----

def _bf16_family_impls():
    import jax
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.default_rng(0)

    def fs2():

        from parakeet_tpu.models import FastSpeech2, init_fs2_train_state, make_fs2_train_step
        from parakeet_tpu.training.optimizer import build_optimizer
        m = FastSpeech2(idim=11, odim=6, adim=16, aheads=2, elayers=1, eunits=24,
                        dlayers=1, dunits=24, postnet_layers=1, postnet_chans=8,
                        postnet_filts=3, duration_predictor_chans=8,
                        pitch_predictor_chans=8, energy_predictor_chans=8,
                        dtype=jnp.bfloat16)
        b = {"text": jnp.asarray(rng.integers(1, 11, (2, 5))),
             "text_lengths": jnp.full((2,), 5),
             "speech": jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32)),
             "speech_lengths": jnp.full((2,), 8),
             "durations": jnp.asarray([[2,2,2,1,1]]*2),
             "pitch": jnp.zeros((2,5,1)), "energy": jnp.zeros((2,5,1))}
        tx = build_optimizer("adam", 1e-3)
        st = init_fs2_train_state(m, tx, jax.random.PRNGKey(0), b)
        step = make_fs2_train_step(m, tx)
        st, met = step(st, b)
        assert np.isfinite(float(met["loss"]))

    def sps():
        from parakeet_tpu.models import (SpeedySpeech, init_speedyspeech_train_state,
                                         make_speedyspeech_train_step)
        from parakeet_tpu.training.optimizer import build_optimizer
        m = SpeedySpeech(vocab_size=11, encoder_hidden_size=8, encoder_kernel_size=3,
                         encoder_dilations=(1,), decoder_hidden_size=8,
                         decoder_kernel_size=3, decoder_dilations=(1,),
                         decoder_output_size=6, duration_predictor_hidden_size=8,
                         dtype=jnp.bfloat16)
        b = {"phones": jnp.asarray(rng.integers(1, 11, (2, 5))),
             "num_phones": jnp.full((2,), 5),
             "feats": jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32)),
             "num_frames": jnp.full((2,), 8),
             "durations": jnp.asarray([[2,2,2,1,1]]*2)}
        tx = build_optimizer("adam", 1e-3)
        st = init_speedyspeech_train_state(m, tx, jax.random.PRNGKey(0), b)
        step = make_speedyspeech_train_step(m, tx)
        st, met = step(st, b)
        assert np.isfinite(float(met["loss"]))

    def t2():
        from parakeet_tpu.models import (Tacotron2, init_tacotron2_train_state,
                                         make_tacotron2_train_step)
        from parakeet_tpu.training.optimizer import build_optimizer
        m = Tacotron2(vocab_size=11, d_mels=6, d_encoder=8, encoder_conv_layers=1,
                      encoder_kernel_size=3, d_prenet=4, d_attention_rnn=8,
                      d_decoder_rnn=8, d_attention=8, attention_filters=4,
                      attention_kernel_size=5, d_postnet=4, postnet_kernel_size=3,
                      postnet_conv_layers=2, dtype=jnp.bfloat16)
        b = {"text": jnp.asarray(rng.integers(1, 11, (2, 5))),
             "text_lengths": jnp.full((2,), 5),
             "speech": jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32)),
             "speech_lengths": jnp.full((2,), 8)}
        tx = build_optimizer("adam", 1e-3)
        st = init_tacotron2_train_state(m, tx, jax.random.PRNGKey(0), b)
        step = make_tacotron2_train_step(m, tx)
        st, met = step(st, b)
        assert np.isfinite(float(met["loss"]))

    def ttts():
        from parakeet_tpu.models import (TransformerTTS,
                                         init_transformer_tts_train_state,
                                         make_transformer_tts_train_step)
        from parakeet_tpu.training.optimizer import build_optimizer
        m = TransformerTTS(idim=11, odim=6, adim=16, aheads=2, elayers=1,
                           eunits=24, dlayers=1, dunits=24, eprenet_conv_layers=0,
                           dprenet_units=8, postnet_layers=2, postnet_chans=8,
                           postnet_filts=3, dtype=jnp.bfloat16)
        b = {"text": jnp.asarray(rng.integers(1, 11, (2, 5))),
             "text_lengths": jnp.full((2,), 5),
             "speech": jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32)),
             "speech_lengths": jnp.full((2,), 8)}
        tx = build_optimizer("adam", 1e-3)
        st = init_transformer_tts_train_state(m, tx, jax.random.PRNGKey(0), b)
        step = make_transformer_tts_train_step(m, tx)
        st, met = step(st, b)
        assert np.isfinite(float(met["loss"]))

    def wf():
        from parakeet_tpu.models import (ConditionalWaveFlow,
                                         init_waveflow_train_state,
                                         make_waveflow_train_step)
        from parakeet_tpu.training.optimizer import build_optimizer
        m = ConditionalWaveFlow(upsample_factors=(4, 5), n_flows=2, n_layers=2,
                                n_group=4, channels=8, n_mels=6,
                                dtype=jnp.bfloat16)
        b = {"wav": jnp.asarray(rng.standard_normal((2, 8*20)).astype(np.float32)),
             "mel": jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32))}
        tx = build_optimizer("adam", 1e-3)
        st = init_waveflow_train_state(m, tx, jax.random.PRNGKey(0), b)
        step = make_waveflow_train_step(m, tx)
        st, met = step(st, b)
        assert np.isfinite(float(met["loss"]))

    def ge2e():
        from parakeet_tpu.models import LSTMSpeakerEncoder
        from parakeet_tpu.models.ge2e_updater import init_ge2e_train_state, make_ge2e_train_step
        from parakeet_tpu.training.optimizer import build_optimizer
        m = LSTMSpeakerEncoder(n_mels=6, num_layers=1, hidden_size=8,
                               output_size=4, dtype=jnp.bfloat16)
        b = {"utterances": jnp.asarray(rng.standard_normal(
            (4*3, 10, 6)).astype(np.float32))}
        tx = build_optimizer("adam", 1e-3)
        st = init_ge2e_train_state(m, tx, jax.random.PRNGKey(0), b,
                                   n_speakers=4)
        step = make_ge2e_train_step(m, tx, n_speakers=4)
        st, met = step(st, b)
        assert np.isfinite(float(met["loss"]))

    return {"fastspeech2": fs2, "speedyspeech": sps, "tacotron2": t2,
            "transformer_tts": ttts, "waveflow": wf, "ge2e": ge2e}


@pytest.mark.parametrize("family", ["fastspeech2", "speedyspeech",
                                    "tacotron2", "transformer_tts",
                                    "waveflow", "ge2e"])
def test_train_step_bf16(family):
    _bf16_family_impls()[family]()

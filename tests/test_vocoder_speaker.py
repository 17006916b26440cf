"""WaveFlow + GE2E speaker encoder tests (tiny shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

from parakeet_tpu.models.lstm_speaker_encoder import (
    LSTMSpeakerEncoder, compute_eer, ge2e_loss, scale_wb_gradients,
    similarity_matrix)
from parakeet_tpu.models.waveflow import (ConditionalWaveFlow, fold, unfold,
                                          waveflow_loss)
from parakeet_tpu.models.ge2e_updater import (init_ge2e_train_state,
                                              make_ge2e_train_step)
from parakeet_tpu.training.optimizer import build_optimizer


def test_fold_roundtrip():
    x = jnp.arange(64.0).reshape(2, 32)
    np.testing.assert_array_equal(np.asarray(unfold(fold(x, 4))),
                                  np.asarray(x))
    # consecutive samples run down the height axis
    f = fold(x, 4)
    np.testing.assert_array_equal(np.asarray(f[0, :, 0]), [0, 1, 2, 3])


@pytest.fixture(scope="module")
def wf():
    model = ConditionalWaveFlow(upsample_factors=(4, 4), n_flows=4,
                                n_layers=2, n_group=4, channels=8, n_mels=6)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 6, 6)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((2, 96)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), audio, mel)
    return model, variables, audio, mel


def test_waveflow_forward_identity_at_init(wf):
    """Zero-init output projections => each flow starts as the identity."""
    model, variables, audio, mel = wf
    z, logs_sum = model.apply(variables, audio, mel)
    assert z.shape == (2, 96)
    np.testing.assert_allclose(np.asarray(logs_sum), 0.0, atol=1e-6)
    losses = waveflow_loss(z, logs_sum)
    assert np.isfinite(float(losses["loss"]))


def test_waveflow_invertibility_nontrivial(wf):
    """decoder.inverse(decoder(x)) == x with non-identity flows."""
    model, variables, audio, mel = wf
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    pert = {"params": jax.tree_util.tree_unflatten(treedef, leaves)}
    cond = model.apply(pert, mel, method=lambda m, mel: m.encoder(mel))
    t = (cond.shape[1] // 4) * 4
    z, logs_sum = model.apply(pert, audio[:, :t], cond[:, :t],
                              method=lambda m, a, c: m.decoder(a, c))
    x = model.apply(pert, z, cond[:, :t],
                    method=lambda m, z, c: m.decoder.inverse(z, c))
    np.testing.assert_allclose(np.asarray(x), np.asarray(audio[:, :t]),
                               atol=1e-3)
    assert abs(float(logs_sum.sum())) > 1e-3   # genuinely non-identity


def test_waveflow_invertibility_height_dilated():
    """n_group >= 32 uses height-dilated convs (reference
    waveflow.py:420-426); the scan sampler must still invert exactly."""
    model = ConditionalWaveFlow(upsample_factors=(4, 4), n_flows=2,
                                n_layers=3, n_group=32, channels=8,
                                n_mels=6)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, 8, 6)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), audio, mel)
    # n_group=32 -> layer height dilations (1, 2, 4)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(8), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    pert = {"params": jax.tree_util.tree_unflatten(treedef, leaves)}
    cond = model.apply(pert, mel, method=lambda m, mel: m.encoder(mel))
    t = (cond.shape[1] // 32) * 32
    z, logs_sum = model.apply(pert, audio[:, :t], cond[:, :t],
                              method=lambda m, a, c: m.decoder(a, c))
    x = model.apply(pert, z, cond[:, :t],
                    method=lambda m, z, c: m.decoder.inverse(z, c))
    np.testing.assert_allclose(np.asarray(x), np.asarray(audio[:, :t]),
                               atol=1e-3)
    assert abs(float(logs_sum.sum())) > 1e-3


def test_waveflow_infer_shape(wf):
    model, variables, _, mel = wf
    wav = model.apply(variables, mel, jax.random.PRNGKey(1),
                      method=ConditionalWaveFlow.infer)
    assert wav.shape == (2, 96)


def test_ge2e_similarity_and_loss():
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.standard_normal((3, 4, 8)).astype(np.float32))
    embeds = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
    sim = similarity_matrix(embeds)
    assert sim.shape == (3, 4, 3)
    assert float(jnp.max(jnp.abs(sim))) <= 1.0 + 1e-5
    loss, metrics = ge2e_loss(embeds, jnp.asarray(10.0), jnp.asarray(-5.0))
    assert np.isfinite(float(loss))
    eer = compute_eer(np.asarray(metrics["sim"]), 3)
    assert 0.0 <= eer <= 1.0


def test_ge2e_train_step_wb_scaled():
    model = LSTMSpeakerEncoder(n_mels=6, num_layers=2, hidden_size=8,
                               output_size=8)
    rng = np.random.default_rng(0)
    batch = {"utterances": jnp.asarray(
        rng.standard_normal((3 * 4, 10, 6)).astype(np.float32))}
    tx = build_optimizer("adam", 1e-3)
    state = init_ge2e_train_state(model, tx, jax.random.PRNGKey(0), batch, 3)
    step = make_ge2e_train_step(model, tx, 3)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_scale_wb_gradients_only_touches_wb():
    grads = {"similarity_weight": jnp.asarray(1.0),
             "similarity_bias": jnp.asarray(2.0),
             "linear": {"kernel": jnp.ones((2, 2))}}
    out = scale_wb_gradients(grads, 0.01)
    assert float(out["similarity_weight"]) == pytest.approx(0.01)
    assert float(out["similarity_bias"]) == pytest.approx(0.02)
    np.testing.assert_array_equal(np.asarray(out["linear"]["kernel"]),
                                  np.ones((2, 2)))


def test_waveflow_upsample_matches_convtranspose_odd_and_even():
    """Polyphase UpsampleNet == flax ConvTranspose(SAME) for odd AND even
    scales (odd scales exercise the ceil-side SAME padding split)."""
    import flax.linen as nn
    from parakeet_tpu.models.waveflow import UpsampleNet

    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 7, 5)).astype(np.float32))
    for s in (3, 4, 5):
        net = UpsampleNet(upsample_factors=(s,))
        v = net.init(jax.random.PRNGKey(s), mel)
        got = net.apply(v, mel)

        kernel = v["params"]["deconv_0_kernel"]
        bias = v["params"]["deconv_0_bias"]
        conv = nn.ConvTranspose(1, (3, 2 * s), strides=(1, s),
                                padding="SAME")
        x = mel.transpose(0, 2, 1)[..., None]   # (B, F, N, 1)
        ref = conv.apply({"params": {"kernel": kernel, "bias": bias}}, x)
        ref = nn.leaky_relu(ref[..., 0].transpose(0, 2, 1),
                            negative_slope=0.4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"scale {s}")


def test_waveflow_bf16_sampling_close_to_fp32(wf):
    """sample_act_dtype=bfloat16 (the fast sampler configuration) stays
    close to the fp32 sampler: same z/condition, deviation bounded by
    the bf16 net noise amplified through 2 flows."""
    model, variables, audio, mel = wf
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    pert = {"params": jax.tree_util.tree_unflatten(treedef, leaves)}
    cond = model.apply(pert, mel, method=lambda m, mel: m.encoder(mel))
    t = (cond.shape[1] // 4) * 4
    z = jnp.asarray(np.random.default_rng(3).standard_normal(
        (audio.shape[0], t)).astype(np.float32))
    x32 = model.apply(pert, z, cond[:, :t],
                      method=lambda m, z, c: m.decoder.inverse(z, c))
    fast = model.clone(sample_act_dtype=jnp.bfloat16)
    x16 = fast.apply(pert, z, cond[:, :t],
                     method=lambda m, z, c: m.decoder.inverse(z, c))
    assert np.isfinite(np.asarray(x16)).all()
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x32),
                               atol=0.05)

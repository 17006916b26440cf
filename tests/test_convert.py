"""Paddle->parakeet_tpu PWG checkpoint conversion: fabricate a state
dict with the reference's key names and tensor layouts
(parallel_wavegan.py:401-496), convert, and check it is a drop-in for
``PWGGenerator.init`` params (identical tree + shapes, generator runs)."""
import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.models import PWGGenerator
from parakeet_tpu.utils.convert import convert_pwg_generator

LAYERS, CR, CG, CS, CA = 4, 8, 16, 8, 12
SCALES = (2, 3)


def fake_paddle_state(rng):
    state = {}

    def wn_conv1d(prefix, out, cin, k, bias=True):
        state[f"{prefix}.weight_v"] = rng.standard_normal(
            (out, cin, k)).astype(np.float32)
        state[f"{prefix}.weight_g"] = rng.standard_normal(
            (out, 1, 1)).astype(np.float32)
        if bias:
            state[f"{prefix}.bias"] = rng.standard_normal(
                (out,)).astype(np.float32)

    wn_conv1d("first_conv", CR, 1, 1)
    wn_conv1d("upsample_net.conv_in", CA, CA, 5, bias=False)
    for i, s in enumerate(SCALES):
        idx = i * 2 + 1
        state[f"upsample_net.upsample.up_layers.{idx}.weight_v"] = \
            rng.standard_normal((1, 1, 1, 2 * s + 1)).astype(np.float32)
        state[f"upsample_net.upsample.up_layers.{idx}.weight_g"] = \
            rng.standard_normal((1,)).astype(np.float32)
    for i in range(LAYERS):
        wn_conv1d(f"conv_layers.{i}.conv", CG, CR, 3)
        wn_conv1d(f"conv_layers.{i}.conv1x1_aux", CG, CA, 1, bias=False)
        wn_conv1d(f"conv_layers.{i}.conv1x1_skip", CS, CG // 2, 1)
        wn_conv1d(f"conv_layers.{i}.conv1x1_out", CR, CG // 2, 1)
    wn_conv1d("last_conv_layers.1", CS, CS, 1)
    wn_conv1d("last_conv_layers.3", 1, CS, 1)
    return state


def test_convert_pwg_generator_drop_in():
    rng = np.random.default_rng(0)
    state = fake_paddle_state(rng)
    params = convert_pwg_generator(state, layers=LAYERS,
                                   upsample_scales=SCALES)

    gen = PWGGenerator(layers=LAYERS, stacks=2, residual_channels=CR,
                       gate_channels=CG, skip_channels=CS,
                       aux_channels=CA, aux_context_window=2,
                       upsample_scales=SCALES)
    noise = jnp.zeros((1, 5 * 6, 1))
    mel = jnp.zeros((1, 9, CA))
    ref = gen.init(jax.random.PRNGKey(0), noise, mel)["params"]

    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes, (
        f"tree mismatch:\nref: {ref_shapes}\ngot: {got_shapes}")

    wav = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray,
                                                      params)}, noise, mel)
    assert wav.shape == (1, 30, 1)
    assert bool(jnp.isfinite(wav).all())

    # weight-norm fold equivalence on one conv: paddle computes
    # g * v / ||v|| with the norm over (in, k) per out channel
    v = state["conv_layers.0.conv.weight_v"]
    g = state["conv_layers.0.conv.weight_g"].reshape(-1)
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True) + 1e-12)
    expected = (v * (g[:, None, None] / norm)).transpose(2, 1, 0)
    from parakeet_tpu.models.parallel_wavegan import _wn
    got = np.asarray(_wn(jnp.asarray(params["stack"]["conv_kernel"][0]),
                         jnp.asarray(params["stack"]["conv_scale"][0])))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_convert_fastspeech2_drop_in():
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2
    from parakeet_tpu.utils.convert import convert_fastspeech2

    rng = np.random.default_rng(1)
    adim, heads, odim, vocab = 16, 2, 10, 30
    eunits = 32

    state = {}

    def dense(prefix, i, o):
        state[f"{prefix}.weight"] = rng.standard_normal(
            (i, o)).astype(np.float32)
        state[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(
            np.float32)

    def conv(prefix, o, i, k, bias=True):
        state[f"{prefix}.weight"] = rng.standard_normal(
            (o, i, k)).astype(np.float32)
        if bias:
            state[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(
                np.float32)

    def ln(prefix, d):
        state[f"{prefix}.weight"] = rng.standard_normal((d,)).astype(
            np.float32)
        state[f"{prefix}.bias"] = rng.standard_normal((d,)).astype(
            np.float32)

    def stack(prefix, alpha_idx):
        state[f"{prefix}.embed.{alpha_idx}.alpha"] = np.ones(
            (1,), np.float32)
        if alpha_idx == 1:
            state[f"{prefix}.embed.0.weight"] = rng.standard_normal(
                (vocab, adim)).astype(np.float32)
        lp = f"{prefix}.encoders.0"
        for nm in ("q", "k", "v", "out"):
            dense(f"{lp}.self_attn.linear_{nm}", adim, adim)
        ln(f"{lp}.norm1", adim)
        ln(f"{lp}.norm2", adim)
        conv(f"{lp}.feed_forward.w_1", eunits, adim, 1)
        conv(f"{lp}.feed_forward.w_2", adim, eunits, 1)
        ln(f"{prefix}.after_norm", adim)

    stack("encoder", 1)
    stack("decoder", 0)
    for pred in ("duration_predictor", "pitch_predictor",
                 "energy_predictor"):
        for i in range(2):
            conv(f"{pred}.conv.{i}.0", adim, adim, 3)
            ln(f"{pred}.conv.{i}.2", adim)
        dense(f"{pred}.linear", adim, 1)
    conv("pitch_embed.0", adim, 1, 9)
    conv("energy_embed.0", adim, 1, 9)
    dense("feat_out", adim, odim)
    for i, (ich, och) in enumerate(((odim, 8), (8, odim))):
        conv(f"postnet.postnet.{i}.0", och, ich, 5, bias=False)
        ln(f"postnet.postnet.{i}.1", och)
        state[f"postnet.postnet.{i}.1._mean"] = np.zeros((och,),
                                                         np.float32)
        state[f"postnet.postnet.{i}.1._variance"] = np.ones((och,),
                                                            np.float32)

    params, batch_stats = convert_fastspeech2(
        state, elayers=1, dlayers=1, aheads=heads, postnet_layers=2,
        predictor_layers=2, pitch_predictor_layers=2,
        energy_predictor_layers=2)

    model = FastSpeech2(idim=vocab, odim=odim, adim=adim, aheads=heads,
                        elayers=1, eunits=eunits, dlayers=1, dunits=eunits,
                        postnet_layers=2, postnet_chans=8, postnet_filts=5,
                        duration_predictor_chans=adim,
                        pitch_predictor_layers=2,
                        pitch_predictor_chans=adim,
                        energy_predictor_chans=adim)
    text = jnp.ones((1, 8), jnp.int64)
    ref = model.init(jax.random.PRNGKey(0), text, jnp.full((1,), 8),
                     jnp.zeros((1, 32, odim)), jnp.full((1,), 32),
                     jnp.ones((1, 8), jnp.int64), jnp.zeros((1, 8, 1)),
                     jnp.zeros((1, 8, 1)))

    shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert shapes == got, f"params tree mismatch\nref {shapes}\ngot {got}"
    bs_shapes = jax.tree_util.tree_map(lambda a: a.shape,
                                       ref["batch_stats"])
    got_bs = jax.tree_util.tree_map(lambda a: a.shape, batch_stats)
    assert bs_shapes == got_bs

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                       batch_stats)}
    out = model.apply(variables, text, jnp.full((1,), 8), max_frames=32,
                      method=FastSpeech2.inference)
    assert bool(jnp.isfinite(out["after_outs"]).all())

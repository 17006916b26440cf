"""Flash attention core: parity vs the dense path (CPU interpreter).

The core must be a drop-in for MultiHeadAttention's dense softmax —
same masking semantics, same scaling — with gradients (the kernel has a
custom VJP).  Reference math: the plain softmax attention of the
reference's transformer stack (parakeet/modules/fastspeech2_transformer/
attention.py:24-88).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

from parakeet_tpu.nn.flash import make_flash_attn_core


def dense_core(q, k, v, mask):
    dk = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dk)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None]
        s = jnp.where(mask, s, -1e9)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


def _qkv(b=2, t=72, h=2, dk=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((b, t, h, dk)).astype(np.float32))
    return mk(), mk(), mk()


def test_flash_core_matches_dense_padding_mask():
    q, k, v = _qkv()
    lengths = np.array([72, 50])
    mask = jnp.asarray(np.arange(72)[None] < lengths[:, None])[:, None]
    core = make_flash_attn_core()
    out = core(q, k, v, mask)
    ref = dense_core(q, k, v, mask)
    valid = np.asarray(mask)[:, 0]                      # (B, T)
    err = np.abs(np.asarray(out - ref))[valid]
    assert err.max() < 1e-5
    assert out.shape == q.shape


def test_flash_core_matches_dense_no_mask():
    q, k, v = _qkv(t=128)
    core = make_flash_attn_core()
    out = core(q, k, v, None)
    ref = dense_core(q, k, v, None)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_flash_core_gradients_match_dense():
    q, k, v = _qkv(b=1, t=64, h=2, dk=32)
    lengths = np.array([48])
    mask = jnp.asarray(np.arange(64)[None] < lengths[:, None])[:, None]
    valid = jnp.asarray(np.arange(64) < 48, jnp.float32)[None, :, None,
                                                         None]
    core = make_flash_attn_core()

    def loss(f, q, k, v):
        # only valid rows contribute, as in any masked TTS loss
        return jnp.sum((f(q, k, v, mask) * valid) ** 2)

    g_flash = jax.grad(lambda *a: loss(core, *a), argnums=(0, 1, 2))(
        q, k, v)
    g_dense = jax.grad(lambda *a: loss(dense_core, *a), argnums=(0, 1, 2))(
        q, k, v)
    for gf, gd in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   atol=2e-4, rtol=2e-3)


def test_fastspeech2_flash_train_step_runs():
    from parakeet_tpu.models import (FastSpeech2, init_fs2_train_state,
                                     make_fs2_train_step)
    from parakeet_tpu.training.optimizer import build_optimizer

    model = FastSpeech2(
        idim=20, odim=8, adim=32, aheads=2, elayers=1, eunits=64,
        dlayers=1, dunits=64, postnet_layers=1, postnet_chans=8,
        attn_impl="flash",
        transformer_enc_attn_dropout_rate=0.0,
        transformer_dec_attn_dropout_rate=0.0)
    b, t, frames = 2, 6, 24
    rng = np.random.default_rng(0)
    durations = np.full((b, t), frames // t, np.int64)
    batch = {
        "text": jnp.asarray(rng.integers(1, 20, (b, t))),
        "text_lengths": jnp.asarray(np.array([t, t - 2])),
        "speech": jnp.asarray(rng.standard_normal(
            (b, frames, 8)).astype(np.float32)),
        "speech_lengths": jnp.asarray(np.array([frames, frames - 8])),
        "durations": jnp.asarray(durations),
        "pitch": jnp.asarray(rng.standard_normal(
            (b, t, 1)).astype(np.float32)),
        "energy": jnp.asarray(rng.standard_normal(
            (b, t, 1)).astype(np.float32)),
    }
    tx = build_optimizer("adam", 1e-4)
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_fs2_train_step(model, tx)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_flash_with_attn_dropout_raises():
    from parakeet_tpu.nn.transformer import MultiHeadAttention
    core = make_flash_attn_core()
    mha = MultiHeadAttention(2, 32, dropout_rate=0.1, attn_core=core)
    x = jnp.zeros((1, 8, 32))
    with pytest.raises(ValueError, match="dropout"):
        mha.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)},
                 x, x, x, None, deterministic=False)


def test_auto_core_dispatch():
    """'auto' (the FastSpeech2 default): dense below the measured
    crossover (returns attention weights), flash above (weights None),
    identical outputs either side of the threshold."""
    from parakeet_tpu.nn.flash import make_auto_attn_core
    from parakeet_tpu.nn.transformer import MultiHeadAttention

    core = make_auto_attn_core(threshold=64)
    mha_auto = MultiHeadAttention(2, 32, attn_core=core)
    mha_dense = MultiHeadAttention(2, 32)
    rng = np.random.default_rng(4)

    # below threshold: core returns None -> dense path, weights present
    x_small = jnp.asarray(
        rng.standard_normal((1, 16, 32)).astype(np.float32))
    v = mha_auto.init(jax.random.PRNGKey(0), x_small, x_small, x_small)
    out_s, attn_s, _ = mha_auto.apply(v, x_small, x_small, x_small)
    assert attn_s is not None
    ref_s, _, _ = mha_dense.apply(v, x_small, x_small, x_small)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(ref_s))

    # above threshold: flash kernel, weights None, same output values
    x_big = jnp.asarray(
        rng.standard_normal((1, 128, 32)).astype(np.float32))
    out_b, attn_b, _ = mha_auto.apply(v, x_big, x_big, x_big)
    assert attn_b is None
    ref_b, _, _ = mha_dense.apply(v, x_big, x_big, x_big)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               rtol=2e-5, atol=2e-5)


def test_auto_core_dropout_falls_back_to_dense():
    """Training with attention dropout under 'auto' uses the dense path
    (regularization preserved) instead of raising like a fixed custom
    core does."""
    from parakeet_tpu.nn.flash import make_auto_attn_core
    from parakeet_tpu.nn.transformer import MultiHeadAttention

    core = make_auto_attn_core(threshold=8)
    mha = MultiHeadAttention(2, 32, dropout_rate=0.1, attn_core=core)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 16, 32)).astype(np.float32))
    v = mha.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)},
                 x, x, x, None, deterministic=False)
    out, attn, _ = mha.apply(v, x, x, x, None, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(2)})
    assert attn is not None        # dense path ran (weights exist)
    assert np.isfinite(np.asarray(out)).all()

"""bf16 end-to-end synthesis parity: the headline bench / serving path
(FastSpeech2 -> PWGGenerator with ``dtype=bfloat16``, fp32 params) must
stay close to the fp32 pipeline on identical weights.  Pins the wav
closeness claim behind ``bench.py --dtype bfloat16`` (the default) and
``benchmarks/serving_throughput.py --dtype bfloat16``.

Tiny config on CPU: same architecture shape as the bench point
(4-layer FS2, 30-layer PWG folded down), dtype is the only variable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

from parakeet_tpu.models import FastSpeech2, PWGGenerator


def _build(dt):
    fs2 = FastSpeech2(idim=40, odim=20, adim=32, aheads=2, elayers=2,
                      eunits=64, dlayers=2, dunits=64, postnet_layers=2,
                      postnet_chans=16, postnet_filts=3, dtype=dt)
    pwg = PWGGenerator(layers=6, stacks=2, residual_channels=8,
                       gate_channels=16, skip_channels=8,
                       aux_channels=20, upsample_scales=(2, 2),
                       aux_context_window=2, dtype=dt)
    return fs2, pwg


def test_e2e_bf16_close_to_fp32():
    max_frames, text_len, hop = 24, 8, 4
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 40, (1, text_len)).astype(np.int64))
    tl = jnp.asarray(np.array([text_len], np.int64))
    noise = jax.random.normal(jax.random.PRNGKey(2),
                              (1, max_frames * hop, 1))

    fs32, pwg32 = _build(jnp.float32)
    fs16, pwg16 = _build(jnp.bfloat16)
    fv = fs32.init({"params": jax.random.PRNGKey(0)}, text, tl,
                   max_frames=max_frames, method=FastSpeech2.inference)
    pv = pwg32.init(jax.random.PRNGKey(1), noise,
                    jnp.zeros((1, max_frames + 4, 20), jnp.float32))
    # params are fp32 in both builds (flax param_dtype default); dtype
    # only changes the compute precision
    for a, b in zip(jax.tree_util.tree_leaves(
            fs16.init({"params": jax.random.PRNGKey(0)}, text, tl,
                      max_frames=max_frames,
                      method=FastSpeech2.inference)),
            jax.tree_util.tree_leaves(fv)):
        assert a.dtype == b.dtype

    def synth(fs2, pwg):
        out = fs2.apply(fv, text, tl, max_frames=max_frames,
                        method=FastSpeech2.inference)
        mel = jnp.pad(out["after_outs"].astype(jnp.float32),
                      ((0, 0), (2, 2), (0, 0)), mode="edge")
        return pwg.apply({"params": pv["params"]}, noise, mel)[..., 0]

    w32 = np.asarray(jax.jit(lambda: synth(fs32, pwg32))())
    w16 = np.asarray(jax.jit(lambda: synth(fs16, pwg16))())
    assert np.isfinite(w16).all()
    scale = max(float(np.max(np.abs(w32))), 1e-6)
    rel = float(np.max(np.abs(w16 - w32))) / scale
    # bf16 has ~3 decimal digits; the 2-layer transformer + 6-layer
    # vocoder compound that to a few percent of the signal scale
    assert rel < 8e-2, rel

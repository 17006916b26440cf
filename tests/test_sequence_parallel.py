"""Sequence parallelism (ring attention) and tensor parallelism as
user-reachable features: the SAME model/checkpoint must produce the
same output with and without sharding on the 8-device mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_tpu.parallel import (make_mesh, make_ring_attn_core,
                                   replicate, shard_params_by_rule,
                                   transformer_tp_spec)

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")]


def _fs2(decoder_attn_core=None):
    from parakeet_tpu.models import FastSpeech2
    return FastSpeech2(idim=30, odim=10, adim=16, aheads=2, elayers=1,
                       eunits=32, dlayers=2, dunits=32, postnet_layers=2,
                       postnet_chans=8, postnet_filts=5,
                       duration_predictor_chans=16,
                       pitch_predictor_chans=16,
                       energy_predictor_chans=16,
                       decoder_attn_core=decoder_attn_core)


def test_fs2_sequence_parallel_inference_matches_dense():
    """Long-form synthesis with the decoder frame axis sharded over 8
    devices (ring attention) == unsharded inference, same params."""
    from parakeet_tpu.models import FastSpeech2
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 30, (2, 16)).astype(np.int64))
    tl = jnp.asarray(np.array([16, 12], np.int64))
    max_frames = 128                      # divisible by the 8-way axis

    dense = _fs2()
    variables = jax.jit(lambda k, t, l: dense.init(
        {"params": k}, t, l, max_frames=max_frames,
        method=FastSpeech2.inference))(jax.random.PRNGKey(0), text, tl)
    ref = dense.apply(variables, text, tl, max_frames=max_frames,
                      method=FastSpeech2.inference)

    mesh = make_mesh(data=1, model=8)
    sp = _fs2(decoder_attn_core=make_ring_attn_core(mesh, "model"))
    with mesh:
        sp_vars = replicate(variables, mesh)
        out = jax.jit(lambda v, t, l: sp.apply(
            v, t, l, max_frames=max_frames,
            method=FastSpeech2.inference))(sp_vars, text, tl)
    np.testing.assert_array_equal(np.asarray(out["frame_lengths"]),
                                  np.asarray(ref["frame_lengths"]))
    np.testing.assert_allclose(np.asarray(out["after_outs"]),
                               np.asarray(ref["after_outs"]),
                               rtol=1e-4, atol=1e-4)


def test_transformer_tts_tp_forward_matches_replicated():
    """TransformerTTS teacher-forced forward with Megatron-style
    head/FFN sharding (transformer_tp_spec) == replicated forward."""
    from parakeet_tpu.models import TransformerTTS
    model = TransformerTTS(idim=11, odim=6, adim=16, aheads=2, elayers=1,
                           dlayers=1, eunits=32, dunits=32)
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.integers(1, 11, (2, 8)).astype(np.int64))
    tl = jnp.asarray(np.array([8, 6], np.int64))
    mel = jnp.asarray(rng.standard_normal((2, 12, 6)).astype(np.float32))
    ml = jnp.asarray(np.array([12, 10], np.int64))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, text, tl, mel, ml)

    fwd = jax.jit(lambda v, *a: model.apply(
        v, *a, deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(2)}))
    ref = fwd(variables, text, tl, mel, ml)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        tp_params = shard_params_by_rule(variables["params"], mesh,
                                         transformer_tp_spec)
        out = fwd({**variables, "params": tp_params}, text, tl, mel, ml)
    for key in ("before_outs", "after_outs", "stop_logits"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=1e-4, atol=1e-4)


def test_tp_spec_actually_shards_attention_and_ffn():
    """Guard: the rule must shard q/k/v/out and both FFN flavors (a
    rule that silently replicates everything would pass the equality
    test above)."""
    from jax.sharding import PartitionSpec as P
    cases = {
        "encoder/layer_0/self_attn/q/kernel": P(None, "model", None),
        "decoder/layer_0/src_attn/out/kernel": P("model", None, None),
        "encoder/layer_0/MultiLayerConv_0/Conv_0/kernel":
            P(None, None, "model"),
        "decoder/layer_0/ff/Dense_0/kernel": P(None, "model"),
        "decoder/layer_0/ff/Dense_1/kernel": P("model", None),
        "postnet/Conv_0/kernel": P(),
    }
    for path, want in cases.items():
        assert transformer_tp_spec(path, None) == want, path


def test_synthesize_e2e_sp_flag_identical_audio(tmp_path):
    """The recipe command produces (numerically) the same audio with
    and without --sp 8 on the 8-device mesh."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    from parakeet_tpu.audio.codec import load_wav
    from parakeet_tpu.models import FastSpeech2, PWGGenerator
    from parakeet_tpu.training.checkpoint import save_pytree

    repo = Path(__file__).resolve().parent.parent
    phones = ["<pad>", "a", "b", "<sp>"]
    (tmp_path / "phones.txt").write_text(
        "".join(f"{p} {i}\n" for i, p in enumerate(phones)))
    (tmp_path / "sentences.txt").write_text("utt1 ab ba\n")

    model_kwargs = dict(adim=16, aheads=2, elayers=1, eunits=32,
                        dlayers=2, dunits=32, postnet_layers=2,
                        postnet_chans=8, postnet_filts=5,
                        duration_predictor_chans=16,
                        pitch_predictor_chans=16,
                        energy_predictor_chans=16)
    am = FastSpeech2(idim=len(phones), odim=10, **model_kwargs)
    text = jnp.ones((1, 8), jnp.int64)
    tl = jnp.full((1,), 8, jnp.int64)
    av = jax.jit(lambda k, t, l: am.init(
        {"params": k}, t, l, max_frames=64,
        method=FastSpeech2.inference))(jax.random.PRNGKey(0), text, tl)
    save_pytree(tmp_path / "fs2.npz", av)
    (tmp_path / "fs2.yaml").write_text(
        "fs: 24000\nn_fft: 512\nn_shift: 300\nwin_length: 512\n"
        "fmin: 80\nfmax: 7600\nn_mels: 10\nmodel:\n" + "".join(
            f"  {k}: {v}\n" for k, v in model_kwargs.items()))

    voc_kwargs = dict(layers=2, stacks=1, residual_channels=4,
                      gate_channels=8, skip_channels=4, aux_channels=10,
                      aux_context_window=1, upsample_scales=[4, 5, 3, 5])
    voc = PWGGenerator(**{**voc_kwargs,
                          "upsample_scales": (4, 5, 3, 5)})
    vv = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 300, 1)),
                  jnp.zeros((1, 3, 10)))
    save_pytree(tmp_path / "pwg.npz", {"params": vv["params"]})
    (tmp_path / "pwg.yaml").write_text(
        "fs: 24000\nn_mels: 10\ngenerator_params:\n" + "".join(
            f"  {k}: {v}\n" for k, v in voc_kwargs.items()))

    def run(outdir, *extra):
        env = dict(os.environ)
        env["PYTHONPATH"] = (str(repo) + os.pathsep
                             + env.get("PYTHONPATH", ""))
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
        cmd = [sys.executable,
               str(repo / "recipes" / "fastspeech2" / "synthesize_e2e.py"),
               "--fastspeech2-config", str(tmp_path / "fs2.yaml"),
               "--fastspeech2-checkpoint", str(tmp_path / "fs2.npz"),
               "--pwg-config", str(tmp_path / "pwg.yaml"),
               "--pwg-checkpoint", str(tmp_path / "pwg.npz"),
               "--phones-dict", str(tmp_path / "phones.txt"),
               "--text", str(tmp_path / "sentences.txt"),
               "--output-dir", str(outdir), "--lang", "en-char",
               "--max-text-len", "8", "--max-frames", "64",
               "--device", "cpu", *map(str, extra)]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=600, cwd=str(repo), env=env)
        assert proc.returncode == 0, (
            f"synthesize_e2e failed\nSTDOUT:{proc.stdout[-2000:]}\n"
            f"STDERR:{proc.stderr[-2000:]}")
        wavs = sorted(Path(outdir).glob("*.wav"))
        assert wavs, "no wav produced"
        return load_wav(wavs[0])[0]

    ref = run(tmp_path / "out_dense")
    sp = run(tmp_path / "out_sp", "--sp", "8")
    assert ref.shape == sp.shape
    np.testing.assert_allclose(sp, ref, atol=2e-4)

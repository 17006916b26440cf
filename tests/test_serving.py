"""TTSEngine: bucketed batched serving (parakeet_tpu/serving.py).

The load-bearing property is BATCH INVARIANCE: a request's waveform
must be identical however the scheduler batches it (solo, padded into
a half-empty chunk, grouped with longer/shorter neighbours), because
noise rows derive from the request seed alone and the models mask
padding.  Plus: bucket routing, compile-cache reuse, order
preservation, trimming, and the mel-only (vocoder-less) mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_tpu.models import FastSpeech2, PWGGenerator
from parakeet_tpu.serving import Request, TTSEngine

TINY_FS2 = dict(idim=30, odim=10, adim=16, aheads=2, elayers=2,
                eunits=32, dlayers=2, dunits=32, postnet_layers=2,
                postnet_chans=8, postnet_filts=5,
                duration_predictor_chans=16, pitch_predictor_chans=16,
                energy_predictor_chans=16)
TINY_PWG = dict(layers=4, stacks=2, residual_channels=8,
                gate_channels=16, skip_channels=8, aux_channels=10,
                aux_context_window=1, upsample_scales=(2, 2))
HOP = 4  # prod(upsample_scales)


def _build(with_voc=True, **engine_kw):
    fs2 = FastSpeech2(**TINY_FS2)
    text = jnp.ones((1, 8), jnp.int64)
    tlen = jnp.asarray([8], jnp.int64)
    fs2_vars = jax.jit(lambda k, t, l: fs2.init(
        {"params": k}, t, l, max_frames=32,
        method=FastSpeech2.inference))(jax.random.PRNGKey(0), text, tlen)
    voc = voc_params = None
    if with_voc:
        voc = PWGGenerator(**TINY_PWG)
        noise = jnp.zeros((1, 16 * HOP, 1))
        mel = jnp.zeros((1, 16 + 2, 10))
        voc_params = jax.jit(voc.init)(
            jax.random.PRNGKey(1), noise, mel)["params"]
    return TTSEngine(fs2, fs2_vars, voc=voc, voc_params=voc_params,
                     text_buckets=(8, 16), batch_buckets=(1, 2, 4),
                     frames_per_token=4, min_duration=1, **engine_kw)


@pytest.fixture(scope="module")
def engine():
    return _build(with_voc=True)


def _reqs(lengths, base_seed=0):
    rng = np.random.default_rng(7)
    return [Request(ids=rng.integers(1, 30, n).tolist(),
                    utt_id=f"u{i}", seed=base_seed + i)
            for i, n in enumerate(lengths)]


def test_batch_invariance(engine):
    reqs = _reqs([5, 8, 3])
    batched = engine.synthesize(reqs)          # one chunk, bucket (8, 4)
    solo = [engine.synthesize([r])[0] for r in reqs]  # bucket (8, 1)
    for b, s, r in zip(batched, solo, reqs):
        assert b.utt_id == s.utt_id == r.utt_id
        assert b.n_frames == s.n_frames > 0
        assert b.wav.shape == (b.n_frames * HOP,)
        assert np.isfinite(b.wav).all()
        np.testing.assert_allclose(b.wav, s.wav, atol=1e-5,
                                   err_msg=r.utt_id)


def test_compile_cache_reuse(engine):
    reqs = _reqs([4, 6, 2], base_seed=50)
    engine.synthesize(reqs)
    before = engine.compiled_programs
    engine.synthesize(_reqs([7, 5, 3], base_seed=90))  # same grid point
    assert engine.compiled_programs == before


def test_mixed_buckets_order_and_trim(engine):
    reqs = _reqs([12, 5, 16], base_seed=20)    # buckets 16, 8, 16
    out = engine.synthesize(reqs)
    assert [o.utt_id for o in out] == ["u0", "u1", "u2"]
    for o, r in zip(out, reqs):
        cap = engine.max_frames(engine._text_bucket(len(r.ids)))
        assert 0 < o.n_frames <= cap
        assert o.wav.shape == (o.n_frames * HOP,)


def test_long_request_splits_and_stitches(engine):
    """Default overflow='split': a 40-phone request (largest bucket is
    16) is segmented, each segment synthesized, and the wavs stitched
    in order — no text dropped."""
    req = _reqs([40], base_seed=30)[0]
    (out,) = engine.synthesize([req])
    assert out.n_frames > 0
    assert out.wav.shape == (out.n_frames * HOP,)
    assert np.isfinite(out.wav).all()
    # the stitched wav starts with exactly the first segment's solo wav
    seg0 = Request(ids=list(req.ids)[:16], utt_id=req.utt_id,
                   seed=req.seed)
    (solo,) = engine.synthesize([seg0])
    assert out.n_frames > solo.n_frames  # later segments contributed
    np.testing.assert_allclose(out.wav[:solo.n_frames * HOP], solo.wav,
                               atol=1e-5)


def test_overflow_truncate_and_error():
    eng = _build(with_voc=False, overflow="truncate")
    (out,) = eng.synthesize(_reqs([40], base_seed=30))
    assert out.n_frames <= eng.max_frames(16)
    eng_err = _build(with_voc=False, overflow="error")
    with pytest.raises(ValueError, match="exceeds the largest"):
        eng_err.synthesize(_reqs([40], base_seed=30))
    with pytest.raises(ValueError, match="overflow"):
        _build(with_voc=False, overflow="bogus")


def test_split_prefers_pause_tokens():
    """Segment boundaries land on the last pause token that fits the
    largest bucket; hard cut only when no pause is in the window."""
    eng = _build(with_voc=False, split_ids=[3])
    ids = [1] * 10 + [3] + [1] * 10  # 21 phones, pause at index 10
    segs = eng._segments(Request(ids=ids), 0)
    assert segs == [ids[:11], ids[11:]]  # ends WITH the pause token
    nopause = [1] * 21
    segs = eng._segments(Request(ids=nopause), 0)
    assert segs == [nopause[:16], nopause[16:]]  # hard cut fallback


def test_engine_matches_trimmed_vocode(engine):
    """The engine's vocoder input beyond each row's frame_lengths is
    the row's edge-extended last real frame (NOT raw decoder output),
    so the trimmed wav matches vocoding the trimmed mel — the recipe
    path's behavior (ADVICE r4)."""
    req = _reqs([8], base_seed=40)[0]
    (res,) = engine.synthesize([req])
    n, tb = res.n_frames, 8
    # recompute the AM mel exactly as the engine's program does
    text = np.zeros((1, tb), np.int64)
    text[0, :len(req.ids)] = req.ids
    out = engine.am.apply(
        engine.am_vars, jnp.asarray(text),
        jnp.asarray([len(req.ids)], np.int64),
        max_frames=engine.max_frames(tb), min_duration=1, spk_id=None,
        method=FastSpeech2.inference)
    mel = np.asarray(out["after_outs"])[0, :n]  # trimmed: real frames
    # intended vocoder input: trimmed mel edge-extended to capacity,
    # then the aux-context pad — must reproduce the engine wav exactly
    idx = np.minimum(np.arange(engine.max_frames(tb)), n - 1)
    mel_full = jnp.pad(jnp.asarray(mel[idx])[None], ((0, 0), (1, 1),
                                                     (0, 0)), mode="edge")
    noise = engine._noise_row(req.seed, tb)[None]
    wav = engine.voc.apply({"params": engine.voc_params}, noise,
                           mel_full)[..., 0]
    np.testing.assert_allclose(res.wav, np.asarray(wav)[0, :n * HOP],
                               atol=1e-6)


def test_empty_request_raises(engine):
    with pytest.raises(ValueError, match="empty"):
        engine.synthesize([Request(ids=[], utt_id="bad")])


def test_mel_only_engine():
    eng = _build(with_voc=False)
    (out,) = eng.synthesize(_reqs([6])[:1])
    assert out.wav is None
    assert out.mel.shape == (out.n_frames, 10)
    assert np.isfinite(out.mel).all()


def test_multi_speaker_routing():
    """Per-request spk_id reaches the AM: two speakers give different
    wavs for the same text+seed, and batching them together matches
    their solo runs."""
    fs2 = FastSpeech2(num_speakers=3, spk_embed_dim=8, **TINY_FS2)
    text = jnp.ones((1, 8), jnp.int64)
    tlen = jnp.asarray([8], jnp.int64)
    fs2_vars = jax.jit(lambda k, t, l: fs2.init(
        {"params": k}, t, l, max_frames=32, spk_id=jnp.zeros(1, jnp.int32),
        method=FastSpeech2.inference))(jax.random.PRNGKey(0), text, tlen)
    eng = TTSEngine(fs2, fs2_vars, text_buckets=(8,),
                    batch_buckets=(1, 2), frames_per_token=4,
                    min_duration=1, multi_speaker=True)
    ids = np.random.default_rng(3).integers(1, 30, 6).tolist()
    reqs = [Request(ids=ids, utt_id=f"spk{s}", seed=5, spk_id=s)
            for s in (0, 2)]
    batched = eng.synthesize(reqs)
    solo = [eng.synthesize([r])[0] for r in reqs]
    for b, s in zip(batched, solo):
        np.testing.assert_allclose(
            b.mel[:min(b.n_frames, s.n_frames)],
            s.mel[:min(b.n_frames, s.n_frames)], atol=1e-5)
    assert not np.allclose(batched[0].mel[:4], batched[1].mel[:4],
                           atol=1e-4), "speaker id had no effect"


@pytest.mark.slow
def test_serve_cli_smoke(tmp_path):
    """tools/serve.py end to end on tiny random checkpoints: three
    differently-sized utterances batch through the bucket grid and come
    out as wav files."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    from parakeet_tpu.audio.codec import load_wav
    from parakeet_tpu.training.checkpoint import save_pytree

    repo = Path(__file__).resolve().parent.parent
    phones = ["<pad>", "a", "b", "<sp>"]
    (tmp_path / "phones.txt").write_text(
        "".join(f"{p} {i}\n" for i, p in enumerate(phones)))
    (tmp_path / "sentences.txt").write_text(
        "utt1 ab\nutt2 ab ba ab\nutt3 ba\n")

    am_kwargs = {k: v for k, v in TINY_FS2.items() if k != "idim"}
    am = FastSpeech2(idim=len(phones), **am_kwargs)
    av = jax.jit(lambda k, t, l: am.init(
        {"params": k}, t, l, max_frames=32,
        method=FastSpeech2.inference))(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int64),
        jnp.asarray([8], jnp.int64))
    save_pytree(tmp_path / "fs2.npz", av)
    (tmp_path / "fs2.yaml").write_text(
        "fs: 24000\nn_fft: 512\nn_shift: 300\nwin_length: 512\n"
        "fmin: 80\nfmax: 7600\nn_mels: 10\nmodel:\n" + "".join(
            f"  {k}: {v}\n" for k, v in am_kwargs.items()
            if k != "odim"))

    voc = PWGGenerator(**TINY_PWG)
    vv = jax.jit(voc.init)(jax.random.PRNGKey(1),
                           jnp.zeros((1, 16 * HOP, 1)),
                           jnp.zeros((1, 18, 10)))
    save_pytree(tmp_path / "pwg.npz", {"params": vv["params"]})
    (tmp_path / "pwg.yaml").write_text(
        "fs: 24000\nn_mels: 10\ngenerator_params:\n" + "".join(
            f"  {k}: {list(v) if isinstance(v, tuple) else v}\n"
            for k, v in TINY_PWG.items()))

    env = dict(os.environ)
    env["PYTHONPATH"] = (str(repo) + os.pathsep
                         + env.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "serve.py"),
         "--fastspeech2-config", str(tmp_path / "fs2.yaml"),
         "--fastspeech2-checkpoint", str(tmp_path / "fs2.npz"),
         "--pwg-config", str(tmp_path / "pwg.yaml"),
         "--pwg-checkpoint", str(tmp_path / "pwg.npz"),
         "--phones-dict", str(tmp_path / "phones.txt"),
         "--text", str(tmp_path / "sentences.txt"),
         "--output-dir", str(tmp_path / "wavs"), "--lang", "en-char",
         "--text-buckets", "8", "16", "--batch-size", "4",
         "--frames-per-token", "4", "--device", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=str(repo),
        env=env)
    assert proc.returncode == 0, (
        f"STDOUT:\n{proc.stdout[-3000:]}\nSTDERR:\n{proc.stderr[-3000:]}")
    assert "audio-s/s" in proc.stdout
    for utt in ("utt1", "utt2", "utt3"):
        wav, sr = load_wav(tmp_path / "wavs" / f"{utt}.wav")
        assert sr == 24000 and len(wav) > 0


def test_warmup_precompiles(engine):
    n = engine.warmup(text_buckets=(8,), batch_buckets=(2,))
    assert n == engine.compiled_programs >= 1
    before = engine.compiled_programs
    engine.synthesize(_reqs([8, 8], base_seed=70))  # hits (8, 2)
    assert engine.compiled_programs == before
    # default warmup covers the FULL grid (tail chunks route to
    # smaller batch buckets, so every point must be warm)
    assert engine.warmup() == 2 * 3  # text (8,16) x batch (1,2,4)

"""Recipe CLI smoke tests: every script imports and parses --help, and
the GE2E preprocess -> inference chain runs end to end on synthetic wavs
(reference equivalents: examples/<model>/*.py, examples/ge2e/*)."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

REPO = Path(__file__).resolve().parent.parent
RECIPES = REPO / "recipes"

ALL_SCRIPTS = sorted(RECIPES.glob("*/*.py"))


def _run(script, *args, timeout=600):
    env = dict(os.environ)
    # Keep the subprocess off the real TPU: the axon sitecustomize
    # (on PYTHONPATH in TPU shells) overrides JAX_PLATFORMS=cpu, so it
    # must be dropped from the inherited path — plain JAX then honors
    # the env var and these smoke runs never contend with the chip.
    inherited = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                 if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([str(REPO)] + inherited)
    env.setdefault("JAX_PLATFORMS", "cpu")
    cmd = [sys.executable, str(script)] + [str(a) for a in args]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, cwd=str(REPO), env=env)
    if proc.returncode != 0:
        raise AssertionError(
            f"{script} failed\nSTDOUT:\n{proc.stdout[-3000:]}\n"
            f"STDERR:\n{proc.stderr[-3000:]}")
    return proc


@pytest.mark.parametrize("script", ALL_SCRIPTS,
                         ids=[f"{p.parent.name}/{p.name}"
                              for p in ALL_SCRIPTS])
def test_recipe_help(script):
    proc = _run(script, "--help")
    assert "usage" in proc.stdout.lower()


def test_ge2e_preprocess_inference_chain(tmp_path):
    from parakeet_tpu.audio.codec import save_wav

    fs = 16000
    rng = np.random.default_rng(0)
    for spk in ("spk_a", "spk_b"):
        d = tmp_path / "wavs" / spk
        d.mkdir(parents=True)
        for i in range(2):
            t = np.arange(int(2.0 * fs)) / fs
            f0 = 120 if spk == "spk_a" else 220
            wav = (0.3 * np.sin(2 * np.pi * f0 * t)
                   + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
            save_wav(d / f"utt{i}.wav", wav, fs)

    mels = tmp_path / "mels"
    _run(RECIPES / "ge2e" / "preprocess.py",
         "--input", tmp_path / "wavs", "--output", mels,
         "--min-frames", 40)
    npys = list(mels.rglob("*.npy"))
    assert len(npys) == 4, f"expected 4 mel files, got {npys}"

    # synthetic GE2E checkpoint
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import LSTMSpeakerEncoder
    from parakeet_tpu.training.checkpoint import save_pytree

    enc = LSTMSpeakerEncoder(n_mels=40, hidden_size=32, output_size=32)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 160, 40)))
    ckpt = tmp_path / "ge2e.npz"
    save_pytree(ckpt, {"params": v["params"]})

    embeds = tmp_path / "embeds"
    _run(RECIPES / "ge2e" / "inference.py",
         "--checkpoint", ckpt, "--input", mels, "--output", embeds,
         "--hidden-size", 32, "--output-size", 32, "--device", "cpu")
    out = list(embeds.rglob("*.npy"))
    assert len(out) == 4
    e = np.load(out[0])
    assert e.shape == (32,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-4)

    # a few real training iterations over the preprocessed partials
    exp = tmp_path / "exp"
    _run(RECIPES / "ge2e" / "train.py",
         "--data-root", mels, "--output-dir", exp,
         "--speakers-per-batch", 2, "--utterances-per-speaker", 2,
         "--frames", 40, "--max-iteration", 2, "--save-interval", 2,
         "--device", "cpu")
    assert list((exp / "checkpoints").glob("*.npz")), "no ge2e snapshot"


def test_voice_cloning_chain(tmp_path):
    """GE2E embedding -> conditioned Tacotron2 -> WaveFlow, end to end
    through the voice_cloning.py CLI on tiny random checkpoints
    (reference flow: examples/tacotron2_aishell3/voice_cloning.ipynb)."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    from parakeet_tpu.audio.codec import save_wav
    from parakeet_tpu.models import (ConditionalWaveFlow,
                                     LSTMSpeakerEncoder, Tacotron2)
    from parakeet_tpu.training.checkpoint import save_pytree

    # GE2E checkpoint (CLI builds LSTMSpeakerEncoder(n_mels=40) defaults)
    ge2e = LSTMSpeakerEncoder(n_mels=40)
    gv = ge2e.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 40)))
    save_pytree(tmp_path / "ge2e.npz", {"params": gv["params"]})

    # tiny conditioned Tacotron2 + config
    model_kwargs = dict(d_mels=10, d_encoder=16, encoder_conv_layers=1,
                        encoder_kernel_size=3, d_prenet=8,
                        d_attention_rnn=16, d_decoder_rnn=16,
                        attention_filters=4, attention_kernel_size=5,
                        d_attention=8, d_postnet=8, postnet_kernel_size=3,
                        postnet_conv_layers=2, reduction_factor=1,
                        d_global_condition=256, use_stop_token=True)
    phones = ["a1", "b2", "c3"]
    vocab_size = len(phones)
    t2 = Tacotron2(vocab_size=vocab_size, **model_kwargs)
    tv = t2.init({"params": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
                 jnp.ones((1, 4), jnp.int32), jnp.full((1,), 4),
                 jnp.zeros((1, 6, 10)), jnp.full((1,), 6),
                 global_condition=jnp.zeros((1, 256)),
                 deterministic=False)
    save_pytree(tmp_path / "t2.npz",
                {"params": tv["params"],
                 "batch_stats": tv["batch_stats"]})
    conf = tmp_path / "conf.yaml"
    conf.write_text(
        "fs: 16000\nn_mels: 10\nmodel:\n" + "".join(
            f"  {k}: {v}\n" for k, v in model_kwargs.items()))

    # tiny WaveFlow + config (10 mel bands, x4 upsample)
    wf_kwargs = dict(upsample_factors=[2, 2], n_flows=2, n_layers=2,
                     n_group=4, channels=8, n_mels=10)
    wf = ConditionalWaveFlow(**{**wf_kwargs,
                                "upsample_factors": (2, 2)})
    wv = wf.init(jax.random.PRNGKey(3), jnp.zeros((1, 64)),
                 jnp.zeros((1, 16, 10)))
    save_pytree(tmp_path / "wf.npz", {"params": wv["params"]})
    wf_conf = tmp_path / "wf_conf.yaml"
    wf_conf.write_text("model:\n" + "".join(
        f"  {k}: {v}\n" for k, v in wf_kwargs.items()))

    (tmp_path / "phones.txt").write_text(
        "".join(f"{p} {i}\n" for i, p in enumerate(phones)))
    (tmp_path / "sentences.txt").write_text("utt1 a1 b2\n")
    rng = np.random.default_rng(0)
    save_wav(tmp_path / "ref.wav",
             rng.standard_normal(16000 * 2).astype(np.float32) * 0.1,
             16000)

    _run(RECIPES / "tacotron2_aishell3" / "voice_cloning.py",
         "--config", conf, "--checkpoint", tmp_path / "t2.npz",
         "--ge2e-checkpoint", tmp_path / "ge2e.npz",
         "--ref-wav", tmp_path / "ref.wav",
         "--phones-dict", tmp_path / "phones.txt",
         "--text", tmp_path / "sentences.txt",
         "--waveflow-config", wf_conf,
         "--waveflow-checkpoint", tmp_path / "wf.npz",
         "--output-dir", tmp_path / "cloned",
         "--max-decoder-steps", "12", "--device", "cpu")
    wavs = list((tmp_path / "cloned").glob("*.wav"))
    assert wavs, "voice cloning produced no wav"


def test_ge2e_dataset_adapters(tmp_path):
    """Corpus layout adapters: dir discovery, naming, VoxCeleb1
    anglophone filter (reference dataset_processors.py:106-175) — run
    the librispeech adapter through the real CLI on synthetic wavs."""
    import runpy
    import sys as _sys
    root = tmp_path / "datasets"
    # librispeech layout: LibriSpeech/train-other-500/<spk>/<chap>/*.flac
    for spk in ("19", "26"):
        (root / "LibriSpeech" / "train-other-500" / spk / "0").mkdir(
            parents=True)
    # voxceleb1 layout + meta (speaker id10003 is non-anglophone)
    vox = root / "VoxCeleb1"
    (vox / "wav" / "id10001").mkdir(parents=True)
    (vox / "wav" / "id10003").mkdir(parents=True)
    (vox / "vox1_meta.csv").write_text(
        "VoxCeleb1 ID\tVGGFace1 ID\tGender\tNationality\tSet\n"
        "id10001\tA\tm\tUSA\tdev\n"
        "id10003\tB\tf\tGermany\tdev\n")

    mod = runpy.run_path(
        str(RECIPES / "ge2e" / "preprocess.py"), run_name="not_main")
    collect = mod["collect_speaker_dirs"]
    spks, pattern = collect("librispeech_other", root)
    assert pattern == "*.flac"
    assert [name for name, _ in spks] == [
        "LibriSpeech_train-other-500_19", "LibriSpeech_train-other-500_26"]
    spks, _ = collect("voxceleb1", root)
    assert [name for name, _ in spks] == ["VoxCeleb1_wav_id10001"]

    # generic --input path end-to-end with a real wav
    from parakeet_tpu.audio.codec import save_wav
    gen_root = tmp_path / "generic" / "spkA"
    gen_root.mkdir(parents=True)
    sr = 16000
    t = np.arange(sr * 3) / sr
    save_wav(gen_root / "u0.wav",
             (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32), sr)
    out = tmp_path / "mels"
    _run(RECIPES / "ge2e" / "preprocess.py", "--input", gen_root.parent,
         "--output", out, "--min-frames", 10)
    assert list((out / "spkA").glob("*.npy"))


def test_ge2e_vad_matches_webrtcvad_oracle():
    """Trim-boundary agreement between the recipe's energy VAD and the
    reference webrtcvad pipeline (audio_processor.py:60-107), measured
    on synthetic utterances with leading / trailing / short-internal /
    long-internal silences.

    The oracle re-implements the reference's post-decision pipeline
    independently here (moving average -> round -> binary dilation ->
    repeat) and feeds it the ground-truth per-window speech flags known
    from construction — exactly what webrtcvad mode 3 returns on clean
    audio where silence is ~-80 dBFS and speech is full-scale harmonics.
    """
    import runpy

    from scipy.ndimage import binary_dilation

    mod = runpy.run_path(
        str(RECIPES / "ge2e" / "preprocess.py"), run_name="not_main")
    energy_vad = mod["energy_vad"]

    fs = 16000
    win = (30 * fs) // 1000           # reference vad_window_length=30ms

    def speech(n_win, f0=130.0):
        """Klatt-flavored voiced segment: harmonic stack under a two-
        formant envelope (F1≈500 Hz, F2≈1500 Hz), ~-12 dBFS."""
        t = np.arange(n_win * win) / fs
        x = np.zeros_like(t)
        for k in range(1, 20):
            f = k * f0
            env = (1.0 / (1 + ((f - 500) / 300) ** 2)
                   + 0.6 / (1 + ((f - 1500) / 400) ** 2))
            x += env * np.sin(2 * np.pi * f * t + 0.7 * k)
        return 0.25 * x / np.max(np.abs(x))

    def silence(n_win, rng):
        return 1e-4 * rng.standard_normal(n_win * win)  # ~-80 dBFS

    rng = np.random.default_rng(0)
    # windows: 20 sil | 30 sp | 4 sil (bridged) | 30 sp | 25 sil | 30 sp | 20 sil
    layout = [(20, 0), (30, 1), (4, 0), (30, 1), (25, 0), (30, 1), (20, 0)]
    wav = np.concatenate([speech(n) if v else silence(n, rng)
                          for n, v in layout])
    flags = np.concatenate([np.full(n, bool(v)) for n, v in layout])

    # oracle: the reference's smoothing exactly (audio_processor.py:90-106)
    width, max_sil = 8, 6
    padded = np.concatenate((np.zeros((width - 1) // 2),
                             flags.astype(float), np.zeros(width // 2)))
    c = np.cumsum(padded, dtype=float)
    c[width:] = c[width:] - c[:-width]
    oracle_win = np.round(c[width - 1:] / width).astype(bool)
    oracle_win = binary_dilation(oracle_win, np.ones(max_sil + 1))
    oracle = np.repeat(oracle_win, win)

    got = energy_vad(wav, fs)
    assert got.shape == oracle.shape
    assert np.array_equal(got, oracle)

    # sanity on the oracle itself: the 4-window silence is bridged,
    # the 25-window one is trimmed, lead/tail silences are dropped
    w = oracle_win
    assert w[20:84].all()                      # sp|4 sil|sp fully kept
    assert not w[:15].any() and not w[-15:].any()
    assert (~w[88:109]).sum() >= 10            # long silence mostly cut

    # sub-window tail remainder is masked out (reference cuts it off)
    wav_tail = np.concatenate([wav, speech(1)[: win // 3]])
    got_tail = energy_vad(wav_tail, fs)
    assert not got_tail[-(win // 3):].any()

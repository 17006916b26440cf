"""Long-form (paragraph-scale) synthesis through the real e2e recipe:
>=4096 decoder frames in ONE program, dense vs ``--sp 8`` ring
attention producing identical audio (8-device CPU mesh).

This is the use case sequence parallelism exists for (SURVEY §5.7:
"additive feature for long-form synthesis") — a multi-sentence
paragraph expanded to 4096 frames (51.2 s at hop 300), the decoder
frame axis sharded over 8 devices.  The single-chip RTF of the same
regime is measured on hardware by benchmarks/longform_rtf.py
(docs/tpu_performance.md).
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

REPO = Path(__file__).resolve().parent.parent
RECIPES = REPO / "recipes"

MAX_FRAMES = 4096
MAX_TEXT = 256

TINY_AM_YAML = """\
fs: 24000
n_fft: 512
n_shift: 300
win_length: 512
fmin: 80
fmax: 7600
n_mels: 20
model:
  adim: 16
  aheads: 2
  elayers: 1
  eunits: 32
  dlayers: 1
  dunits: 32
  postnet_layers: 2
  postnet_chans: 8
  postnet_filts: 3
  duration_predictor_chans: 16
  pitch_predictor_chans: 16
  energy_predictor_chans: 16
"""

TINY_VOC_YAML = """\
fs: 24000
n_mels: 20
generator_params:
  layers: 2
  stacks: 1
  residual_channels: 4
  gate_channels: 8
  skip_channels: 4
  aux_channels: 20
  aux_context_window: 1
  upsample_scales: [4, 5, 3, 5]
"""


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Tiny FS2 + PWG checkpoints, phones dict, paragraph text file."""
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2, PWGGenerator
    from parakeet_tpu.training.checkpoint import save_pytree

    root = tmp_path_factory.mktemp("longform")
    (root / "am.yaml").write_text(TINY_AM_YAML)
    (root / "voc.yaml").write_text(TINY_VOC_YAML)

    paragraph = "你好。今天天气很好。我们去公园散步吧。明天见。"
    # phone inventory FROM the frontend itself, so every phone the
    # paragraph produces is in-vocabulary (a real recipe's
    # phone_id_map.txt covers the corpus the same way)
    from parakeet_tpu.frontend.zh_frontend import Frontend
    fe = Frontend(strict=False)
    seen = sorted({p for sent in fe.get_phonemes(paragraph)
                   for p in sent})
    phones = ["<pad>", "<unk>", "sil", "sp"] + seen
    (root / "phone_id_map.txt").write_text(
        "\n".join(f"{p} {i}" for i, p in enumerate(phones)) + "\n")

    am = FastSpeech2(idim=len(phones), odim=20, adim=16, aheads=2,
                     elayers=1, eunits=32, dlayers=1, dunits=32,
                     postnet_layers=2, postnet_chans=8, postnet_filts=3,
                     duration_predictor_chans=16,
                     pitch_predictor_chans=16, energy_predictor_chans=16)
    text = jnp.ones((1, 8), jnp.int64)
    am_vars = am.init({"params": jax.random.PRNGKey(0)}, text,
                      jnp.asarray([8], jnp.int64), max_frames=32,
                      method=FastSpeech2.inference)
    save_pytree(root / "am.npz", dict(am_vars))

    voc = PWGGenerator(layers=2, stacks=1, residual_channels=4,
                       gate_channels=8, skip_channels=4, aux_channels=20,
                       aux_context_window=1, upsample_scales=(4, 5, 3, 5))
    gv = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 300, 1)),
                  jnp.zeros((1, 3, 20)))
    save_pytree(root / "voc.npz", {"params": gv["params"]})

    # a multi-sentence zh paragraph, one line = one long-form utterance
    (root / "paragraph.txt").write_text(f"para001 {paragraph}\n")
    return root


def _synthesize(assets, out_name, *extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    out = assets / out_name
    cmd = [sys.executable,
           str(RECIPES / "fastspeech2" / "synthesize_e2e.py"),
           "--fastspeech2-config", str(assets / "am.yaml"),
           "--fastspeech2-checkpoint", str(assets / "am.npz"),
           "--pwg-config", str(assets / "voc.yaml"),
           "--pwg-checkpoint", str(assets / "voc.npz"),
           "--phones-dict", str(assets / "phone_id_map.txt"),
           "--text", str(assets / "paragraph.txt"),
           "--output-dir", str(out), "--lang", "zh",
           "--max-text-len", str(MAX_TEXT),
           "--max-frames", str(MAX_FRAMES),
           # untrained duration predictor: force paragraph scale
           # (~38 phones x 128 frames > MAX_FRAMES, so the output is
           # clipped to exactly MAX_FRAMES frames)
           "--min-duration", "128",
           "--device", "cpu"] + [str(a) for a in extra]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=1200, cwd=str(REPO), env=env)
    assert proc.returncode == 0, (
        f"synthesize_e2e failed\nSTDOUT:\n{proc.stdout[-3000:]}\n"
        f"STDERR:\n{proc.stderr[-3000:]}")
    from parakeet_tpu.audio.codec import load_wav
    wav, sr = load_wav(out / "para001.wav")
    return wav, sr


def test_longform_dense_vs_sp8(assets):
    wav_dense, sr = _synthesize(assets, "wavs_dense")
    # >= 4096 frames of audio from ONE paragraph line in one program
    assert len(wav_dense) >= MAX_FRAMES * 300, len(wav_dense)
    assert len(wav_dense) / sr > 45.0

    wav_sp, _ = _synthesize(assets, "wavs_sp8", "--sp", 8)
    assert len(wav_sp) == len(wav_dense)
    # ring attention is exact (same math, different schedule); wav codec
    # is 16-bit so compare at the quantization floor
    np.testing.assert_allclose(wav_sp.astype(np.float64),
                               wav_dense.astype(np.float64),
                               atol=2.0 / 32768)

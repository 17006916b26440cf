"""Chain test on speech-like acoustics (reference analog:
tests/chain/test.sh on the mini_BZNSYP corpus).

No recorded speech is obtainable in this environment (zero network
egress; none on disk) — see parakeet_tpu/audio/synthetic.py.  This
chain therefore runs the real recipe CLIs end-to-end on Klatt-style
formant-synthesized utterances: harmonic voiced segments with formant
structure, fricatives, silences, and a real F0 contour — exercising
the exact preprocess paths (YIN pitch, mel, energy, silence trimming)
that sine-wave corpora cannot (a pure sine has no formants, no
unvoiced segments, and trivial pitch).
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

REPO = Path(__file__).resolve().parent.parent
RECIPES = REPO / "recipes"

PHONE_SETS = [
    ["sil", "a", "i", "s", "u", "sil"],
    ["sil", "e", "sh", "o", "a", "sil"],
    ["sil", "u", "f", "i", "e", "sil"],
    ["sil", "o", "s", "a", "u", "sil"],
]


def _run(script, *args):
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, str(script)] + [str(a) for a in args]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                          cwd=str(REPO), env=env)
    if proc.returncode != 0:
        raise AssertionError(
            f"{script.name} failed\nSTDOUT:\n{proc.stdout[-3000:]}\n"
            f"STDERR:\n{proc.stderr[-3000:]}")
    return proc


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from parakeet_tpu.audio.codec import save_wav
    from parakeet_tpu.audio.synthetic import formant_utterance

    root = tmp_path_factory.mktemp("chain_real")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(7)
    lines = []
    for i in range(8):
        phone_names = PHONE_SETS[i % len(PHONE_SETS)]
        phones = [(p, 0.08 if p == "sil"
                   else float(rng.uniform(0.10, 0.24)))
                  for p in phone_names]
        u = formant_utterance(
            phones=phones, seed=100 + i,
            f0_start=float(rng.uniform(150, 230)),
            f0_end=float(rng.uniform(100, 140)))
        utt = f"real{i:03d}"
        save_wav(wavs / f"{utt}.wav", u["wav"], u["sr"])
        pd = " ".join(f"{p} {d}"
                      for p, d in zip(u["phones"], u["durations"]))
        lines.append(f"{utt}|spk0|{pd}")
    (root / "durations.txt").write_text("\n".join(lines) + "\n")

    cfg = root / "tiny.yaml"
    cfg.write_text("""\
fs: 24000
n_fft: 512
n_shift: 300
win_length: 512
fmin: 80
fmax: 7600
n_mels: 20
f0min: 80
f0max: 400
model:
  init_type: xavier_uniform
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
updater:
  use_masking: true
optimizer:
  optim: adam
  learning_rate: 0.001
batch_size: 2
max_epoch: 8
num_snapshots: 1
seed: 1
""")
    return root


def test_chain_on_speech_acoustics(corpus):
    root = corpus
    dump = root / "dump"
    _run(RECIPES / "fastspeech2" / "preprocess.py",
         "--rootdir", root / "wavs", "--duration-file",
         root / "durations.txt", "--dumpdir", dump,
         "--config", root / "tiny.yaml",
         "--dev-size", 2, "--test-size", 0)

    # the YIN pitch targets extracted from speech-like audio must be
    # plausible log-f0 (the corpus F0 spans ~100-230 Hz)
    meta = (dump / "metadata_train.jsonl").read_text().splitlines()
    assert len(meta) == 6
    import json
    rec = json.loads(meta[0])
    pitch = np.load(rec["pitch"]).reshape(-1)
    voiced = pitch[pitch > 0]
    assert voiced.size > 0, "no voiced pitch targets extracted"
    hz = np.exp(voiced[np.isfinite(voiced)])
    assert (hz > 80).all() and (hz < 400).all(), \
        f"pitch targets outside corpus F0 range: {hz.min()}-{hz.max()}"

    norm_train = root / "norm" / "train"
    norm_dev = root / "norm" / "dev"
    _run(RECIPES / "fastspeech2" / "normalize.py",
         "--metadata", dump / "metadata_train.jsonl",
         "--dumpdir", norm_train, "--phones-dict",
         dump / "phone_id_map.txt", "--stats-dir", dump,
         "--compute-stats")
    _run(RECIPES / "fastspeech2" / "normalize.py",
         "--metadata", dump / "metadata_dev.jsonl",
         "--dumpdir", norm_dev, "--phones-dict",
         dump / "phone_id_map.txt", "--stats-dir", dump)

    exp = root / "exp"
    _run(RECIPES / "fastspeech2" / "train.py",
         "--config", root / "tiny.yaml",
         "--train-metadata", norm_train / "metadata.jsonl",
         "--dev-metadata", norm_dev / "metadata.jsonl",
         "--output-dir", exp,
         "--phones-dict", dump / "phone_id_map.txt",
         "--device", "cpu")
    snapshots = sorted((exp / "checkpoints").glob("*.npz"))
    assert snapshots, "no snapshot written"

    # synthesize through the produced snapshot + a tiny PWG init
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import PWGGenerator
    from parakeet_tpu.training.checkpoint import save_pytree
    gen = PWGGenerator(layers=2, stacks=1, residual_channels=4,
                       gate_channels=8, skip_channels=4, aux_channels=20,
                       aux_context_window=1, upsample_scales=(4, 5, 3, 5))
    gv = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 1)),
                  jnp.zeros((1, 3, 20)))
    save_pytree(root / "pwg_synth.npz", {"params": gv["params"]})
    voc_cfg = root / "pwg_synth.yaml"
    voc_cfg.write_text(
        "fs: 24000\nn_mels: 20\ngenerator_params:\n  layers: 2\n"
        "  stacks: 1\n  residual_channels: 4\n  gate_channels: 8\n"
        "  skip_channels: 4\n  aux_channels: 20\n  aux_context_window: 1\n"
        "  upsample_scales: [4, 5, 3, 5]\n")

    out_dir = root / "synth"
    _run(RECIPES / "fastspeech2" / "synthesize.py",
         "--fastspeech2-config", root / "tiny.yaml",
         "--fastspeech2-checkpoint", snapshots[-1],
         "--fastspeech2-stat", dump / "speech_stats.npy",
         "--pwg-config", voc_cfg,
         "--pwg-checkpoint", root / "pwg_synth.npz",
         "--phones-dict", dump / "phone_id_map.txt",
         "--test-metadata", norm_dev / "metadata.jsonl",
         "--output-dir", out_dir, "--device", "cpu")
    produced = sorted(out_dir.glob("*.wav"))
    assert produced, "no synthesized wav"
    from parakeet_tpu.audio.codec import load_wav
    for w in produced:
        wav, sr = load_wav(w)
        assert sr == 24000
        assert np.isfinite(wav).all(), f"{w.name} has non-finite samples"
        assert np.abs(wav).max() > 1e-5, f"{w.name} is silent"
        assert wav.size > sr // 4, f"{w.name} too short: {wav.size}"

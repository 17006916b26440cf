"""Chain test for the LJSpeech-style AR recipes: transformer_tts
preprocess -> normalize -> train -> synthesize_e2e (WaveFlow vocoder),
plus the tacotron2 character-frontend preprocess (reference analogs:
examples/transformer_tts/*, examples/tacotron2/preprocess.py)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

REPO = Path(__file__).resolve().parent.parent
RECIPES = REPO / "recipes"


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
def lj_corpus(tmp_path_factory):
    """Fake LJSpeech-1.1 layout: metadata.csv + wavs/."""
    root = tmp_path_factory.mktemp("lj") / "LJSpeech-1.1"
    (root / "wavs").mkdir(parents=True)
    from parakeet_tpu.audio.codec import save_wav
    sr, hop = 22050, 256
    rng = np.random.default_rng(0)
    lines = []
    texts = ["printing was done", "by hand press", "in early times",
             "with metal type"]
    for i, text in enumerate(texts):
        utt = f"LJ001-{i:04d}"
        n = (40 + 6 * i) * hop
        t = np.arange(n) / sr
        wav = (0.3 * np.sin(2 * np.pi * (110 + 20 * i) * t)
               + 0.01 * rng.standard_normal(n)).astype(np.float32)
        save_wav(root / "wavs" / f"{utt}.wav", wav, sr)
        lines.append(f"{utt}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")

    conf = root.parent / "tts.yaml"
    conf.write_text("""\
fs: 22050
n_fft: 1024
n_shift: 256
win_length: 1024
fmin: 80
fmax: 7600
n_mels: 20
model:
  adim: 16
  aheads: 2
  elayers: 1
  eunits: 24
  dlayers: 1
  dunits: 24
  eprenet_conv_layers: 0
  dprenet_units: 8
  postnet_layers: 2
  postnet_chans: 8
  postnet_filts: 3
optimizer: {optim: adam, learning_rate: 0.001}
batch_size: 2
max_epoch: 1
num_snapshots: 1
seed: 1
""")
    return {"root": root, "conf": conf}


def test_chain_transformer_tts_ljspeech_e2e(lj_corpus):
    root, conf = lj_corpus["root"], lj_corpus["conf"]
    work = root.parent
    dump = work / "dump"
    _run(RECIPES / "transformer_tts" / "preprocess.py",
         "--rootdir", root, "--dumpdir", dump, "--config", conf,
         "--dev-size", 1, "--test-size", 0)
    assert (dump / "phone_id_map.txt").exists()
    tokens = [l.split()[0] for l in open(dump / "phone_id_map.txt")]
    assert tokens[:2] == ["<pad>", "<unk>"] and tokens[-1] == "<eos>"

    norm_train, norm_dev = work / "norm/train", work / "norm/dev"
    for meta, out, extra in (("metadata_train.jsonl", norm_train,
                              ["--compute-stats"]),
                             ("metadata_dev.jsonl", norm_dev, [])):
        _run(RECIPES / "transformer_tts" / "normalize.py",
             "--metadata", dump / meta, "--dumpdir", out,
             "--phones-dict", dump / "phone_id_map.txt",
             "--stats-dir", dump, *extra)
    assert (dump / "speech_stats.npy").exists()

    exp = work / "exp"
    _run(RECIPES / "transformer_tts" / "train.py",
         "--config", conf,
         "--train-metadata", norm_train / "metadata.jsonl",
         "--dev-metadata", norm_dev / "metadata.jsonl",
         "--output-dir", exp,
         "--phones-dict", dump / "phone_id_map.txt", "--device", "cpu")
    snap = sorted((exp / "checkpoints").glob("*.npz"))
    assert snap, "no snapshot"

    # random-init tiny WaveFlow checkpoint for the e2e vocoder leg
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import ConditionalWaveFlow
    from parakeet_tpu.training.checkpoint import save_pytree
    wf_conf = work / "wf.yaml"
    wf_conf.write_text("""\
fs: 22050
model:
  upsample_factors: [16, 16]
  n_flows: 2
  n_layers: 2
  n_group: 4
  channels: 8
  n_mels: 20
""")
    wf = ConditionalWaveFlow(upsample_factors=(16, 16), n_flows=2,
                             n_layers=2, n_group=4, channels=8, n_mels=20)
    wv = wf.init(jax.random.PRNGKey(0), jnp.zeros((1, 8 * 256)),
                 jnp.zeros((1, 8, 20)))
    save_pytree(work / "wf.npz", {"params": wv["params"]})

    text_file = work / "sentences.txt"
    text_file.write_text("demo001 printing was done by hand\n")
    outdir = work / "wavs_out"
    _run(RECIPES / "transformer_tts" / "synthesize_e2e.py",
         "--config", conf, "--checkpoint", snap[-1],
         "--stat", dump / "speech_stats.npy",
         "--phones-dict", dump / "phone_id_map.txt",
         "--waveflow-config", wf_conf, "--waveflow-checkpoint",
         work / "wf.npz", "--text", text_file, "--output-dir", outdir,
         "--lang", "en", "--max-text-len", 48,
         "--max-decoder-steps", 32, "--device", "cpu")
    wavs = list(outdir.glob("*.wav"))
    assert wavs, "no e2e wav"
    from parakeet_tpu.audio.codec import load_wav
    wav, sr = load_wav(wavs[0])
    assert sr == 22050 and len(wav) > 0


def test_tacotron2_char_preprocess(lj_corpus):
    root, conf = lj_corpus["root"], lj_corpus["conf"]
    dump = root.parent / "t2_dump"
    _run(RECIPES / "tacotron2" / "preprocess.py",
         "--rootdir", root, "--dumpdir", dump, "--config", conf,
         "--frontend", "char", "--dev-size", 1, "--test-size", 1)
    import json
    rows = [json.loads(l) for l in open(dump / "metadata_train.jsonl")]
    assert rows and all(Path(r["speech"]).exists() for r in rows)
    # char frontend: single characters, word boundaries as <sp>
    assert all(len(t) == 1 or t == "<sp>"
               for r in rows for t in r["phones"])
    assert any(t == "<sp>" for r in rows for t in r["phones"])
    # the shared normalize wrapper maps tokens -> ids
    _run(RECIPES / "tacotron2" / "normalize.py",
         "--metadata", dump / "metadata_train.jsonl",
         "--dumpdir", dump / "norm", "--phones-dict",
         dump / "phone_id_map.txt", "--stats-dir", dump,
         "--compute-stats")
    rows = [json.loads(l)
            for l in open(dump / "norm" / "metadata.jsonl")]
    assert all(isinstance(i, int) for r in rows for i in r["text"])

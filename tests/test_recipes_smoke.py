"""Recipe CLI smoke tests: every script imports and parses --help, and
the GE2E preprocess -> inference chain runs end to end on synthetic wavs
(reference equivalents: examples/<model>/*.py, examples/ge2e/*)."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
RECIPES = REPO / "recipes"

ALL_SCRIPTS = sorted(RECIPES.glob("*/*.py"))


def _run(script, *args, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
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

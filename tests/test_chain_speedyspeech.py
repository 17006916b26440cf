"""Chain test: SpeedySpeech e2e synthesis + serialized-graph deployment.

TPU analog of the reference deploy chain (reference:
examples/speedyspeech/baker/synthesize_e2e.py:84-101 export via
paddle.jit.save, then inference.py through paddle.inference): synthesize
from text with randomly initialized weights, export jax.export
artifacts, and re-run synthesis through the deserialized graphs with no
model code.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`


REPO = Path(__file__).resolve().parent.parent
RECIPES = REPO / "recipes"


def _run(script, *args):
    env = dict(os.environ)
    # Strip the axon sitecustomize so JAX_PLATFORMS=cpu actually takes
    # effect (it overrides the env var; see CLAUDE.md) — these smoke
    # subprocesses must never land on the real TPU.
    inherited = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                 if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([str(REPO)] + inherited)
    env.setdefault("JAX_PLATFORMS", "cpu")
    cmd = [sys.executable, str(script)] + [str(a) for a in args]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                          cwd=str(REPO), env=env)
    if proc.returncode != 0:
        raise AssertionError(
            f"{script.name} failed\nSTDOUT:\n{proc.stdout[-3000:]}\n"
            f"STDERR:\n{proc.stderr[-3000:]}")
    return proc


def test_speedyspeech_e2e_export_inference(tmp_path):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.frontend.zh_frontend import Frontend
    from parakeet_tpu.models import PWGGenerator, SpeedySpeech
    from parakeet_tpu.training.checkpoint import save_pytree

    # phone/tone vocabs from what the frontend actually emits
    frontend = Frontend()
    phones = frontend.get_input_ids("你好，今天天气很好。")["phones"][0]
    bases = sorted({p[:-1] if p[-1].isdigit() else p for p in phones})
    phone_dict = tmp_path / "phone_id_map.txt"
    phone_dict.write_text("".join(
        f"{p} {i}\n" for i, p in enumerate(["<pad>"] + bases, 0)))
    tone_dict = tmp_path / "tone_id_map.txt"
    tone_dict.write_text("".join(
        f"{t} {i}\n" for i, t in enumerate("01234")))

    vocab_size = len(bases) + 1
    cfg = tmp_path / "ss.yaml"
    cfg.write_text("""\
fs: 24000
n_mels: 40
model:
  encoder_hidden_size: 16
  encoder_dilations: [1, 3, 1]
  duration_predictor_hidden_size: 16
  decoder_hidden_size: 16
  decoder_output_size: 40
  decoder_dilations: [1, 3, 1]
""")
    voc_cfg = tmp_path / "pwg.yaml"
    voc_cfg.write_text("""\
fs: 24000
n_mels: 40
generator_params:
  layers: 2
  stacks: 1
  residual_channels: 4
  gate_channels: 8
  skip_channels: 4
  aux_channels: 40
  aux_context_window: 1
  upsample_scales: [4, 5]
""")

    am = SpeedySpeech(vocab_size=vocab_size, tone_size=5,
                      encoder_hidden_size=16, encoder_dilations=(1, 3, 1),
                      duration_predictor_hidden_size=16,
                      decoder_hidden_size=16, decoder_output_size=40,
                      decoder_dilations=(1, 3, 1))
    t = jnp.zeros((1, 8), jnp.int64)
    av = am.init(jax.random.PRNGKey(0), t, jnp.ones((1, 8), jnp.int64),
                 tones=t, method=SpeedySpeech.__call__)
    am_ckpt = tmp_path / "ss.npz"
    save_pytree(am_ckpt, {"params": av["params"],
                          "batch_stats": av["batch_stats"]})

    gen = PWGGenerator(layers=2, stacks=1, residual_channels=4,
                       gate_channels=8, skip_channels=4, aux_channels=40,
                       aux_context_window=1, upsample_scales=(4, 5))
    gv = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 1)),
                  jnp.zeros((1, 6, 40)))
    voc_ckpt = tmp_path / "pwg.npz"
    save_pytree(voc_ckpt, {"params": gv["params"]})

    text_file = tmp_path / "sentences.txt"
    text_file.write_text("demo001 你好。\n")

    outdir = tmp_path / "wavs"
    export_dir = tmp_path / "exported"
    _run(RECIPES / "speedyspeech" / "synthesize_e2e.py",
         "--config", cfg, "--checkpoint", am_ckpt,
         "--pwg-config", voc_cfg, "--pwg-checkpoint", voc_ckpt,
         "--phones-dict", phone_dict, "--tones-dict", tone_dict,
         "--text", text_file, "--output-dir", outdir,
         "--export-dir", export_dir,
         "--max-text-len", 16, "--max-frames", 64, "--device", "cpu")
    assert list(outdir.glob("*.wav")), "no wav synthesized"
    assert (export_dir / "speedyspeech.jaxexport").exists()
    assert (export_dir / "pwgan.jaxexport").exists()

    outdir2 = tmp_path / "wavs_deployed"
    _run(RECIPES / "speedyspeech" / "inference.py",
         "--export-dir", export_dir, "--phones-dict", phone_dict,
         "--tones-dict", tone_dict, "--text", text_file,
         "--output-dir", outdir2, "--device", "cpu")
    wavs = list(outdir2.glob("*.wav"))
    assert wavs, "no wav from deserialized graphs"
    from parakeet_tpu.audio.codec import load_wav
    wav, sr = load_wav(wavs[0])
    assert sr == 24000 and len(wav) > 0

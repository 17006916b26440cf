"""Chain (integration) test: preprocess -> normalize -> train -> e2e synth.

TPU analog of the reference's shell-driven chain tests (reference:
tests/chain/test.sh, SURVEY.md §4.5): run the real recipe CLIs on a tiny
synthetic corpus for a few iterations, then synthesize a wav from text
through the produced snapshots.
"""
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
def corpus(tmp_path_factory):
    """Synthetic mini corpus: sine-ish wavs + duration file + config."""
    root = tmp_path_factory.mktemp("chain")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    sr, hop = 24000, 300
    phones = ["sil", "b", "a1", "sp", "m", "i2", "sil"]
    lines = []
    from parakeet_tpu.audio.codec import save_wav
    for i in range(6):
        n_frames = 40 + 8 * i
        t = np.arange(n_frames * hop) / sr
        f0 = 120 + 20 * i
        wav = (0.3 * np.sin(2 * np.pi * f0 * t)
               + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
        utt = f"utt{i:03d}"
        save_wav(wavs / f"{utt}.wav", wav, sr)
        durs = np.full(len(phones), n_frames // len(phones), np.int64)
        durs[-1] += n_frames - durs.sum()
        pd = " ".join(f"{p} {d}" for p, d in zip(phones, durs))
        lines.append(f"{utt}|spk{i % 2}|{pd}")
    (root / "durations.txt").write_text("\n".join(lines) + "\n")

    config = root / "tiny.yaml"
    config.write_text("""\
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
max_epoch: 1
num_snapshots: 2
seed: 1
""")
    return root


@pytest.fixture(scope="module")
def fs2_prepared(corpus):
    """fastspeech2 preprocess + normalize (single-speaker) once."""
    root = corpus
    dump = root / "dump"
    _run(RECIPES / "fastspeech2" / "preprocess.py",
         "--rootdir", root / "wavs", "--duration-file",
         root / "durations.txt", "--dumpdir", dump,
         "--config", root / "tiny.yaml",
         "--dev-size", 2, "--test-size", 0)
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
    return {"dump": dump, "norm_train": norm_train, "norm_dev": norm_dev}


@pytest.fixture(scope="module")
def fs2_trained(corpus, fs2_prepared):
    """one-epoch fastspeech2 training once; returns the exp dir."""
    root = corpus
    exp = root / "exp"
    _run(RECIPES / "fastspeech2" / "train.py",
         "--config", root / "tiny.yaml",
         "--train-metadata", fs2_prepared["norm_train"] / "metadata.jsonl",
         "--dev-metadata", fs2_prepared["norm_dev"] / "metadata.jsonl",
         "--output-dir", exp,
         "--phones-dict", fs2_prepared["dump"] / "phone_id_map.txt",
         "--device", "cpu")
    return exp


PWG_TINY_YAML = """\
fs: 24000
n_fft: 512
n_shift: 300
win_length: 512
fmin: 80
fmax: 7600
n_mels: 20
generator_params:
  layers: 2
  stacks: 1
  residual_channels: 4
  gate_channels: 8
  skip_channels: 4
  aux_context_window: 1
  upsample_scales: [4, 5, 3, 5]
discriminator_params:
  layers: 3
  conv_channels: 4
updater:
  lambda_adv: 4.0
  discriminator_train_start_steps: 1
stft_loss_params:
  fft_sizes: [256]
  hop_sizes: [64]
  win_lengths: [128]
batch_size: 2
batch_max_steps: 6000
generator_optimizer:
  optim: adam
  learning_rate: 0.0001
discriminator_optimizer:
  optim: adam
  learning_rate: 0.00005
train_max_steps: 3
eval_interval_steps: 2
save_interval_steps: 2
num_snapshots: 1
seed: 1
"""


@pytest.fixture(scope="module")
def pwg_prepared(corpus):
    """pwgan preprocess (sil-cut) + stats + normalize once (wave + feats
    dumps shared with waveflow)."""
    root = corpus
    voc_cfg = root / "pwg_tiny.yaml"
    voc_cfg.write_text(PWG_TINY_YAML)
    dump = root / "pwg_dump"
    _run(RECIPES / "pwgan" / "preprocess.py",
         "--rootdir", root / "wavs", "--dumpdir", dump,
         "--config", voc_cfg, "--dev-size", 2,
         "--dur-file", root / "durations.txt", "--cut-sil")
    stats = dump / "feats_stats.npy"
    _run(RECIPES / "pwgan" / "normalize.py",
         "--metadata", dump / "metadata_train.jsonl",
         "--dumpdir", dump / "norm_train", "--stats", stats,
         "--compute-stats")
    _run(RECIPES / "pwgan" / "normalize.py",
         "--metadata", dump / "metadata_dev.jsonl",
         "--dumpdir", dump / "norm_dev", "--stats", stats,
         "--skip-wav-copy")
    return {"cfg": voc_cfg, "dump": dump, "stats": stats}


def test_chain_fastspeech2_dp(corpus, fs2_prepared):
    """Data-parallel CLI leg: train.py --dp 2 on the virtual CPU mesh
    (reference chain tests exercise multi-GPU via gpu_list, tests/chain/
    *_multi_gpu.txt; here DP = batch sharding over a jax Mesh)."""
    root = corpus
    exp = root / "exp_dp"
    _run(RECIPES / "fastspeech2" / "train.py",
         "--config", root / "tiny.yaml",
         "--train-metadata", fs2_prepared["norm_train"] / "metadata.jsonl",
         "--dev-metadata", fs2_prepared["norm_dev"] / "metadata.jsonl",
         "--output-dir", exp,
         "--phones-dict", fs2_prepared["dump"] / "phone_id_map.txt",
         "--device", "cpu", "--dp", 2)
    assert sorted((exp / "checkpoints").glob("*.npz")), "no DP snapshot"


def test_chain_fastspeech2(corpus, fs2_prepared, fs2_trained):
    dump = fs2_prepared["dump"]
    assert (dump / "metadata_train.jsonl").exists()
    assert (dump / "phone_id_map.txt").exists()
    assert (dump / "speech_stats.npy").exists()
    snapshots = list((fs2_trained / "checkpoints").glob("*.npz"))
    assert snapshots, "no snapshot written"


def test_chain_fastspeech2_multispeaker(corpus, fs2_prepared):
    """Multi-speaker leg (aishell3/vctk-style): normalize with the
    speaker map, train with --speaker-dict, batch-synthesize per
    speaker through synthesize.py --speaker-dict (runs after
    test_chain_fastspeech2, reusing its dump)."""
    root = corpus
    dump = root / "dump"
    spk_dict = dump / "speaker_id_map.txt"
    assert spk_dict.exists()
    assert sum(1 for _ in open(spk_dict)) == 2

    norm_train = root / "norm_spk" / "train"
    norm_dev = root / "norm_spk" / "dev"
    for meta, out in (("metadata_train.jsonl", norm_train),
                      ("metadata_dev.jsonl", norm_dev)):
        _run(RECIPES / "fastspeech2" / "normalize.py",
             "--metadata", dump / meta, "--dumpdir", out,
             "--phones-dict", dump / "phone_id_map.txt",
             "--speaker-dict", spk_dict, "--stats-dir", dump)

    exp = root / "exp_spk"
    _run(RECIPES / "fastspeech2" / "train.py",
         "--config", root / "tiny.yaml",
         "--train-metadata", norm_train / "metadata.jsonl",
         "--dev-metadata", norm_dev / "metadata.jsonl",
         "--output-dir", exp,
         "--phones-dict", dump / "phone_id_map.txt",
         "--speaker-dict", spk_dict, "--device", "cpu")
    snapshots = sorted((exp / "checkpoints").glob("*.npz"))
    assert snapshots, "no multi-speaker snapshot written"

    # tiny PWG init checkpoint (no GAN training needed for the CLI path)
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import PWGGenerator
    from parakeet_tpu.training.checkpoint import save_pytree
    voc_cfg = root / "pwg_synth.yaml"
    voc_cfg.write_text(
        "fs: 24000\nn_mels: 20\ngenerator_params:\n  layers: 2\n"
        "  stacks: 1\n  residual_channels: 4\n  gate_channels: 8\n"
        "  skip_channels: 4\n  aux_channels: 20\n  aux_context_window: 1\n"
        "  upsample_scales: [4, 5, 3, 5]\n")
    gen = PWGGenerator(layers=2, stacks=1, residual_channels=4,
                       gate_channels=8, skip_channels=4, aux_channels=20,
                       aux_context_window=1, upsample_scales=(4, 5, 3, 5))
    gv = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 1)),
                  jnp.zeros((1, 3, 20)))
    save_pytree(root / "pwg_synth.npz", {"params": gv["params"]})

    out_dir = root / "wavs_spk"
    _run(RECIPES / "fastspeech2" / "synthesize.py",
         "--fastspeech2-config", root / "tiny.yaml",
         "--fastspeech2-checkpoint", snapshots[-1],
         "--fastspeech2-stat", dump / "speech_stats.npy",
         "--pwg-config", voc_cfg,
         "--pwg-checkpoint", root / "pwg_synth.npz",
         "--test-metadata", norm_dev / "metadata.jsonl",
         "--phones-dict", dump / "phone_id_map.txt",
         "--speaker-dict", spk_dict,
         "--output-dir", out_dir, "--max-frames", 256,
         "--device", "cpu")
    assert list(out_dir.glob("*.wav")), "no multi-speaker wav produced"


def test_chain_pwgan_and_e2e(corpus, fs2_prepared, fs2_trained,
                             pwg_prepared):
    root = corpus
    voc_cfg = pwg_prepared["cfg"]
    dump = pwg_prepared["dump"]
    exp = root / "pwg_exp"
    _run(RECIPES / "pwgan" / "train.py",
         "--config", voc_cfg,
         "--train-metadata", dump / "norm_train" / "metadata.jsonl",
         "--dev-metadata", dump / "norm_dev" / "metadata.jsonl",
         "--output-dir", exp,
         "--opts", "train_max_steps", "3",
         "--device", "cpu")
    snapshots = sorted((exp / "checkpoints").glob("*.npz"))
    assert snapshots, "no vocoder snapshot"

    # ---- copy synthesis: wav -> mel -> z-score -> PWG -> wav -----------
    copy_dir = root / "wavs_copy"
    _run(RECIPES / "pwgan" / "synthesize_from_wav.py",
         "--config", voc_cfg, "--checkpoint", snapshots[-1],
         "--stats", pwg_prepared["stats"],
         "--input-wav", root / "wavs" / "utt000.wav",
         "--output-dir", copy_dir, "--max-frames", 64,
         "--device", "cpu")
    assert (copy_dir / "utt000_gen.wav").exists(), "no copy-synth wav"

    # ---- e2e: text -> FS2 -> PWG -> wav --------------------------------
    fs2_snap = sorted((fs2_trained / "checkpoints").glob("*.npz"))[-1]
    text_file = root / "sentences.txt"
    text_file.write_text("demo001 \u4f60\u597d\u3002\n")
    outdir = root / "wavs_out"
    _run(RECIPES / "fastspeech2" / "synthesize_e2e.py",
         "--fastspeech2-config", root / "tiny.yaml",
         "--fastspeech2-checkpoint", fs2_snap,
         "--fastspeech2-stat", root / "dump" / "speech_stats.npy",
         "--pwg-config", voc_cfg,
         "--pwg-checkpoint", snapshots[-1],
         "--phones-dict", root / "dump" / "phone_id_map.txt",
         "--text", text_file, "--output-dir", outdir,
         "--lang", "zh", "--max-text-len", 32, "--max-frames", 128,
         "--device", "cpu")
    wavs = list(outdir.glob("*.wav"))
    assert wavs, "no wav synthesized"
    from parakeet_tpu.audio.codec import load_wav
    wav, sr = load_wav(wavs[0])
    assert sr == 24000 and len(wav) > 0

    # ---- static export + deploy: jax.export graphs, no model code ------
    export_dir = root / "exported_fs2"
    _run(RECIPES / "fastspeech2" / "synthesize_e2e.py",
         "--fastspeech2-config", root / "tiny.yaml",
         "--fastspeech2-checkpoint", fs2_snap,
         "--fastspeech2-stat", root / "dump" / "speech_stats.npy",
         "--pwg-config", voc_cfg,
         "--pwg-checkpoint", snapshots[-1],
         "--phones-dict", root / "dump" / "phone_id_map.txt",
         "--text", text_file, "--output-dir", root / "wavs_out2",
         "--lang", "zh", "--max-text-len", 32, "--max-frames", 128,
         "--export-dir", export_dir, "--device", "cpu")
    assert (export_dir / "fastspeech2.jaxexport").exists()
    deploy_out = root / "wavs_deploy"
    _run(RECIPES / "fastspeech2" / "inference.py",
         "--export-dir", export_dir,
         "--phones-dict", root / "dump" / "phone_id_map.txt",
         "--text", text_file, "--output-dir", deploy_out,
         "--lang", "zh", "--device", "cpu")
    assert list(deploy_out.glob("*.wav")), "no deployed-graph wav"


def test_chain_tacotron2_waveflow(corpus, fs2_prepared,
                                  pwg_prepared):
    """AR leg: train Tacotron2 and WaveFlow for a few steps through the
    real CLIs on the dumps produced by the earlier legs, then decode +
    vocode via tacotron2/synthesize.py (exercises the full-variables
    checkpoint path the AR CLIs load)."""
    root = corpus
    dump = fs2_prepared["dump"]
    norm_train = fs2_prepared["norm_train"]
    norm_dev = fs2_prepared["norm_dev"]

    t2_cfg = root / "t2_tiny.yaml"
    t2_cfg.write_text("""\
fs: 24000
n_mels: 20
model:
  d_mels: 20
  d_encoder: 16
  encoder_conv_layers: 1
  encoder_kernel_size: 3
  d_prenet: 8
  d_attention_rnn: 16
  d_decoder_rnn: 16
  attention_filters: 4
  attention_kernel_size: 5
  d_attention: 8
  d_postnet: 8
  postnet_kernel_size: 3
  postnet_conv_layers: 2
  reduction_factor: 1
  use_stop_token: true
updater:
  use_stop_token_loss: true
  use_guided_attention_loss: false
optimizer:
  optim: adam
  learning_rate: 0.001
batch_size: 2
max_epoch: 1
num_snapshots: 1
seed: 1
""")
    t2_exp = root / "t2_exp"
    _run(RECIPES / "tacotron2" / "train.py",
         "--config", t2_cfg,
         "--train-metadata", norm_train / "metadata.jsonl",
         "--dev-metadata", norm_dev / "metadata.jsonl",
         "--output-dir", t2_exp,
         "--phones-dict", dump / "phone_id_map.txt", "--device", "cpu")
    t2_snap = sorted((t2_exp / "checkpoints").glob("*.npz"))
    assert t2_snap, "no tacotron2 snapshot"

    wf_cfg = root / "wf_tiny.yaml"
    wf_cfg.write_text("""\
fs: 24000
n_shift: 300
n_mels: 20
model:
  upsample_factors: [15, 20]
  n_flows: 2
  n_layers: 2
  n_group: 4
  channels: 8
  n_mels: 20
clip_frames: 12
optimizer:
  optim: adam
  learning_rate: 0.0002
batch_size: 2
max_iteration: 3
valid_interval: 2
save_interval: 2
num_snapshots: 1
seed: 1
""")
    wf_exp = root / "wf_exp"
    pwg_dump = pwg_prepared["dump"]
    _run(RECIPES / "waveflow" / "train.py",
         "--config", wf_cfg,
         "--train-metadata", pwg_dump / "metadata_train.jsonl",
         "--dev-metadata", pwg_dump / "metadata_dev.jsonl",
         "--output-dir", wf_exp, "--device", "cpu")
    wf_snap = sorted((wf_exp / "checkpoints").glob("*.npz"))
    assert wf_snap, "no waveflow snapshot"

    out_dir = root / "t2_wavs"
    _run(RECIPES / "tacotron2" / "synthesize.py",
         "--config", t2_cfg, "--checkpoint", t2_snap[-1],
         "--stat", dump / "speech_stats.npy",
         "--test-metadata", norm_dev / "metadata.jsonl",
         "--phones-dict", dump / "phone_id_map.txt",
         "--waveflow-config", wf_cfg,
         "--waveflow-checkpoint", wf_snap[-1],
         "--output-dir", out_dir,
         "--max-decoder-steps", 16, "--device", "cpu")
    assert list(out_dir.glob("*.wav")), "no tacotron2+waveflow wav"


def test_chain_transformer_tts(corpus, fs2_prepared):
    """TransformerTTS train -> AR synthesize (mel .npy, no vocoder)."""
    root = corpus
    dump = fs2_prepared["dump"]
    norm_train = fs2_prepared["norm_train"]
    norm_dev = fs2_prepared["norm_dev"]

    cfg = root / "ttts_tiny.yaml"
    cfg.write_text("""\
fs: 24000
n_mels: 20
model:
  adim: 16
  aheads: 2
  elayers: 1
  eunits: 32
  dlayers: 1
  dunits: 32
  eprenet_conv_layers: 0
  dprenet_units: 8
  postnet_layers: 2
  postnet_chans: 8
  postnet_filts: 3
  reduction_factor: 1
updater:
  loss_type: L1
  use_guided_attn_loss: true
  guided_attn_sigma: 0.4
  guided_attn_lambda: 10.0
  num_layers_applied_guided_attn: 1
  num_heads_applied_guided_attn: 2
  bce_pos_weight: 5.0
optimizer:
  optim: adam
  learning_rate: 0.001
batch_size: 2
max_epoch: 1
num_snapshots: 1
seed: 1
""")
    exp = root / "ttts_exp"
    _run(RECIPES / "transformer_tts" / "train.py",
         "--config", cfg,
         "--train-metadata", norm_train / "metadata.jsonl",
         "--dev-metadata", norm_dev / "metadata.jsonl",
         "--output-dir", exp,
         "--phones-dict", dump / "phone_id_map.txt", "--device", "cpu")
    snap = sorted((exp / "checkpoints").glob("*.npz"))
    assert snap, "no transformer_tts snapshot"

    out_dir = root / "ttts_out"
    _run(RECIPES / "transformer_tts" / "synthesize.py",
         "--config", cfg, "--checkpoint", snap[-1],
         "--stat", dump / "speech_stats.npy",
         "--test-metadata", norm_dev / "metadata.jsonl",
         "--phones-dict", dump / "phone_id_map.txt",
         "--output-dir", out_dir,
         "--max-decoder-steps", 12, "--device", "cpu")
    assert (list(out_dir.glob("*.npy")) or list(out_dir.glob("*.wav"))), \
        "transformer_tts synthesize produced nothing"


def test_chain_fastspeech2_griffin_lim(corpus, fs2_prepared, fs2_trained):
    """Vocoder-free e2e: no --pwg-checkpoint -> mel pinv + Griffin-Lim
    wav (reference exposes istft + inv_mel_filter; here the full loop)."""
    root = corpus
    fs2_snap = sorted((fs2_trained / "checkpoints").glob("*.npz"))[-1]
    text_file = root / "sentences_gl.txt"
    text_file.write_text("demo002 你好。\n")
    outdir = root / "wavs_gl"
    _run(RECIPES / "fastspeech2" / "synthesize_e2e.py",
         "--fastspeech2-config", root / "tiny.yaml",
         "--fastspeech2-checkpoint", fs2_snap,
         "--fastspeech2-stat", root / "dump" / "speech_stats.npy",
         "--phones-dict", root / "dump" / "phone_id_map.txt",
         "--text", text_file, "--output-dir", outdir,
         "--lang", "zh", "--max-text-len", 32, "--max-frames", 128,
         "--device", "cpu")
    wavs = list(outdir.glob("*.wav"))
    assert wavs, "no griffin-lim wav"
    from parakeet_tpu.audio.codec import load_wav
    wav, sr = load_wav(wavs[0])
    assert sr == 24000 and np.isfinite(wav).all() and len(wav) > 0

"""Convergence chain test for the custom-VJP fused PWG training stack.

The fused Pallas stack (`--stack-impl pallas` /
``generator_params.stack_impl: pallas``) is the recommended PWGAN
training path on TPU (+70-104% avg_ips, docs/benchmarks.md).  Its
one-step grad parity is pinned by tests/test_pwg_stack_train.py; this
file pins what one-step parity cannot: that a *multi-iteration GAN
training run* through the custom VJP converges along the same loss
trajectory as the fp32 XLA path — bf16 forward + exact-transpose
backward must not drift the optimization.

Protocol (reference analog: the shell chain tests train a lite config
for a fixed budget and check the artifacts, reference
tests/chain/speedyspeech_params_lite_single_gpu.txt:16-24):

- data: Klatt-style formant utterances (audio/synthetic.py) — real
  speech acoustics (voiced harmonics, fricative noise, silences), not
  white noise, so the multi-resolution STFT loss has real structure to
  fit;
- two runs from identical init/params/batches/rng: stack_impl='xla'
  (fp32, jax.checkpoint remat — the default path) vs 'pallas' (fused
  custom VJP, interpret mode on CPU; the same kernels compile natively
  on TPU);
- the discriminator switches on mid-run, exercising the warmup-gated
  two-optimizer step through the custom VJP;
- assert both runs learn (trailing loss << initial loss) and their
  trailing-window mean losses agree within a bf16-scale band;
- a second leg repeats the comparison with ``dtype=bfloat16`` on both
  nets (the mixed-precision knob measured at +40% over the fp32 pallas
  step, docs/benchmarks.md) against the same fp32 XLA baseline.

A separate CLI leg proves the user-reachable spelling
(``--opts generator_params.stack_impl pallas``) trains end-to-end
through the real recipe entrypoint.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

REPO = Path(__file__).resolve().parent.parent
RECIPES = REPO / "recipes"

ITERS = 80
DISC_START = 40          # discriminator switches on mid-run
BATCH_MAX_STEPS = 1200   # 4 frames of hop 300
GEN_KW = dict(layers=6, stacks=3, residual_channels=32, gate_channels=64,
              skip_channels=32, aux_channels=20, aux_context_window=2,
              upsample_scales=(4, 5, 3, 5), dropout=0.0)


@pytest.fixture(scope="module")
def small_blocks():
    """Shrink kernel grid blocks so interpret mode stays fast at the
    test's T=1200 (same values as tests/test_pwg_stack_train.py)."""
    from parakeet_tpu.ops.pallas import pwg_stack, pwg_stack_train
    saved = (pwg_stack._BLOCK, pwg_stack._HALO, pwg_stack._SLACK,
             pwg_stack_train._BWD_BLOCK)
    pwg_stack._BLOCK, pwg_stack._HALO, pwg_stack._SLACK = 256, 64, 32
    pwg_stack_train._BWD_BLOCK = 128
    yield
    (pwg_stack._BLOCK, pwg_stack._HALO, pwg_stack._SLACK,
     pwg_stack_train._BWD_BLOCK) = saved


@pytest.fixture(scope="module")
def klatt_batches():
    """Fixed batches of (wav window, aligned mel window) from two Klatt
    utterances, mel z-scored — the shape of data the recipe's
    VocoderClip + normalizer produce."""
    from parakeet_tpu.audio.features import LogMelFBank
    from parakeet_tpu.audio.synthetic import formant_utterance

    hop, n_mels, acw = 300, 20, GEN_KW["aux_context_window"]
    frames_per_clip = BATCH_MAX_STEPS // hop
    mel_fn = LogMelFBank(sr=24000, n_fft=512, hop_length=hop,
                         win_length=512, n_mels=n_mels)
    wavs, mels = [], []
    for seed in (0, 1):
        utt = formant_utterance(seed=seed, hop_length=hop)
        wav = utt["wav"]
        mel = mel_fn(wav)[: len(wav) // hop]
        wavs.append(wav)
        mels.append(mel)
    allm = np.concatenate(mels)
    mu, sd = allm.mean(0), allm.std(0) + 1e-8

    rng = np.random.default_rng(42)
    batches = []
    for _ in range(ITERS):
        bw, bm = [], []
        for u in range(2):
            n_frames = len(mels[u])
            s = int(rng.integers(acw, n_frames - frames_per_clip - acw))
            bw.append(wavs[u][s * hop:(s + frames_per_clip) * hop])
            bm.append((mels[u][s - acw:s + frames_per_clip + acw] - mu)
                      / sd)
        batches.append({"wav": np.stack(bw).astype(np.float32),
                        "mel": np.stack(bm).astype(np.float32)})
    return batches


def _train(stack_impl, batches, dtype=None):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import (PWGDiscriminator, PWGGenerator,
                                     init_pwg_train_state,
                                     make_pwg_train_step)
    from parakeet_tpu.training.optimizer import build_optimizer

    dt_kw = {} if dtype is None else {"dtype": dtype}
    gen = PWGGenerator(stack_impl=stack_impl, **dt_kw, **GEN_KW)
    disc = PWGDiscriminator(layers=3, conv_channels=16, **dt_kw)
    noise0 = jnp.zeros((*batches[0]["wav"].shape, 1))
    gv = gen.init(jax.random.PRNGKey(0), noise0,
                  jnp.asarray(batches[0]["mel"]))["params"]
    dv = disc.init(jax.random.PRNGKey(1),
                   jnp.asarray(batches[0]["wav"])[..., None])["params"]
    gen_tx = build_optimizer("adam", 2e-3)
    disc_tx = build_optimizer("adam", 1e-3)
    state = init_pwg_train_state(gv, dv, gen_tx, disc_tx,
                                 jax.random.PRNGKey(2))
    step = make_pwg_train_step(
        gen, disc, gen_tx, disc_tx, lambda_adv=4.0,
        discriminator_train_start_steps=DISC_START,
        fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,))
    stft_curve, disc_curve = [], []
    for batch in batches:
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()})
        stft_curve.append(float(metrics["spectral_convergence_loss"])
                          + float(metrics["log_stft_magnitude_loss"]))
        disc_curve.append(float(metrics["discriminator_loss"]))
    return np.asarray(stft_curve), np.asarray(disc_curve)


def _ema(curve, beta=0.85):
    out, m = [], curve[0]
    for v in curve:
        m = beta * m + (1 - beta) * v
        out.append(m)
    return np.asarray(out)


@pytest.fixture(scope="module")
def xla_curves(small_blocks, klatt_batches):
    """The fp32 XLA baseline trajectory, shared by both variant legs."""
    return _train("xla", klatt_batches)


def _assert_tracks_baseline(curves_x, curves_v, *, band_pre, band_post,
                            band_disc):
    stft_x, disc_x = curves_x
    stft_v, disc_v = curves_v
    for name, c in (("baseline stft", stft_x), ("variant stft", stft_v),
                    ("baseline disc", disc_x), ("variant disc", disc_v)):
        assert np.isfinite(c).all(), f"{name} loss not finite: {c}"

    # both runs learn: EMA-smoothed trailing STFT loss well below the
    # start (per-iteration loss is noisy — random crop windows)
    ema_x, ema_v = _ema(stft_x), _ema(stft_v)
    assert ema_x[-1] < 0.85 * ema_x[4], (ema_x[4], ema_x[-1])
    assert ema_v[-1] < 0.85 * ema_v[4], (ema_v[4], ema_v[-1])

    # phase 1 (pure multi-res STFT regression, deterministic): the
    # trajectories must track tightly — this is where reduced-precision
    # drift would compound if a gradient path were wrong
    pre = DISC_START - 1
    rel_pre = abs(ema_v[pre] - ema_x[pre]) / ema_x[pre]
    assert rel_pre < band_pre, (ema_x[pre], ema_v[pre], rel_pre)

    # phase 2 (adversarial): GAN dynamics on 2 tiny utterances are
    # chaotic, so bound outcome quality instead of pointwise agreement:
    # neither path may end far above the other, and neither may be
    # degraded by the GAN phase relative to its own pre-disc loss
    rel_post = abs(ema_v[-1] - ema_x[-1]) / min(ema_x[-1], ema_v[-1])
    assert rel_post < band_post, (ema_x[-1], ema_v[-1], rel_post)
    assert ema_x[-1] < 1.05 * ema_x[pre], (ema_x[pre], ema_x[-1])
    assert ema_v[-1] < 1.05 * ema_v[pre], (ema_v[pre], ema_v[-1])

    # warmup gating fired identically: disc loss exactly 0 before
    # DISC_START, nonzero after, on both paths
    assert (disc_x[:DISC_START] == 0).all()
    assert (disc_v[:DISC_START] == 0).all()
    assert (disc_x[DISC_START:] > 0).all()
    assert (disc_v[DISC_START:] > 0).all()
    post = slice(DISC_START + 5, None)
    assert abs(disc_v[post].mean() - disc_x[post].mean()) \
        / disc_x[post].mean() < band_disc


def test_pallas_train_converges_with_xla(small_blocks, klatt_batches,
                                         xla_curves):
    curves_p = _train("pallas", klatt_batches)
    _assert_tracks_baseline(xla_curves, curves_p,
                            band_pre=0.10, band_post=0.30, band_disc=0.25)


def test_pallas_bf16_train_converges_with_xla(small_blocks, klatt_batches,
                                              xla_curves):
    """Mixed precision on top of the fused stack (`--dtype bfloat16` /
    ``generator_params.dtype: bfloat16``): bf16 discriminator/upsampler/
    first/last convs with fp32 losses and params — the measured +40%
    over the fp32 pallas step (docs/benchmarks.md).  Convergence must
    track the fp32 XLA baseline through the deterministic STFT phase
    (wider band than the fp32 pallas leg: every conv now rounds to
    bf16) and land at an equal-or-better outcome through the
    adversarial phase."""
    import jax.numpy as jnp
    curves_b = _train("pallas", klatt_batches, dtype=jnp.bfloat16)
    _assert_tracks_baseline(xla_curves, curves_b,
                            band_pre=0.15, band_post=0.35, band_disc=0.35)


def test_pallas_train_cli_reachable(tmp_path):
    """`train.py --opts generator_params.stack_impl pallas` — the
    documented user spelling (recipes/pwgan/conf/default.yaml) — trains
    through the custom VJP from the real CLI."""
    import os
    from parakeet_tpu.audio.codec import save_wav
    from parakeet_tpu.audio.synthetic import formant_utterance

    wavs = tmp_path / "wavs"
    wavs.mkdir()
    for i in range(4):
        utt = formant_utterance(seed=i, hop_length=300)
        save_wav(wavs / f"utt{i:03d}.wav", utt["wav"], 24000)

    cfg = tmp_path / "pallas_tiny.yaml"
    cfg.write_text("""\
fs: 24000
n_fft: 512
n_shift: 300
win_length: 512
fmin: 80
fmax: 7600
n_mels: 20
generator_params:
  layers: 6
  stacks: 3
  residual_channels: 32
  gate_channels: 64
  skip_channels: 32
  aux_channels: 20
  aux_context_window: 2
  upsample_scales: [4, 5, 3, 5]
discriminator_params:
  layers: 3
  conv_channels: 16
updater:
  lambda_adv: 4.0
  discriminator_train_start_steps: 1
stft_loss_params:
  fft_sizes: [256]
  hop_sizes: [64]
  win_lengths: [128]
batch_size: 2
batch_max_steps: 1500
generator_optimizer:
  optim: adam
  learning_rate: 0.0001
discriminator_optimizer:
  optim: adam
  learning_rate: 0.00005
train_max_steps: 2
eval_interval_steps: 10
save_interval_steps: 2
num_snapshots: 1
seed: 1
""")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    def run(script, *args):
        cmd = [sys.executable, str(script)] + [str(a) for a in args]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=900, cwd=str(REPO), env=env)
        assert proc.returncode == 0, (
            f"{Path(script).name} failed\nSTDOUT:\n{proc.stdout[-3000:]}"
            f"\nSTDERR:\n{proc.stderr[-3000:]}")

    dump = tmp_path / "dump"
    run(RECIPES / "pwgan" / "preprocess.py", "--rootdir", wavs,
        "--dumpdir", dump, "--config", cfg, "--dev-size", 2)
    stats = dump / "feats_stats.npy"
    run(RECIPES / "pwgan" / "normalize.py",
        "--metadata", dump / "metadata_train.jsonl",
        "--dumpdir", dump / "norm_train", "--stats", stats,
        "--compute-stats")
    run(RECIPES / "pwgan" / "normalize.py",
        "--metadata", dump / "metadata_dev.jsonl",
        "--dumpdir", dump / "norm_dev", "--stats", stats,
        "--skip-wav-copy")

    exp = tmp_path / "exp"
    run(RECIPES / "pwgan" / "train.py", "--config", cfg,
        "--train-metadata", dump / "norm_train" / "metadata.jsonl",
        "--dev-metadata", dump / "norm_dev" / "metadata.jsonl",
        "--output-dir", exp, "--device", "cpu",
        "--opts", "generator_params.stack_impl", "pallas")
    assert sorted((exp / "checkpoints").glob("*.npz")), \
        "no snapshot from the pallas-stack CLI run"

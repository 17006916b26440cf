"""Validation of the YIN pitch fallback against exact ground truth.

The reference extracts pitch with pyworld dio+stonemask
(reference: parakeet/data/get_feats.py:91-143); pyworld is not
installed here, so the self-written YIN in audio/features.py is the
live extractor for every preprocess run.  These tests bound its error
on signals whose F0 is known *exactly* (synthesized), including a
full Klatt-style utterance with formants, fricatives and vibrato —
the acoustics the FastSpeech2 pitch targets are computed from.
"""
import numpy as np

from parakeet_tpu.audio.features import Pitch, average_by_duration
from parakeet_tpu.audio.synthetic import formant_utterance

SR, HOP = 24000, 300


def _core_voiced(voiced, margin=2):
    """Interior of voiced runs: frames straddling a voiced/unvoiced
    boundary see a mixed analysis window and are ambiguous for any
    frame-based extractor (pyworld included)."""
    core = voiced.copy()
    for s in range(1, margin + 1):
        core &= np.roll(voiced, s) & np.roll(voiced, -s)
    return core


def test_yin_pure_tone_sub_hz_accuracy():
    t = np.arange(int(1.0 * SR)) / SR
    for f0 in (110.0, 220.0, 330.5):
        wav = 0.5 * np.sin(2 * np.pi * f0 * t)
        est = Pitch(sr=SR, hop_length=HOP, f0min=80, f0max=400,
                    method="yin")._yin_f0(wav)
        mid = est[5:-5]
        assert (mid > 0).all(), f"tone {f0} marked unvoiced"
        assert np.abs(mid - f0).max() < 1.0, \
            f"tone {f0}: max err {np.abs(mid - f0).max():.3f} Hz"


def test_yin_tracks_vibrato_on_harmonic_complex():
    t = np.arange(int(1.5 * SR)) / SR
    f0_inst = 200.0 * 2 ** (0.05 * np.sin(2 * np.pi * 5.0 * t))
    phase = 2 * np.pi * np.cumsum(f0_inst) / SR
    # harmonic-rich source (like a glottal pulse train)
    wav = sum(np.sin(k * phase) / k for k in range(1, 8))
    wav = (wav / np.abs(wav).max()).astype(np.float64)
    est = Pitch(sr=SR, hop_length=HOP, f0min=80, f0max=400,
                method="yin")._yin_f0(wav)
    centers = np.minimum(np.arange(len(est)) * HOP, len(t) - 1)
    truth = f0_inst[centers]
    mid = slice(5, len(est) - 5)
    rel = np.abs(est[mid] - truth[mid]) / truth[mid]
    assert np.median(rel) < 0.01
    assert (rel > 0.05).mean() < 0.02, "octave/gross errors on vibrato"


def test_yin_on_formant_utterance():
    """Full synthetic utterance: formants, fricatives, silence,
    declination + vibrato + jitter.  Bounds mirror what pyworld
    achieves on clean speech (sub-percent median error)."""
    u = formant_utterance(seed=0)
    est = Pitch(sr=SR, hop_length=HOP, f0min=80, f0max=400,
                method="yin")._yin_f0(u["wav"])
    n = min(len(est), len(u["f0"]))
    est, truth, voiced = est[:n], u["f0"][:n], u["voiced"][:n]
    core = _core_voiced(voiced)

    detected = est[core] > 0
    assert detected.mean() > 0.95, \
        f"voiced recall {detected.mean():.2f}"
    rel = np.abs(est[core][detected] - truth[core][detected]) \
        / truth[core][detected]
    assert np.median(rel) < 0.01, f"median rel err {np.median(rel):.4f}"
    assert (rel > 0.2).mean() < 0.02, \
        f"gross error rate {(rel > 0.2).mean():.3f}"
    # unvoiced frames should rarely be called voiced
    false_voiced = (est[~voiced] > 0).mean()
    assert false_voiced < 0.10, f"false-voiced rate {false_voiced:.2f}"


def test_token_averaged_log_f0_matches_truth():
    """Downstream FastSpeech2 pitch targets: continuous log-f0 averaged
    per phone must track the known per-phone mean."""
    u = formant_utterance(seed=1)
    pitch = Pitch(sr=SR, hop_length=HOP, f0min=80, f0max=400,
                  method="yin")
    durations = u["durations"]
    targets = pitch.get_pitch(u["wav"], use_continuous_f0=True,
                              use_log_f0=True,
                              use_token_averaged_f0=True,
                              duration=durations)
    targets = np.asarray(targets).reshape(-1)
    assert targets.shape == (len(durations),)

    # ground-truth per-phone mean log-f0 over voiced frames
    truth_cont = u["f0"].copy()
    nz = np.flatnonzero(truth_cont > 0)
    truth_cont[:nz[0]] = truth_cont[nz[0]]
    truth_cont[nz[-1]:] = truth_cont[nz[-1]]
    idx = np.arange(len(truth_cont))
    nz2 = np.flatnonzero(truth_cont > 0)
    truth_cont = np.interp(idx, nz2, truth_cont[nz2])
    truth_tok = np.asarray(
        average_by_duration(np.log(truth_cont), durations)).reshape(-1)

    voiced_phones = [i for i, p in enumerate(u["phones"])
                     if p in ("a", "i", "u", "e", "o")]
    err = np.abs(targets[voiced_phones] - truth_tok[voiced_phones])
    # log-f0 units: 0.02 ~= 2% pitch deviation
    assert err.max() < 0.03, f"token log-f0 err {err}"


def test_yin_unvoiced_on_noise():
    rng = np.random.default_rng(3)
    wav = 0.3 * rng.standard_normal(SR)
    est = Pitch(sr=SR, hop_length=HOP, f0min=80, f0max=400,
                method="yin")._yin_f0(wav)
    assert (est > 0).mean() < 0.15, "white noise mostly called voiced"

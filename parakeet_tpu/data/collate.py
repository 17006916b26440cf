"""Per-model collate functions.

Numpy equivalents of the reference's collators (reference:
parakeet/datasets/am_batch_fn.py:20-174, vocoder_batch_fn.py:19-118) that
return dicts of *numpy* arrays — device placement happens once, inside the
jitted step, so the loader thread never touches the accelerator.  All
variable-length fields are bucket-padded (see ``parakeet_tpu.data.batch``)
to keep jit shape caches small.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .batch import batch_sequences, bucket_length

__all__ = [
    "fastspeech2_batch_fn", "speedyspeech_batch_fn",
    "transformer_tts_batch_fn", "tacotron2_batch_fn", "VocoderClip",
]


def _lens(items, key) -> np.ndarray:
    return np.array([np.asarray(x[key]).shape[0] for x in items],
                    dtype=np.int64)


def _require_nonempty(examples) -> None:
    if not examples:
        raise ValueError("collate called with an empty example list")


def fastspeech2_batch_fn(examples, spk: bool = False,
                         text_bucket: int = 16, frame_bucket: int = 64):
    """FastSpeech2 training batch (single or multi speaker).

    fields: text, speech (T, odim), durations, pitch (L, 1), energy (L, 1)
    [, spk_id]; adds text_lengths / speech_lengths.
    """
    _require_nonempty(examples)
    text_len = bucket_length(
        max(len(np.asarray(x["text"])) for x in examples), text_bucket)
    frame_len = bucket_length(
        max(np.asarray(x["speech"]).shape[0] for x in examples), frame_bucket)
    batch = {
        "text": batch_sequences(
            [np.asarray(x["text"], dtype=np.int64) for x in examples],
            length=text_len),
        "text_lengths": _lens(examples, "text"),
        "speech": batch_sequences(
            [np.asarray(x["speech"], dtype=np.float32) for x in examples],
            length=frame_len),
        "speech_lengths": _lens(examples, "speech"),
        "durations": batch_sequences(
            [np.asarray(x["durations"], dtype=np.int64) for x in examples],
            length=text_len),
        "pitch": batch_sequences(
            [np.asarray(x["pitch"], dtype=np.float32) for x in examples],
            length=text_len),
        "energy": batch_sequences(
            [np.asarray(x["energy"], dtype=np.float32) for x in examples],
            length=text_len),
    }
    if spk:
        batch["spk_id"] = np.array(
            [int(x["spk_id"]) for x in examples], dtype=np.int64)
    if "spk_emb" in examples[0]:
        batch["spk_emb"] = np.stack(
            [np.asarray(x["spk_emb"], dtype=np.float32) for x in examples])
    return batch


def speedyspeech_batch_fn(examples, text_bucket: int = 16,
                          frame_bucket: int = 64):
    """SpeedySpeech batch: phones, tones, durations, feats (+ lengths)."""
    _require_nonempty(examples)
    text_len = bucket_length(
        max(len(np.asarray(x["phones"])) for x in examples), text_bucket)
    frame_len = bucket_length(
        max(np.asarray(x["feats"]).shape[0] for x in examples), frame_bucket)
    return {
        "phones": batch_sequences(
            [np.asarray(x["phones"], dtype=np.int64) for x in examples],
            length=text_len),
        "tones": batch_sequences(
            [np.asarray(x["tones"], dtype=np.int64) for x in examples],
            length=text_len),
        "num_phones": _lens(examples, "phones"),
        "num_frames": _lens(examples, "feats"),
        "feats": batch_sequences(
            [np.asarray(x["feats"], dtype=np.float32) for x in examples],
            length=frame_len),
        "durations": batch_sequences(
            [np.asarray(x["durations"], dtype=np.int64) for x in examples],
            length=text_len),
    }


def transformer_tts_batch_fn(examples, text_bucket: int = 16,
                             frame_bucket: int = 64):
    """TransformerTTS batch: text, speech (+ lengths)."""
    _require_nonempty(examples)
    text_len = bucket_length(
        max(len(np.asarray(x["text"])) for x in examples), text_bucket)
    frame_len = bucket_length(
        max(np.asarray(x["speech"]).shape[0] for x in examples), frame_bucket)
    return {
        "text": batch_sequences(
            [np.asarray(x["text"], dtype=np.int64) for x in examples],
            length=text_len),
        "text_lengths": _lens(examples, "text"),
        "speech": batch_sequences(
            [np.asarray(x["speech"], dtype=np.float32) for x in examples],
            length=frame_len),
        "speech_lengths": _lens(examples, "speech"),
    }


# Tacotron2 uses the same (text, speech) surface.
tacotron2_batch_fn = transformer_tts_batch_fn


class VocoderClip:
    """Random aligned (wav, mel) window cropper for GAN-vocoder training.

    Same contract as the reference's Clip (reference:
    parakeet/datasets/vocoder_batch_fn.py:19-118): filters out clips whose
    mel is shorter than the window, picks a random start frame honoring the
    generator's ``aux_context_window``, and returns fixed-size arrays —
    ideal for TPU since every batch has an identical static shape.

    Returns dict with ``wav`` (B, T) and ``mel`` (B, T', C) where
    T = batch_max_steps and T' = T // hop_size + 2 * aux_context_window.
    """

    def __init__(self, batch_max_steps: int = 20480, hop_size: int = 256,
                 aux_context_window: int = 0,
                 rng: Optional[np.random.Generator] = None):
        batch_max_steps -= batch_max_steps % hop_size
        self.batch_max_steps = batch_max_steps
        self.batch_max_frames = batch_max_steps // hop_size
        self.hop_size = hop_size
        self.aux_context_window = aux_context_window
        self.mel_threshold = self.batch_max_frames + 2 * aux_context_window
        self.rng = rng or np.random.default_rng()

    def _align(self, wav: np.ndarray, mel: np.ndarray):
        need = mel.shape[0] * self.hop_size
        if len(wav) < need:
            wav = np.pad(wav, (0, need - len(wav)), mode="edge")
        return wav[:need], mel

    def __call__(self, examples):
        pairs = [
            self._align(np.asarray(x["wave"], dtype=np.float32),
                        np.asarray(x["feats"], dtype=np.float32))
            for x in examples
            if np.asarray(x["feats"]).shape[0] > self.mel_threshold
        ]
        if not pairs:
            raise ValueError(
                f"no clip longer than {self.mel_threshold} mel frames")
        wavs, mels = [], []
        for wav, mel in pairs:
            hi = mel.shape[0] - self.batch_max_frames - self.aux_context_window
            start = int(self.rng.integers(self.aux_context_window, hi + 1))
            wavs.append(wav[start * self.hop_size:
                            start * self.hop_size + self.batch_max_steps])
            mels.append(mel[start - self.aux_context_window:
                            start + self.batch_max_frames
                            + self.aux_context_window])
        return {"wav": np.stack(wavs), "mel": np.stack(mels)}

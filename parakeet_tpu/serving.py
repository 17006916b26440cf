"""Batched TTS serving engine: bucketed static shapes, compile-once.

Production serving batches concurrent requests; on TPU the constraint is
that every distinct input shape costs one XLA compile.  The engine
therefore quantizes requests onto a small grid of (text bucket, batch
bucket) programs — each compiled once, cached forever — pads requests
into them, and trims the outputs back per utterance:

- text buckets bound the phone-id axis (smallest bucket >= len(ids));
  each text bucket implies a static decoder frame capacity
  (``frames_per_token`` x bucket) and a static waveform length.
- batch buckets bound the batch axis; a group of same-text-bucket
  requests is cut into chunks of the largest batch bucket and each
  chunk padded up to the smallest bucket that fits (pad rows are
  1-token dummy utterances — masked out by the models, trimmed from
  the output; a zero-length row would have fully-masked attention
  and emit NaN).

Requests longer than the largest text bucket are split into segments
at pause tokens (``split_ids``, falling back to a hard cut) and the
per-segment waveforms stitched back in order, so no text is ever
dropped (``overflow="split"``, the default).

The whole batch (FastSpeech2 inference -> denorm -> vocoder z-norm ->
Parallel WaveGAN) runs as ONE jitted program per grid point with a
single host fetch, which is what the serving-throughput numbers in
docs/tpu_performance.md are measured on (~670 audio-s/s/chip at bs8-16
bf16).  Per-request noise rows are derived from each request's seed
alone (not its batch slot), so a request's waveform is identical
however it gets batched (pinned by tests/test_serving.py).

The reference has no serving layer (its e2e scripts synthesize one
utterance per Python-loop step, examples/fastspeech2/baker/
synthesize_e2e.py:32-90); this is the TPU-first equivalent of what a
deployment would build around it.  CLI: ``tools/serve.py``.
"""
import dataclasses
from bisect import bisect_left
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Request:
    """One synthesis request: already-frontended phone ids + a seed."""
    ids: Sequence[int]
    utt_id: str = ""
    seed: int = 0
    spk_id: int = 0


@dataclasses.dataclass
class Result:
    """Per-request output: trimmed wav (or mel when engine has no
    vocoder), in the same order as the requests."""
    utt_id: str
    wav: Optional[np.ndarray]  # (n_samples,) when the engine vocodes
    mel: Optional[np.ndarray]  # (n_frames, odim) when it does not
    n_frames: int


class TTSEngine:
    """Compile-once batched synthesis over a (text, batch) bucket grid.

    Args:
        am: FastSpeech2 module (any config; must expose ``.inference``).
        am_vars: its checkpoint variables.
        voc / voc_params: optional PWGGenerator + params; omitted, the
            engine returns mels (callers Griffin-Lim or vocode later).
        am_norm / voc_norm: optional ZScore pair — AM output denorm and
            vocoder-domain renorm, applied in-graph like the recipes.
        text_buckets: ascending phone-capacity grid; requests longer
            than the largest bucket follow the ``overflow`` policy.
        batch_buckets: ascending batch-capacity grid; the largest is
            the scheduling chunk size.
        frames_per_token: static decoder capacity per text slot
            (bucket * frames_per_token frames — generous for zh/en at
            reference hop sizes; predicted frames are clipped to it).
        multi_speaker: pass each request's spk_id into the AM.
        overflow: what to do with requests longer than the largest
            text bucket: "split" (default) segments the ids at the
            latest ``split_ids`` pause token that fits (hard cut if
            none) and stitches the per-segment wavs; "truncate" clips
            to the largest bucket; "error" raises.
        split_ids: phone ids that mark natural pause points (silence /
            punctuation tokens) — preferred segment boundaries when
            splitting; the segment ENDS with the pause token.
    """

    def __init__(self, am, am_vars, *, voc=None, voc_params=None,
                 am_norm=None, voc_norm=None,
                 text_buckets: Sequence[int] = (32, 64, 128),
                 batch_buckets: Sequence[int] = (1, 2, 4, 8),
                 frames_per_token: int = 8, min_duration: int = 1,
                 multi_speaker: bool = False, overflow: str = "split",
                 split_ids: Sequence[int] = ()):
        if list(text_buckets) != sorted(set(text_buckets)):
            raise ValueError(f"text_buckets must be ascending/unique: "
                             f"{text_buckets}")
        if list(batch_buckets) != sorted(set(batch_buckets)):
            raise ValueError(f"batch_buckets must be ascending/unique: "
                             f"{batch_buckets}")
        self.am, self.am_vars = am, am_vars
        self.voc, self.voc_params = voc, voc_params
        self.am_norm, self.voc_norm = am_norm, voc_norm
        self.text_buckets = tuple(text_buckets)
        self.batch_buckets = tuple(batch_buckets)
        self.frames_per_token = frames_per_token
        self.min_duration = min_duration
        self.multi_speaker = multi_speaker
        if overflow not in ("split", "truncate", "error"):
            raise ValueError(f"overflow must be split|truncate|error, "
                             f"got {overflow!r}")
        self.overflow = overflow
        self.split_ids = frozenset(split_ids)
        self.hop = voc.upsample_factor if voc is not None else None
        self._programs: Dict[Tuple[int, int], Callable] = {}

    # ---- bucket arithmetic ------------------------------------------

    def max_frames(self, text_bucket: int) -> int:
        return text_bucket * self.frames_per_token

    def _text_bucket(self, n: int) -> int:
        i = bisect_left(self.text_buckets, n)
        return self.text_buckets[min(i, len(self.text_buckets) - 1)]

    def _batch_bucket(self, n: int) -> int:
        i = bisect_left(self.batch_buckets, n)
        return self.batch_buckets[i]  # chunks never exceed the largest

    @property
    def compiled_programs(self) -> int:
        """Distinct (text bucket, batch bucket) programs built so far."""
        return len(self._programs)

    # ---- the compiled grid ------------------------------------------

    def _program(self, tb: int, bb: int) -> Callable:
        key = (tb, bb)
        if key in self._programs:
            return self._programs[key]
        max_frames = self.max_frames(tb)
        am, voc = self.am, self.voc
        am_norm, voc_norm = self.am_norm, self.voc_norm

        def fn(am_vars, voc_params, text, text_lengths, spk_id, noise):
            out = am.apply(am_vars, text, text_lengths,
                           max_frames=max_frames,
                           min_duration=self.min_duration,
                           spk_id=spk_id, method=type(am).inference)
            mel, frames = out["after_outs"], out["frame_lengths"]
            # In-graph edge extension: decoder output beyond each
            # row's frame_lengths is arbitrary (unmasked) content, and
            # the vocoder's receptive field would bleed it into the
            # last ~RF samples of the trimmed wav.  Clamp the time
            # index so padded frames replicate the row's last real
            # frame — the engine then matches the recipe path, which
            # trims mel to n frames before pwg_inference with edge pad
            # (recipes/fastspeech2/synthesize_e2e.py).  Pinned by
            # tests/test_serving.py::test_engine_matches_trimmed_vocode.
            t = jnp.minimum(jnp.arange(mel.shape[1])[None, :],
                            jnp.maximum(frames, 1)[:, None] - 1)
            mel = mel[jnp.arange(mel.shape[0])[:, None], t]
            if am_norm is not None:
                mel = am_norm.inverse(mel)
            if voc is None:
                return mel, frames
            if voc_norm is not None:
                mel = voc_norm.transform(mel)
            w = voc.aux_context_window
            mel = jnp.pad(mel, ((0, 0), (w, w), (0, 0)), mode="edge")
            wav = voc.apply({"params": voc_params}, noise, mel)[..., 0]
            return wav, frames

        self._programs[key] = jax.jit(fn)
        return self._programs[key]

    # ---- request assembly -------------------------------------------

    def _noise_row(self, seed: int, tb: int) -> jnp.ndarray:
        """Noise for one request, a function of its seed and text bucket
        ONLY — batching a request differently cannot change its wav."""
        n = self.max_frames(tb) * self.hop
        return jax.random.normal(jax.random.PRNGKey(seed), (n, 1))

    def _run_chunk(self, chunk: List[Tuple[int, Request]], tb: int,
                   out: List[Optional[Result]]) -> None:
        bb = self._batch_bucket(len(chunk))
        text = np.zeros((bb, tb), np.int64)
        lengths = np.zeros(bb, np.int64)
        spk = np.zeros(bb, np.int32)
        for j, (_, req) in enumerate(chunk):
            ids = list(req.ids)[:tb]
            text[j, :len(ids)] = ids
            lengths[j] = len(ids)
            spk[j] = req.spk_id
        # pad rows get ONE real token, not zero: a zero-length row has
        # fully-masked attention (undefined output) which would surface
        # as NaN in the row we are about to trim away anyway — keep the
        # whole batch finite instead
        text[len(chunk):, 0] = 1
        lengths[len(chunk):] = 1
        noise = None
        if self.voc is not None:
            rows = [self._noise_row(req.seed, tb) for _, req in chunk]
            rows += [jnp.zeros_like(rows[0])] * (bb - len(chunk))
            noise = jnp.stack(rows)
        run = self._program(tb, bb)
        audio, frames = run(self.am_vars, self.voc_params,
                            jnp.asarray(text), jnp.asarray(lengths),
                            jnp.asarray(spk) if self.multi_speaker
                            else None, noise)
        audio, frames = np.asarray(audio), np.asarray(frames)
        for j, (i, req) in enumerate(chunk):
            n = int(frames[j])
            if self.voc is not None:
                out[i] = Result(req.utt_id, audio[j, :n * self.hop],
                                None, n)
            else:
                out[i] = Result(req.utt_id, None, audio[j, :n], n)

    def _segments(self, req: Request, index: int) -> List[List[int]]:
        """Cut an over-bucket request into synthesizable segments per
        the overflow policy; in-bucket requests pass through whole."""
        cap = self.text_buckets[-1]
        ids = list(req.ids)
        if len(ids) <= cap:
            return [ids]
        if self.overflow == "error":
            raise ValueError(
                f"request {index} ({req.utt_id!r}): {len(ids)} phones "
                f"exceeds the largest text bucket ({cap}) and "
                f"overflow='error'")
        if self.overflow == "truncate":
            return [ids[:cap]]
        segs: List[List[int]] = []
        pos = 0
        while pos < len(ids):
            if len(ids) - pos <= cap:
                segs.append(ids[pos:])
                break
            cut = pos + cap
            # prefer ending the segment on the last pause token that
            # fits, so the cut lands on a natural silence
            for j in range(pos + cap - 1, pos, -1):
                if ids[j] in self.split_ids:
                    cut = j + 1
                    break
            segs.append(ids[pos:cut])
            pos = cut
        return segs

    def synthesize(self, requests: Sequence[Request]) -> List[Result]:
        """Batch-synthesize; results come back in request order.
        Over-bucket requests are split per ``overflow`` and their
        segment wavs (or mels) concatenated back into one Result."""
        subs: List[Request] = []
        owner: List[int] = []
        for i, req in enumerate(requests):
            if not len(req.ids):
                raise ValueError(f"request {i} ({req.utt_id!r}): empty "
                                 f"phone sequence")
            for k, seg in enumerate(self._segments(req, i)):
                # segment seed is a function of the request seed and
                # segment index ONLY, preserving batch invariance
                subs.append(dataclasses.replace(
                    req, ids=seg,
                    seed=(req.seed + k * 0x9E3779B1) & 0xFFFFFFFF))
                owner.append(i)
        by_bucket: Dict[int, List[Tuple[int, Request]]] = {}
        for j, req in enumerate(subs):
            by_bucket.setdefault(self._text_bucket(len(req.ids)),
                                 []).append((j, req))
        sub_out: List[Optional[Result]] = [None] * len(subs)
        cap = self.batch_buckets[-1]
        for tb, group in sorted(by_bucket.items()):
            for s in range(0, len(group), cap):
                self._run_chunk(group[s:s + cap], tb, sub_out)
        out: List[Optional[Result]] = [None] * len(requests)
        for i in range(len(requests)):
            parts = [sub_out[j] for j in range(len(subs))
                     if owner[j] == i]
            if len(parts) == 1:
                out[i] = parts[0]
            else:
                cat = (lambda xs: None if xs[0] is None
                       else np.concatenate(xs, axis=0))
                out[i] = Result(parts[0].utt_id,
                                cat([p.wav for p in parts]),
                                cat([p.mel for p in parts]),
                                sum(p.n_frames for p in parts))
        return out  # type: ignore[return-value]

    def warmup(self, batch_buckets: Optional[Sequence[int]] = None,
               text_buckets: Optional[Sequence[int]] = None) -> int:
        """Pre-compile (and touch) every (text, batch) grid point
        before serving traffic — tail chunks route to SMALLER batch
        buckets, so the full grid is the default; returns how many
        programs exist afterwards."""
        for tb in (text_buckets or self.text_buckets):
            for bb in (batch_buckets or self.batch_buckets):
                # ids of exactly tb tokens land in bucket tb
                reqs = [Request(ids=[1] * tb, seed=k) for k in range(bb)]
                self.synthesize(reqs)
        return self.compiled_programs

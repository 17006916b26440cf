"""GE2E LSTM speaker encoder (voice cloning), TPU-native.

Behavioral equivalent of the reference implementation (reference:
parakeet/models/lstm_speaker_encoder.py:24-147): 3-layer LSTM over mel
frames -> linear -> ReLU -> L2-normalized embedding; GE2E softmax loss over
an (N speakers x M utterances) similarity matrix against inclusive /
leave-one-out centroids with a learnable scale (w, b).

TPU-first notes:
- the similarity matrix is pure batched einsum (no scatter loops — the
  reference assembles it with index_select/scatter, :66-90).
- EER is a host-side numpy routine (no sklearn dependency).
- the reference's ``do_gradient_ops`` (scale w,b grads x0.01 and clip,
  :117) maps to :func:`scale_wb_gradients` applied to the grad pytree
  inside the train step.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LSTMSpeakerEncoder", "ge2e_loss", "similarity_matrix",
           "scale_wb_gradients", "compute_eer"]


class LSTMSpeakerEncoder(nn.Module):
    n_mels: int = 40
    num_layers: int = 3
    hidden_size: int = 256
    output_size: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.lstms = [nn.RNN(nn.OptimizedLSTMCell(self.hidden_size,
                                                  dtype=self.dtype),
                             name=f"lstm_{i}")
                      for i in range(self.num_layers)]
        self.linear = nn.Dense(self.output_size, dtype=self.dtype)
        # learnable similarity scale (w, b), init (10, -5) as in GE2E
        self.similarity_weight = self.param(
            "similarity_weight", lambda k: jnp.asarray(10.0, self.dtype))
        self.similarity_bias = self.param(
            "similarity_bias", lambda k: jnp.asarray(-5.0, self.dtype))

    def __call__(self, utterances):
        """utterances (B, T, n_mels) -> L2-normalized embeds (B, d)."""
        h = utterances
        for rnn in self.lstms:
            h = rnn(h)
        last = h[:, -1, :]
        e = nn.relu(self.linear(last))
        norm = jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        return e / norm

    def scale(self):
        return self.similarity_weight, self.similarity_bias

    def embed_sequences(self, utterances, n_speakers: int):
        """(N*M, T, n_mels) -> ((N, M, d) embeds, (w, b))."""
        embeds = self(utterances)
        n_total, d = embeds.shape
        m = n_total // n_speakers
        return embeds.reshape(n_speakers, m, d), self.scale()


def similarity_matrix(embeds: jnp.ndarray) -> jnp.ndarray:
    """embeds (N, M, d) -> cosine similarities (N, M, N).

    sim[i, j, k] = cos(e_ij, centroid_k), where centroid_i (the own-speaker
    column) is the leave-one-out centroid excluding e_ij (reference
    :66-90).
    """
    n, m, d = embeds.shape
    centroids = jnp.mean(embeds, axis=1)                    # (N, d)
    c_norm = centroids / jnp.maximum(
        jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("ijd,kd->ijk", embeds, c_norm)         # (N, M, N)
    # leave-one-out centroid for the diagonal (own speaker)
    excl = (jnp.sum(embeds, axis=1, keepdims=True) - embeds) / (m - 1)
    excl = excl / jnp.maximum(
        jnp.linalg.norm(excl, axis=-1, keepdims=True), 1e-12)
    own = jnp.einsum("ijd,ijd->ij", embeds, excl)           # (N, M)
    eye = jnp.eye(n, dtype=embeds.dtype)                    # (N, N)
    sim = sim * (1 - eye)[:, None, :] + own[..., None] * eye[:, None, :]
    return sim


def ge2e_loss(embeds: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray):
    """GE2E softmax loss (+ metrics).  embeds (N, M, d)."""
    n, m, _ = embeds.shape
    sim = similarity_matrix(embeds) * jax.nn.relu(w) + b    # w kept positive
    logits = sim.reshape(n * m, n)
    labels = jnp.repeat(jnp.arange(n), m)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(logp[jnp.arange(n * m), labels])
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(
        jnp.float32))
    return loss, {"loss": loss, "accuracy": acc, "sim": sim}


def scale_wb_gradients(grads, factor: float = 0.01):
    """Scale the similarity (w, b) grads by ``factor`` (reference
    do_gradient_ops, :117)."""
    def scale(path, g):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("similarity_weight", "similarity_bias"):
            return g * factor
        return g
    return jax.tree_util.tree_map_with_path(scale, grads)


def compute_eer(sim: np.ndarray, n_speakers: int) -> float:
    """Equal error rate from an (N, M, N) similarity matrix, numpy host
    side (reference uses sklearn roc_curve + brentq, :120-135)."""
    sim = np.asarray(sim)
    n, m, _ = sim.shape
    labels = np.zeros((n, m, n), dtype=bool)
    labels[np.arange(n), :, np.arange(n)] = True
    scores = sim.reshape(-1)
    y = labels.reshape(-1)
    order = np.argsort(-scores)
    y_sorted = y[order]
    tp = np.cumsum(y_sorted)
    fp = np.cumsum(~y_sorted)
    fn = y.sum() - tp
    tn = (~y).sum() - fp
    fpr = fp / np.maximum(fp + tn, 1)
    fnr = fn / np.maximum(fn + tp, 1)
    idx = np.argmin(np.abs(fpr - fnr))
    return float((fpr[idx] + fnr[idx]) / 2)


def partial_slices(n_frames: int, partial_frames: int, hop: int):
    """Start indices of partial windows covering an utterance (with a
    tail window so the final frames are embedded too; reference
    speaker_encoder.embed_utterance partial coverage)."""
    if n_frames <= partial_frames:
        return [0]
    starts = list(range(0, n_frames - partial_frames + 1, hop))
    if starts[-1] + partial_frames < n_frames:
        starts.append(n_frames - partial_frames)
    return starts


def embed_utterance(model, params, mel, *, partial_frames: int = 160,
                    hop: int = 80, embed_fn=None):
    """Utterance mel (T, n_mels) -> L2-normalized (d,) embedding.

    Splits into overlapping partials (padded if shorter), embeds each,
    and returns the normalized mean — the single source of truth shared
    by the GE2E exporter and the voice-cloning synthesizer.  Pass a
    jitted ``embed_fn(params, partials)`` to reuse a compile cache.
    """
    import numpy as np

    mel = np.asarray(mel, np.float32)
    if mel.shape[0] < partial_frames:
        mel = np.pad(mel, ((0, partial_frames - mel.shape[0]), (0, 0)))
    starts = partial_slices(mel.shape[0], partial_frames, hop)
    partials = np.stack([mel[s:s + partial_frames] for s in starts])
    if embed_fn is None:
        def embed_fn(p, x):
            return model.apply({"params": p}, x)
    embeds = np.asarray(embed_fn(params, jnp.asarray(partials)))
    mean = embeds.mean(axis=0)
    return mean / max(np.linalg.norm(mean), 1e-12)

"""WaveFlow (flow-based vocoder, mel -> waveform), TPU-native.

Behavioral equivalent of the reference implementation (reference:
parakeet/models/waveflow.py:32-909): audio folded into a 2D (n_group x W)
grid, 8 affine-coupling flows, each a 2D-conv WaveNet that is *causal in
the height (group) dimension*, conditioned on upsampled mel; rows are
permuted (reverse / half-reverse) between flows.

TPU-first design (not a port):
- NHWC layout; the height-causal 2D convs are plain XLA convs with
  asymmetric height padding — one fused conv per layer at training time
  (the whole density evaluation is a single parallel program).
- synthesis inverts each flow with a ``lax.scan`` over the n_group rows
  (reference runs a python row loop with per-layer ring buffers,
  waveflow.py:496-557).  Each step carries an explicit (kh-1)-row input
  buffer per resnet layer — the functional form of those ring buffers —
  so exactly ONE new row flows through the stack per step, and the
  entire 8-flow sampler compiles to one XLA program.
- upsampling uses transposed convs with LeakyReLU(0.4) exactly as the
  reference UpsampleNet (waveflow.py:54-133), with edge artifact trimming
  folded into SAME padding.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import time_shift

__all__ = ["UpsampleNet", "WaveFlow", "ConditionalWaveFlow",
           "waveflow_loss", "fold", "unfold"]


def fold(x: jnp.ndarray, n_group: int) -> jnp.ndarray:
    """(B, T) -> (B, n_group, T // n_group); consecutive samples run down
    the height axis (reference waveflow.py:32-53)."""
    b, t = x.shape
    w = t // n_group
    return x[:, :w * n_group].reshape(b, w, n_group).transpose(0, 2, 1)


def unfold(x: jnp.ndarray) -> jnp.ndarray:
    """(B, n_group, W) -> (B, n_group * W), inverse of :func:`fold`."""
    b, h, w = x.shape
    return x.transpose(0, 2, 1).reshape(b, h * w)


class UpsampleNet(nn.Module):
    """Mel (B, T_mel, C) -> (B, T_mel * prod(factors), C) via stacked
    2D transposed convs + LeakyReLU(0.4) (reference waveflow.py:54-133).

    Computed *polyphase at frame rate*: a stride-s ConvTranspose with a
    (3, 2s) kernel touches, per output phase r, exactly two input frames
    and three freq neighbors, so each stage is 6 shifted multiply-adds
    at input rate followed by a reshape.  Numerically identical to
    flax.linen.ConvTranspose(padding='SAME') (verified to 6e-8); the
    naive single-channel image ConvTranspose lowers to a ~150 ms XLA
    fusion at 22 kHz rates and dominated the whole sampler.
    """
    upsample_factors: Sequence[int] = (16, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        x = mel.astype(self.dtype)                      # (B, N, F)
        for i, s in enumerate(self.upsample_factors):
            kernel = self.param(
                f"deconv_{i}_kernel",
                nn.initializers.lecun_normal(in_axis=-2, out_axis=-1),
                (3, 2 * s, 1, 1))[..., 0, 0]            # (3, 2s)
            bias = self.param(f"deconv_{i}_bias", nn.initializers.zeros,
                              (1,))
            kernel = kernel.astype(self.dtype)
            b, n, f = x.shape
            # conv_transpose(SAME): out[n*s + r] reads input frames
            # n + m_r and n + m_r + 1 with kernel taps j_r, j_r + s.
            # total transposed padding is 3s-2 split SAME-style with the
            # EXTRA element on the low side: pad_lo = ceil((3s-2)/2)
            # (verified to 1e-7 against flax ConvTranspose for even AND
            # odd scales; flooring is only equivalent for even s)
            pad_lo = (3 * s - 1) // 2
            xpad = jnp.pad(x, ((0, 0), (2, 2), (1, 1)))
            phases = []
            for r in range(s):
                j0 = (pad_lo - r) % s
                m0 = (r - pad_lo + j0) // s
                acc = jnp.zeros((b, n, f), self.dtype)
                for t in range(2):
                    for dh in range(3):
                        acc = acc + (xpad[:, 2 + m0 + t:2 + m0 + t + n,
                                          dh:dh + f]
                                     * kernel[dh, j0 + t * s])
                phases.append(acc)
            y = jnp.stack(phases, axis=2)               # (B, N, s, F)
            x = y.reshape(b, n * s, f) + bias[0].astype(self.dtype)
            x = nn.leaky_relu(x, negative_slope=0.4)
        return x


class WaveFlowResidualBlock(nn.Module):
    """Gated 2D-conv layer, causal in height, dilated in width
    (reference waveflow.py:228-296).

    The conv itself is declared VALID; causal height padding and SAME
    width padding are applied explicitly by the callers, so the same
    parameters serve both the full-grid training forward and the
    one-row-per-step ``step`` used by the sampling scan (the TPU analog
    of the reference's per-layer ring buffers, waveflow.py:248-296).
    """
    channels: int
    cond_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    dilation_w: int = 1
    dilation_h: int = 1  # >1 for n_group >= 32 (waveflow.py:420-426)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.conv = nn.Conv(2 * self.channels, self.kernel_size,
                            kernel_dilation=(self.dilation_h,
                                             self.dilation_w),
                            padding="VALID", dtype=self.dtype)
        self.condition_proj = nn.Conv(2 * self.channels, (1, 1),
                                      dtype=self.dtype)
        self.out_proj = nn.Conv(2 * self.channels, (1, 1),
                                dtype=self.dtype)

    def _pad_w(self, x):
        w_pad = (self.kernel_size[1] - 1) * self.dilation_w // 2
        return jnp.pad(x, ((0, 0), (0, 0), (w_pad, w_pad), (0, 0)))

    def _gate_out(self, h, condition, x_res):
        h = h + self.condition_proj(condition)
        gate = jnp.tanh(h[..., :self.channels]) * jax.nn.sigmoid(
            h[..., self.channels:])
        out = self.out_proj(gate)
        res, skip = out[..., :self.channels], out[..., self.channels:]
        return x_res + res, skip

    def __call__(self, x, condition):
        """x (B, h, W, C); condition (B, h, W, C_cond)."""
        rh = (self.kernel_size[0] - 1) * self.dilation_h
        xp = jnp.pad(self._pad_w(x), ((0, 0), (rh, 0), (0, 0), (0, 0)))
        return self._gate_out(self.conv(xp), condition, x)

    @property
    def buffer_rows(self) -> int:
        """Rows of history the sampling scan must carry: the height
        receptive field minus the current row."""
        return (self.kernel_size[0] - 1) * self.dilation_h

    def step(self, rows, cond_gate_row):
        """One sampling-scan step in flat row layout.

        rows (B, W, (buffer_rows+1)*C): this layer's input for the last
        buffer_rows+1 rows, lane-concatenated oldest first (so
        rows[..., -C:] is the current row); with height dilation only
        every dilation_h-th row feeds the conv taps;
        cond_gate_row (B, W, 2C): the PRE-projected conditioning
        for this row (condition_proj is hoisted out of the scan by the
        caller — it only depends on mel).  Returns
        (res_row (B, W, C), skip_row (B, W, C)).

        The single-output-row conv is computed as kw shifted matmuls
        with the kh height taps folded into the contraction dim
        ((W, kh*C) @ (kh*C, 2C)): XLA's conv lowering handles the
        batch-1 / height-kh / long-W shape poorly (same pathology as the
        PWG stack, parallel_wavegan.py conv1d_taps), and the flat layout
        avoids materializing per-step 4-D transposes — the sampler is
        bandwidth-bound on elementwise copies, not matmuls.
        """
        kernel = self.conv.variables["params"]["kernel"]  # (kh,kw,C,2C)
        bias = self.conv.variables["params"]["bias"]
        kh, kw = self.kernel_size
        c2 = kernel.shape[-1]
        if self.dilation_h > 1:
            # keep only the rows the dilated taps read: oldest first,
            # every dilation_h-th row ending at the current row
            c = self.channels
            taps = [rows[..., i * self.dilation_h * c:
                         (i * self.dilation_h + 1) * c]
                    for i in range(kh)]
            rows = jnp.concatenate(taps, axis=-1)
        # (kh, kw, C, 2C) -> (kw, kh*C, 2C)
        # weights cast to the activation dtype (bf16 sampling halves
        # both the matmul passes and the carried-buffer traffic; all
        # accumulation stays fp32)
        kmat = kernel.transpose(1, 0, 2, 3).reshape(
            kw, -1, c2).astype(rows.dtype)
        acc = None
        for dw in range(kw):
            off = (dw - (kw - 1) // 2) * self.dilation_w
            y = jnp.dot(time_shift(rows, off), kmat[dw],
                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        h = (acc + bias + cond_gate_row)                  # fp32
        gate = (jnp.tanh(h[..., :self.channels])
                * jax.nn.sigmoid(h[..., self.channels:])
                ).astype(rows.dtype)
        okern = self.out_proj.variables["params"]["kernel"][0, 0]
        obias = self.out_proj.variables["params"]["bias"]
        out = jnp.dot(gate, okern.astype(rows.dtype),
                      preferred_element_type=jnp.float32) + obias
        x_cur = rows[..., -self.channels:]
        res = out[..., :self.channels].astype(rows.dtype)
        return x_cur + res, out[..., self.channels:]


class Flow(nn.Module):
    """One affine-coupling flow: rows 1..h-1 transformed conditioned on
    rows < i (reference waveflow.py:395-557).  ``dilations_h`` carries
    the per-layer height dilations (all 1 for n_group <= 16; the
    reference's dilations_dict, waveflow.py:420-426)."""
    n_layers: int = 8
    channels: int = 64
    mel_bands: int = 80
    kernel_size: Tuple[int, int] = (3, 3)
    dilations_h: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32
    # dtype of the sampling scan's carried layer activations/buffers
    # (None = self.dtype).  bfloat16 halves the sampler's dominant
    # HBM traffic and matmul passes; the affine inversion and skip/
    # logs accumulation always stay in self.dtype/fp32, but the
    # (logs, b) net then deviates ~1e-3 from the fp32 forward, so the
    # strict inverse(forward(x)) round-trip holds only to ~1e-2.
    sample_act_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.input_proj = nn.Conv(self.channels, (1, 1), dtype=self.dtype)
        dil_h = self.dilations_h or (1,) * self.n_layers
        self.resnet = [
            WaveFlowResidualBlock(self.channels, self.mel_bands,
                                  self.kernel_size, dilation_w=2 ** i,
                                  dilation_h=dil_h[i], dtype=self.dtype)
            for i in range(self.n_layers)]
        # zero-init so each flow starts as the identity transform
        self.output_proj = nn.Conv(
            2, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype)

    def _net(self, x, condition):
        """x (B, h, W) -> (logs, b), each (B, h, W); output row i is a
        function of input rows <= i (height-causal)."""
        h = self.input_proj(x[..., None])
        skips = 0.0
        for block in self.resnet:
            h, skip = block(h, condition)
            skips = skips + skip
        out = self.output_proj(skips)
        return out[..., 0], out[..., 1]

    def __call__(self, x, condition):
        """Density direction: x -> (z, logs_used).  Row 0 passes through;
        row i (i>0) is transformed with (logs, b) computed from x rows
        < i and the condition of row i itself — the reference pairs
        x[:, :, :-1] with condition[:, :, 1:] (waveflow.py:195-197)."""
        logs, b = self._net(x[:, :-1], condition[:, 1:])
        z = jnp.concatenate(
            [x[:, :1], x[:, 1:] * jnp.exp(logs) + b], axis=1)
        return z, logs

    def inverse(self, z, condition):
        """Sampling direction: z -> x, one row per scan step.

        Carries a (kh-1)-row input buffer per resnet layer (the explicit-
        state equivalent of the reference's ring buffers,
        waveflow.py:496-557), so each step computes exactly ONE new row
        through the stack instead of re-running the conv net on the full
        grid (which would be n_group x redundant compute).
        """
        b, h, w = z.shape
        c = self.channels
        adt = self.sample_act_dtype or self.dtype
        x0 = z[:, 0]                                  # row 0 passes through
        bufs = tuple(jnp.zeros((b, w, block.buffer_rows * c), adt)
                     for block in self.resnet)
        carry = (x0, bufs)
        # step i consumes (z row i, condition row i) — the condition of
        # the row being generated (reference waveflow.py:195-197); the
        # per-layer conditioning projections happen inside the step
        # (hoisting them out materializes an (L, h, W, 2C) tensor whose
        # HBM traffic costs more than the in-loop (W,Cc)@(Cc,2C) dots)
        xs = (z[:, 1:].transpose(1, 0, 2),
              condition[:, 1:].transpose(1, 0, 2, 3))  # (h-1, B, W, Cc)

        scan = nn.scan(Flow._inverse_step, variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=0, out_axes=1)
        _, rows = scan(self, carry, xs)               # (B, h-1, W)
        return jnp.concatenate([z[:, :1], rows], axis=1)

    def _inverse_step(self, carry, xs):
        """Compute (logs, b) at the previous row through per-layer
        buffers, then invert the affine transform for the current row."""
        x_prev, bufs = carry
        z_row, cond_row = xs
        adt = self.sample_act_dtype or self.dtype
        ikern = self.input_proj.variables["params"]["kernel"][0, 0]
        ibias = self.input_proj.variables["params"]["bias"]
        h_row = (x_prev[..., None] * ikern[0] + ibias
                 ).astype(adt)                         # (B, W, C)
        skips = 0.0
        new_bufs = []
        c = self.channels
        for block, buf in zip(self.resnet, bufs):
            rows = jnp.concatenate([buf, h_row], axis=-1)  # (B, W, kh*C)
            new_bufs.append(rows[..., c:])
            ck = block.condition_proj.variables["params"]["kernel"][0, 0]
            cb = block.condition_proj.variables["params"]["bias"]
            cond_g = jnp.dot(cond_row, ck,
                             preferred_element_type=jnp.float32) + cb
            h_row, skip = block.step(rows, cond_g)
            skips = skips + skip
        okern = self.output_proj.variables["params"]["kernel"][0, 0]
        obias = self.output_proj.variables["params"]["bias"]
        out = jnp.dot(skips, okern) + obias            # (B, W, 2)
        logs, bias = out[..., 0], out[..., 1]
        x_new = (z_row - bias) * jnp.exp(-logs)
        return (x_new, tuple(new_bufs)), x_new


def _permute_rows(x: jnp.ndarray, flow_index: int, n_flows: int,
                  inverse: bool = False) -> jnp.ndarray:
    """Fixed row permutations between flows (reference
    waveflow.py:602-616): first half of the flows reverse all rows, the
    second half reverses each half independently.  Both are involutions,
    so inverse == forward."""
    del inverse
    h = x.shape[1]
    if flow_index < n_flows // 2:
        perm = jnp.arange(h - 1, -1, -1)
    else:
        half = h // 2
        perm = jnp.concatenate([jnp.arange(half - 1, -1, -1),
                                jnp.arange(h - 1, half - 1, -1)])
    return x[:, perm]


class WaveFlow(nn.Module):
    """Stack of flows with row permutations (reference
    waveflow.py:559-712)."""
    n_flows: int = 8
    n_layers: int = 8
    n_group: int = 16
    channels: int = 64
    mel_bands: int = 80
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32
    sample_act_dtype: Optional[jnp.dtype] = None   # see Flow

    # per-layer height dilations by n_group (waveflow.py:420-426); the
    # pattern repeats/caps at 8 layers, truncated/cycled for other depths
    dilations_dict = {
        8: (1, 1, 1, 1, 1, 1, 1, 1),
        16: (1, 1, 1, 1, 1, 1, 1, 1),
        32: (1, 2, 4, 1, 2, 4, 1, 2),
        64: (1, 2, 4, 8, 16, 1, 2, 4),
        128: (1, 2, 4, 8, 16, 32, 64, 1),
    }

    def setup(self):
        base = self.dilations_dict.get(self.n_group,
                                       (1,) * self.n_layers)
        dil_h = tuple(base[i % len(base)] for i in range(self.n_layers))
        self.flows = [
            Flow(self.n_layers, self.channels, self.mel_bands,
                 self.kernel_size, dilations_h=dil_h, dtype=self.dtype,
                 sample_act_dtype=self.sample_act_dtype)
            for _ in range(self.n_flows)]

    def __call__(self, x, condition):
        """x (B, T) audio, condition (B, T, C) upsampled mel ->
        (z (B, T), logs_total for the logdet)."""
        z = fold(x, self.n_group)
        cond = fold_condition(condition, self.n_group)
        logs_sum = 0.0
        for i, flow in enumerate(self.flows):
            z, logs = flow(z, cond)
            logs_sum = logs_sum + jnp.sum(logs, axis=(1, 2))
            # the reference permutes after EVERY flow, the last included
            # (waveflow.py:655-662)
            z = _permute_rows(z, i, self.n_flows)
            cond = _permute_rows(cond, i, self.n_flows)
        return unfold(z), logs_sum

    def inverse(self, z, condition):
        """z (B, T) noise -> audio (B, T)."""
        x = fold(z, self.n_group)
        cond = fold_condition(condition, self.n_group)
        # replay the permutation states the forward pass would have
        conds = [cond]
        for i in range(self.n_flows - 1):
            cond = _permute_rows(cond, i, self.n_flows)
            conds.append(cond)
        for i in reversed(range(self.n_flows)):
            # undo the permutation applied AFTER flow i in forward
            # (forward permutes after every flow, the last included)
            x = _permute_rows(x, i, self.n_flows)
            x = self.flows[i].inverse(x, conds[i])
        return unfold(x)


def fold_condition(condition: jnp.ndarray, n_group: int) -> jnp.ndarray:
    """(B, T, C) -> (B, n_group, W, C) matching :func:`fold`."""
    b, t, c = condition.shape
    w = t // n_group
    return condition[:, :w * n_group].reshape(
        b, w, n_group, c).transpose(0, 2, 1, 3)


class ConditionalWaveFlow(nn.Module):
    """UpsampleNet encoder + WaveFlow decoder (reference
    waveflow.py:714-853)."""
    upsample_factors: Sequence[int] = (16, 16)
    n_flows: int = 8
    n_layers: int = 8
    n_group: int = 16
    channels: int = 64
    n_mels: int = 80
    kernel_size: Tuple[int, int] = (3, 3)
    sigma: float = 1.0
    dtype: jnp.dtype = jnp.float32
    sample_act_dtype: Optional[jnp.dtype] = None   # see Flow

    def setup(self):
        self.encoder = UpsampleNet(self.upsample_factors, dtype=self.dtype)
        self.decoder = WaveFlow(self.n_flows, self.n_layers, self.n_group,
                                self.channels, self.n_mels,
                                self.kernel_size, dtype=self.dtype,
                                sample_act_dtype=self.sample_act_dtype)

    def __call__(self, audio, mel):
        """audio (B, T), mel (B, T_mel, C).  Returns (z, logs_sum)."""
        condition = self.encoder(mel)
        t = min(audio.shape[1], condition.shape[1])
        t = (t // self.n_group) * self.n_group
        return self.decoder(audio[:, :t], condition[:, :t])

    def infer(self, mel, rng):
        """mel (B, T_mel, C) -> audio (B, T_mel * upsample_factor)."""
        condition = self.encoder(mel)
        t = (condition.shape[1] // self.n_group) * self.n_group
        condition = condition[:, :t]
        z = self.sigma * jax.random.normal(
            rng, (condition.shape[0], t), self.dtype)
        return self.decoder.inverse(z, condition)


def waveflow_loss(z: jnp.ndarray, logs_sum: jnp.ndarray,
                  sigma: float = 1.0) -> dict:
    """-log-likelihood / sample count: z^2 / (2 sigma^2) - logdet
    + (log(2 pi)/2 + log sigma) (reference waveflow.py:855-892; the
    constant matches WaveFlowLoss.const so reported losses compare)."""
    n = z.shape[0] * z.shape[1]
    const = 0.5 * math.log(2 * math.pi) + math.log(sigma)
    nll = jnp.sum(jnp.square(z)) / (2 * sigma * sigma)
    logdet = jnp.sum(logs_sum)
    loss = (nll - logdet) / n + const
    return {"loss": loss, "nll": nll / n + const, "logdet": logdet / n}

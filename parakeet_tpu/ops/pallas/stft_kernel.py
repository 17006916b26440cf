"""Fused STFT-magnitude Pallas TPU kernel.

The XLA formulation (ops/stft.py) materializes the overlapped frame tensor
(B, n_frames, n_fft) in HBM — an ~n_fft/hop x inflation of the waveform
bytes (8.5x for the PWGAN loss's fft=1024/hop=120 resolution), written and
read back by the DFT matmul.  This kernel reads the waveform once, as
non-overlapping hop-sized chunks (a pure reshape), and computes

  spec[i, k] = sum_j  chunks[i + j] . basis[j*hop : (j+1)*hop, k]

i.e. the STFT as m = ceil(n_fft / hop) *statically shifted* MXU matmuls
per frame block — no overlapped gather, no unaligned dynamic slicing
(which Mosaic cannot lower).  Grid: (batch, frame-blocks, freq-blocks);
each step reads its chunk block plus the next (for the frames whose window
crosses the block edge) and accumulates m (128, hop) @ (hop, 128) matmuls.

Backward pass: registered via ``jax.custom_vjp``; gradients reuse the XLA
einsum formulation's VJP (exact same math), so the kernel is a pure
forward-bandwidth optimization — the hot path for the multi-resolution
STFT loss (reference: parakeet/modules/stft_loss.py:20-219) in vocoder
training and inference-time feature extraction.

STATUS: experimental.  Numerics verified on TPU (rel err ~5e-6 vs the
fp32 einsum reference via the bf16x2 operand split) and exact in CPU
interpret mode, but the current Mosaic toolchain takes minutes to compile
the shifted-view pattern (sublane-unaligned slices, rolls, and fp32
emulated matmuls all trigger it).  The default loss path stays on
ops/stft.py, whose framing+matmul XLA program is already MXU-bound; swap
this in via ``multi_resolution_stft_loss(..., stft_fn=...)`` once the
toolchain catches up.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stft import dft_basis, frame

__all__ = ["stft_magnitude_pallas"]

_FRAME_BLOCK = 128     # frames per grid step (MXU sublane-friendly)
_FREQ_BLOCK = 128      # frequency bins per grid step (lane width)
_LANES = 128


def _kernel(cur_ref, nxt_ref, rhi_ref, rlo_ref, ihi_ref, ilo_ref, out_ref,
            chunks_ref, *, m: int, eps: float):
    """cur/nxt: (1, FRAME_BLOCK, LANES) chunk blocks; r/i hi+lo:
    (m, LANES, FREQ_BLOCK) bf16 split of the per-shift basis;
    out: (1, FB, FREQ_BLOCK).

    Each shift-j view is obtained with ``pltpu.roll`` followed by an
    ALIGNED [:FB] slice — sublane-unaligned slices/copies make Mosaic
    compile time explode, rolls are cheap.  fp32 accuracy is recovered
    with a bf16x2 split of BOTH operands (x = hi + lo):
    x@B ~= hi@Bhi + hi@Blo + lo@Bhi; the dropped lo@Blo term is
    O(2^-16 * 2^-16).  (fp32-emulated HIGHEST matmuls inside Pallas also
    blow up compile time.)
    """
    chunks_ref[:_FRAME_BLOCK] = cur_ref[0]
    chunks_ref[_FRAME_BLOCK:] = nxt_ref[0]
    c = chunks_ref[:]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    re = jnp.zeros((_FRAME_BLOCK, _FREQ_BLOCK), jnp.float32)
    im = jnp.zeros((_FRAME_BLOCK, _FREQ_BLOCK), jnp.float32)
    n_rows = 2 * _FRAME_BLOCK
    for j in range(m):
        # roll(-j) expressed as the positive rotation (n_rows - j) %
        # n_rows; Mosaic only rotates 32-bit data, so roll the fp32
        # buffer and bf16x2-split the rolled view
        cj = pltpu.roll(c, (n_rows - j) % n_rows, 0)[:_FRAME_BLOCK]
        hi = cj.astype(jnp.bfloat16)
        lo = (cj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rhi, rlo = rhi_ref[j], rlo_ref[j]
        ihi, ilo = ihi_ref[j], ilo_ref[j]
        re = re + dot(hi, rhi) + dot(hi, rlo) + dot(lo, rhi)
        im = im + dot(hi, ihi) + dot(hi, ilo) + dot(lo, ihi)
    out_ref[0] = jnp.sqrt(jnp.clip(re * re + im * im, eps, None))


def _shift_basis(basis: np.ndarray, m: int, hop: int) -> np.ndarray:
    """(n_fft, K) -> (m, LANES, K): rows j*hop..(j+1)*hop padded to LANES."""
    n_fft, k = basis.shape
    out = np.zeros((m, _LANES, k), np.float32)
    for j in range(m):
        rows = basis[j * hop:(j + 1) * hop]
        out[j, :rows.shape[0], :] = rows
    return out


def _pallas_forward(x, real_b, imag_b, *, n_fft: int, hop: int,
                    n_frames: int, eps: float, interpret: bool):
    """x: (B, T) already center-padded."""
    assert hop <= _LANES, (
        f"hop {hop} > {_LANES} unsupported by the chunk kernel")
    b = x.shape[0]
    n_bins = real_b.shape[1]
    m = -(-n_fft // hop)           # chunks per frame window
    fblocks = -(-n_frames // _FRAME_BLOCK)
    kblocks = -(-n_bins // _FREQ_BLOCK)
    n_frames_pad = fblocks * _FRAME_BLOCK
    n_bins_pad = kblocks * _FREQ_BLOCK

    # chunk the waveform: (B, n_chunks, LANES) with hop real samples per
    # chunk (pure reshape + lane pad; no frame-level duplication)
    n_chunks = (fblocks + 1) * _FRAME_BLOCK + m   # slack for the nxt block
    need = n_chunks * hop
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    chunks = x[:, :need].astype(jnp.float32).reshape(b, n_chunks, hop)
    if hop < _LANES:
        chunks = jnp.pad(chunks, ((0, 0), (0, 0), (0, _LANES - hop)))

    rb = _shift_basis(np.asarray(real_b, np.float32), m, hop)
    ib = _shift_basis(np.asarray(imag_b, np.float32), m, hop)
    if n_bins_pad != n_bins:
        pad = ((0, 0), (0, 0), (0, n_bins_pad - n_bins))
        rb, ib = np.pad(rb, pad), np.pad(ib, pad)

    def split(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(hi), jnp.asarray(lo)

    rhi, rlo = split(rb)
    ihi, ilo = split(ib)

    grid = (b, fblocks, kblocks)
    out = pl.pallas_call(
        functools.partial(_kernel, m=m, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _FRAME_BLOCK, _LANES),
                         lambda b, f, k: (b, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _FRAME_BLOCK, _LANES),
                         lambda b, f, k: (b, f + 1, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((m, _LANES, _FREQ_BLOCK),
                         lambda b, f, k: (0, 0, k),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec(
            (1, _FRAME_BLOCK, _FREQ_BLOCK),
            lambda b, f, k: (b, f, k),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_frames_pad, n_bins_pad),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * _FRAME_BLOCK, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(chunks, chunks, rhi, rlo, ihi, ilo)
    return out[:, :n_frames, :n_bins]


def _reference_magnitude(x_padded, real_b, imag_b, n_fft, hop, eps):
    """XLA einsum formulation on the already-padded wav (same math)."""
    frames = frame(x_padded, n_fft, hop, center=False)
    re = jnp.einsum("bfn,nk->bfk", frames, real_b,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("bfn,nk->bfk", frames, imag_b,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(jnp.clip(re * re + im * im, eps, None))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _stft_mag(x, n_fft, hop, win_length, window, center, pad_mode, eps):
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode)
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    real_b, imag_b = dft_basis(n_fft, win_length, window)
    interpret = jax.default_backend() not in ("tpu", "axon")
    return _pallas_forward(x, jnp.asarray(real_b), jnp.asarray(imag_b),
                           n_fft=n_fft, hop=hop, n_frames=n_frames,
                           eps=eps, interpret=interpret)


def _stft_mag_fwd(x, n_fft, hop, win_length, window, center, pad_mode, eps):
    return _stft_mag(x, n_fft, hop, win_length, window, center, pad_mode,
                     eps), x


def _stft_mag_bwd(n_fft, hop, win_length, window, center, pad_mode, eps,
                  x, g):
    """Exact VJP through the einsum formulation (framing transpose handled
    by XLA's gather VJP — only paid in backward)."""
    real_b, imag_b = dft_basis(n_fft, win_length, window)
    rb, ib = jnp.asarray(real_b), jnp.asarray(imag_b)

    def ref(x_):
        xp = x_
        if center:
            xp = jnp.pad(xp, ((0, 0), (n_fft // 2, n_fft // 2)),
                         mode=pad_mode)
        return _reference_magnitude(xp, rb, ib, n_fft, hop, eps)

    _, vjp = jax.vjp(ref, x)
    return (vjp(g)[0],)


_stft_mag.defvjp(_stft_mag_fwd, _stft_mag_bwd)


def stft_magnitude_pallas(x: jnp.ndarray,
                          n_fft: int,
                          hop_length: int,
                          win_length: int | None = None,
                          window: str = "hann",
                          center: bool = True,
                          pad_mode: str = "reflect",
                          eps: float = 1e-7) -> jnp.ndarray:
    """Drop-in replacement for ops.stft.stft_magnitude; fused on TPU,
    interpret-mode (slow, exact) elsewhere.  Requires hop <= 128."""
    if win_length is None:
        win_length = n_fft
    return _stft_mag(x, n_fft, hop_length, win_length, window, center,
                     pad_mode, eps)

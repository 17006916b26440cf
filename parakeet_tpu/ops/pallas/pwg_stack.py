"""Fused Parallel-WaveGAN residual-stack Pallas TPU kernel.

The PWG generator runs 30 gated dilated-conv residual blocks over the
full-rate waveform (reference: parakeet/models/parallel_wavegan/
parallel_wavegan.py:144-316).  In XLA each block round-trips several
(T, C) tensors through HBM (T ~ 270k samples for 11 s of 24 kHz audio),
so the stack is bandwidth-bound at ~70 ms despite only ~0.8 TFLOP of
bf16 compute.  This kernel keeps activations in VMEM across a *group* of
layers (one stack of 10, dilations 1..512):

- grid (batch, time-blocks), time sequential.  x and c stay in HBM
  (memory_space=ANY); each step DMAs one window of BLOCK + HALO rows
  into VMEM (right lookahead only — the convs are non-causal) and runs
  all layers of the group on it.
- LEFT context needs no halo at all: the TPU grid executes time-blocks
  sequentially, so each layer's d input rows at the end of the center
  block are saved in a VMEM scratch (`tails`) and consumed by the next
  grid step — exact (fp32, no HBM round-trip) and ~25% less DMA/MXU/VPU
  work than the symmetric-halo formulation this replaced.
- RIGHT halo rows become progressively garbage as the valid region
  shrinks by d per layer; the center BLOCK rows stay exact, and only
  they are written out.
- dilated 3-tap convs are shifted matmuls: the +-d taps are static
  sublane-offset slices of the fp32 work buffer, lane-concatenated to a
  (R, 2*Cr) operand so the tap matmul runs at full MXU width; the
  center tap and the mel conditioning are separate dots.  The gate bias
  rides the conditioning matmul through a constant-1 lane (one fewer
  (R, 2cr) fp32 add per layer).  All matmuls are bf16 with fp32
  accumulation.
- per layer: gate = taps + aux(+bias); h = tanh(a)*sigmoid(b);
  [skip|res] = h @ [Wskip|Wout]; skips += skip (fp32 accumulator);
  x = (res + x) * sqrt(0.5), re-masked to zero past the signal end
  (the XLA path re-applies SAME zero padding at each conv; a gated
  block of zero input is NOT zero, so evolved padding would otherwise
  leak back into the signal edges).

Chaining the ``stacks`` groups happens in XLA (one pallas_call per
group; x and the skip partial sums make one HBM round-trip per group).
Forward-only: ResidualStack uses this path for inference ('auto' on
TPU); training takes the differentiable XLA path.

Measured at the headline bench point (b=1, T=268800, cr=64, 30 layers):
12.9 ms device time with the round-3 auto-sized 8192 block (14.5 at
4096; the round-1 symmetric-halo BLOCK=2048 kernel was 24.1 ms wall;
v5e, docs/tpu_performance.md).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_residual_stack", "fused_stack_supported"]

_BLOCK = 4096     # center samples per grid step
_HALO = 1024      # right-lookahead halo per group (>= sum of dilations)
_SLACK = 512      # right-tap overread slack (>= max dilation)


def fused_stack_supported(residual_channels: int, gate_channels: int,
                          skip_channels: int, kernel_size: int,
                          layers: int, stacks: int,
                          aux_channels: int = 80) -> bool:
    if kernel_size != 3 or layers % stacks != 0:
        return False
    if not 0 < aux_channels <= 127:     # lane ca carries the bias ones
        return False
    if gate_channels != 2 * residual_channels:
        return False
    if residual_channels != skip_channels:
        return False
    per = layers // stacks
    if sum(2 ** (i % per) for i in range(layers)) // stacks > _HALO:
        return False
    if max(2 ** (i % per) for i in range(layers)) > _SLACK:
        return False
    return residual_channels in (32, 64, 128)


def _group_kernel(x_hbm, c_hbm, w02, w1, wa, wso, bso,
                  x_next, skip_out, xdma, cdma, xw, sbuf, tails,
                  sem_x, sem_c,
                  *, dils, cr: int, ca: int, t_signal: int, block: int):
    _group_body(x_hbm, c_hbm, w02, w1, wa, wso, bso, x_next, skip_out,
                None, xdma, cdma, xw, sbuf, tails, sem_x, sem_c,
                dils=dils, cr=cr, ca=ca, t_signal=t_signal, block=block)


def _group_save_kernel(x_hbm, c_hbm, w02, w1, wa, wso, bso,
                       x_next, skip_out, saved, xdma, cdma, xw, sbuf,
                       tails, sem_x, sem_c,
                       *, dils, cr: int, ca: int, t_signal: int,
                       block: int):
    """Forward + save: the training forward (custom VJP,
    pwg_stack_train.py) also writes each layer's bf16 input stream
    (center rows) to HBM, so the backward needs no recompute pass —
    ``saved[(B, Lg, T + 2*BLOCK, 128)]`` at lead BLOCK, exactly the
    operand dtype the forward matmuls consumed."""
    _group_body(x_hbm, c_hbm, w02, w1, wa, wso, bso, x_next, skip_out,
                saved, xdma, cdma, xw, sbuf, tails, sem_x, sem_c,
                dils=dils, cr=cr, ca=ca, t_signal=t_signal, block=block)


def _group_body(x_hbm, c_hbm, w02, w1, wa, wso, bso,
                x_next, skip_out, saved, xdma, cdma, xw, sbuf, tails,
                sem_x, sem_c,
                *, dils, cr: int, ca: int, t_signal: int, block: int):
    """One group of len(dils) gated residual layers on a right-extended
    window with carried left tails.

    x_hbm: (B, pad_t + 2*BLOCK, 128) bf16 in HBM; c_hbm likewise
    w02: (Lg, 2cr, 2cr) bf16   [w_tap0; w_tap2] stacked on contraction
    w1:  (Lg, cr, 2cr) bf16    center tap
    wa:  (Lg, ca+1, 2cr) bf16  aux 1x1, last row = gate bias (the DMA
    buffer's lane ca is set to 1.0, so the bias rides the aux matmul
    instead of costing a separate (R, 2cr) fp32 add per layer)
    wso: (Lg, cr, 2cr) bf16    [Wskip | Wout] stacked on output
    bso: (Lg, 1, 2cr) f32   [skip bias | out bias] (the GATE bias has no
    separate input: it rides ``wa`` as its last row, which rounds it to
    bf16 — a deliberate trade: conv biases are O(0.01) so the ~3-digit
    quantization is far below the kernel's documented bf16 deviation,
    and it saves one (R, 2cr) fp32 add per layer)
    x_next: (1, BLOCK, 128) bf16 at BLOCK index f+1 of the padded array
    skip_out: (1, BLOCK, cr) f32
    scratch: xdma/cdma (R, 128) bf16 DMA buffers; xw
    (HALO + R + SLACK, cr) f32 work buffer (tail rows at
    [HALO-d, HALO), x rows at [HALO, HALO+R), slack garbage above);
    sbuf (R, cr) f32 skip accumulator; tails (sum(dils), cr) f32 —
    layer j's d_j input rows at static offset cum_{<j}, persisted
    across sequential grid steps; sem_x/sem_c DMA semaphores.
    """
    r = block + _HALO
    bb = pl.program_id(0)
    f = pl.program_id(1)
    # window = global rows [f*BLOCK, f*BLOCK + R); the padded array
    # leads with one full BLOCK
    row0 = pl.multiple_of((f + 1) * block, 256)

    cp_x = pltpu.make_async_copy(x_hbm.at[bb, pl.ds(row0, r)], xdma, sem_x)
    cp_c = pltpu.make_async_copy(c_hbm.at[bb, pl.ds(row0, r)], cdma, sem_c)
    cp_x.start()
    cp_c.start()

    # left context of block 0 is silence: zero the carried tails
    @pl.when(f == 0)
    def _():
        tails[:] = jnp.zeros_like(tails)

    # global signal row of window row i is f*BLOCK + i (never < 0, so
    # only the right end needs masking)
    gstart = f * block
    rows = gstart + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    mask = (rows < t_signal).astype(jnp.float32)

    cp_x.wait()
    cp_c.wait()
    # mask at load: the x_next buffers carry garbage in halo/pad regions
    # (select, not multiply — the garbage may be NaN/inf)
    xw[_HALO:_HALO + r] = jnp.where(
        mask > 0, xdma[:, :cr].astype(jnp.float32), 0.0)
    sbuf[:] = jnp.zeros((r, cr), jnp.float32)

    cdma[:, ca:ca + 1] = jnp.ones((r, 1), jnp.bfloat16)
    cb = cdma[:, :ca + 1]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    off = 0
    for j, d in enumerate(dils):
        # carried tail: this layer's input rows [f*BLOCK-d, f*BLOCK)
        xw[_HALO - d:_HALO] = tails[off:off + d]
        # save rows [(f+1)*BLOCK - d, (f+1)*BLOCK) of the SAME input
        # for the next grid step (read-then-write is safe: loads below
        # produce values before the store lands)
        tails[off:off + d] = xw[_HALO + block - d:_HALO + block]
        off += d

        if saved is not None:
            # layer j's input stream, center rows — exactly the bf16
            # the matmuls below consume (backward recomputes gates
            # from this, bit-for-bit)
            ctr = xw[_HALO:_HALO + block]
            if cr == 128:
                saved[0, j] = ctr.astype(jnp.bfloat16)
            else:
                saved[0, j] = jnp.concatenate(
                    [ctr.astype(jnp.bfloat16),
                     jnp.zeros((block, 128 - cr), jnp.bfloat16)],
                    axis=1)

        x = xw[_HALO:_HALO + r]
        left = xw[_HALO - d:_HALO - d + r].astype(jnp.bfloat16)
        right = xw[_HALO + d:_HALO + d + r].astype(jnp.bfloat16)
        taps = jnp.concatenate([left, right], axis=1)       # (R, 2cr)
        g = (dot(taps, w02[j]) + dot(x.astype(jnp.bfloat16), w1[j])
             + dot(cb, wa[j]))
        h = (jnp.tanh(g[:, :cr])
             * jax.nn.sigmoid(g[:, cr:])).astype(jnp.bfloat16)
        so = dot(h, wso[j]) + bso[j]                        # (R, 2cr)
        sbuf[:] = sbuf[:] + so[:, :cr]
        xw[_HALO:_HALO + r] = (so[:, cr:] + x) * (math.sqrt(0.5) * mask)

    x_next[0, :, :cr] = xw[_HALO:_HALO + block].astype(jnp.bfloat16)
    skip_out[0] = sbuf[:block]


def _run_group(x_pad, c_pad, wg, dils, *, b, nblk, cr, ca, t_signal,
               interpret, save: bool = False, block: int = None):
    """x_pad/c_pad: (B, (nblk+2)*BLOCK, 128) bf16 (c zero-padded; x
    halo/pad garbage tolerated — select-masked at load); returns
    (x_next in the same padded layout [bf16], skips
    (B, nblk*BLOCK, cr) [f32]) — plus, with ``save=True``, the saved
    per-layer bf16 input streams (B, Lg, (nblk+2)*BLOCK, 128) at lead
    BLOCK for the training backward (pwg_stack_train.py).  ``block``
    is the center-rows-per-grid-step tile (default the module's
    _BLOCK); callers must pad to the same block."""
    lg = len(dils)
    blk = _BLOCK if block is None else block
    r = blk + _HALO
    sum_d = int(sum(dils))

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, f: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((1, blk, 128), lambda bb, f: (bb, f + 1, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, cr), lambda bb, f: (bb, f, 0),
                     memory_space=pltpu.VMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((b, (nblk + 2) * blk, 128), jnp.bfloat16),
        jax.ShapeDtypeStruct((b, nblk * blk, cr), jnp.float32)]
    if save:
        kernel = _group_save_kernel
        out_specs.append(
            pl.BlockSpec((1, lg, blk, 128), lambda bb, f: (bb, 0, f + 1, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (b, lg, (nblk + 2) * blk, 128), jnp.bfloat16))
    else:
        kernel = _group_kernel

    grid = (b, nblk)
    out = pl.pallas_call(
        functools.partial(kernel, dils=tuple(dils), cr=cr,
                          ca=ca, t_signal=t_signal, block=blk),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  wspec((lg, 2 * cr, 2 * cr)), wspec((lg, cr, 2 * cr)),
                  wspec((lg, ca + 1, 2 * cr)), wspec((lg, cr, 2 * cr)),
                  wspec((lg, 1, 2 * cr))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.bfloat16),
                        pltpu.VMEM((r, 128), jnp.bfloat16),
                        pltpu.VMEM((_HALO + r + _SLACK, cr),
                                   jnp.float32),
                        pltpu.VMEM((r, cr), jnp.float32),
                        pltpu.VMEM((sum_d, cr), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(64 if save or blk > _BLOCK else 32)
            * 1024 * 1024),
        interpret=interpret,
    )(x_pad, c_pad, *wg)
    return out


def _pick_block(t: int) -> int:
    """Inference block auto-tuning: every grid step pays a fixed _HALO
    rows of redundant right-lookahead work, so larger blocks amortize it
    (at the 11 s headline shape, 8192 computes 10% fewer rows than
    4096); the last block's padding waste pulls the other way for short
    signals.  Minimize total computed rows nblk*(block+_HALO) over
    power-of-two multiples of _BLOCK.  VMEM caps the window at
    2*_BLOCK (4*_BLOCK needs an 82 MB scoped allocation — over the
    hardware's scoped-vmem budget — for 2% more saving).  Training
    keeps _BLOCK: its backward tile must divide the forward block, and
    the saved-stream lead grows with the block."""
    best = _BLOCK
    best_cost = -(-t // _BLOCK) * (_BLOCK + _HALO)
    for blk in (2 * _BLOCK,):
        cost = -(-t // blk) * (blk + _HALO)
        if cost <= best_cost:
            best, best_cost = blk, cost
    return best


def fused_residual_stack(x, c, weights, *, dilations, stacks):
    """x: (B, T, cr), c: (B, T, ca); weights dict of stacked (L, ...)
    effective (weight-norm-folded) kernels from ResidualStack.

    Returns (x_final (B, T, cr) bf16, skip_sum (B, T, cr) f32) — exact
    same math as the XLA path modulo bf16 rounding.
    """
    b, t, cr = x.shape
    ca = c.shape[-1]
    l = weights["conv"].shape[0]
    lg = l // stacks

    conv = weights["conv"].astype(jnp.bfloat16)        # (L, 3, cr, 2cr)
    w02 = jnp.concatenate([conv[:, 0], conv[:, 2]], axis=1)
    w1 = conv[:, 1]
    zeros_g = jnp.zeros((l, 1, 2 * cr), jnp.float32)
    bt_row = (zeros_g if weights.get("conv_b") is None
              else weights["conv_b"][:, None, :].astype(jnp.float32))
    wa = jnp.concatenate(
        [weights["aux"], bt_row], axis=1).astype(jnp.bfloat16)
    wso = jnp.concatenate([weights["skip"], weights["out"]],
                          axis=2).astype(jnp.bfloat16)  # (L, cr, 2cr)
    if weights.get("skip_b") is None:
        bso = zeros_g
    else:
        bso = jnp.concatenate(
            [weights["skip_b"], weights["out_b"]],
            axis=1)[:, None, :].astype(jnp.float32)

    blk = _pick_block(t)
    nblk = -(-t // blk)
    pad_t = nblk * blk
    interpret = jax.default_backend() not in ("tpu", "axon")

    def pad_sig(a):
        # lane-pad to 128 channels (Mosaic DMA slices must be
        # 128-aligned); one full leading BLOCK so the kernel's padded
        # x output lands on block-aligned offsets
        a = jnp.pad(a, ((0, 0), (blk, pad_t - t + blk),
                        (0, 128 - a.shape[-1])))
        return a.astype(jnp.bfloat16)

    c_pad = pad_sig(c)
    x_pad = pad_sig(x)
    skips = None
    for g in range(stacks):
        sl = slice(g * lg, (g + 1) * lg)
        wg = (w02[sl], w1[sl], wa[sl], wso[sl], bso[sl])
        x_pad, sk = _run_group(x_pad, c_pad, wg, dilations[sl], b=b,
                               nblk=nblk, cr=cr, ca=ca, t_signal=t,
                               interpret=interpret, block=blk)
        skips = sk if skips is None else skips + sk
    return x_pad[:, blk:blk + t, :cr], skips[:, :t]

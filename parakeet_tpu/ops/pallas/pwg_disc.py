"""Fused Parallel-WaveGAN discriminator stack (forward + custom VJP).

Round-3's floor analysis (docs/tpu_performance.md) measured the
fp32 GAN step at 25.1% MFU with the residual-stack kernels in place and
attributed the remaining wall to the discriminator's conv lowering:
three full-rate 10-layer dilated-conv passes per step (D fwd on
real+fake, D bwd) ran as per-layer XLA shifted matmuls — fp32 MXU
(half rate) plus a (B, T, 64) HBM round-trip between every layer.
This module gives the discriminator the same treatment as the
generator stack (pwg_stack.py / pwg_stack_train.py): one Pallas kernel
runs layers 1..9 end-to-end out of VMEM with bf16 matmuls and fp32
accumulation, sequential over time blocks with carried left tails
(right-lookahead halo), and a hand-written reverse-grid transpose.

Layer 0 (1 -> 64 channels, k=3) stays in XLA: its matmuls are K=1
outer products the MXU cannot use anyway, and keeping it outside
removes all single-channel special-casing from the kernel.  The fused
region is layers 1..9 of the reference discriminator
(/root/reference/parakeet/models/parallel_wavegan/parallel_wavegan.py:
523-633): eight 64->64 dilated convs (dilation i at layer i) each
followed by LeakyReLU, then the linear 64->1 output conv (padded to 64
output lanes; column 0 is the logit).

Backward structure mirrors pwg_stack_train._bwd_kernel: reverse grid,
LEFT halo of sum(dilations)=37 rows per block, exact right boundary
via carried per-layer tails of the left-tap gradient.  One key
simplification over the gated stack: LeakyReLU (slope 0.2 > 0)
preserves sign, so the backward mask ``where(y > 0, 1, slope)`` comes
straight from the saved next-layer input — no gate recompute at all.
Weight/bias grads accumulate over center rows into revisited
VMEM-resident output blocks.

Gradient semantics match the stack kernels: the exact transpose of the
bf16 forward (gradients OF the fused function), so parity tests vs the
XLA path carry bf16 tolerances (tests/test_pwg_disc_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_disc_tail", "fused_disc_supported", "DISC_TAIL_DILS"]

_BLOCK = 4096
_HALO = 64        # >= sum(DISC_TAIL_DILS) = 37
_SLACK = 8        # >= max dilation
_E = 40           # recompute halo: >= sum(DISC_TAIL_DILS[:-1]) = 36, 8-aligned
_SP = 8           # recompute work-buffer margin: >= max dilation

# layers 1..8 (dilation = layer index) + the k=3 d=1 output conv
DISC_TAIL_DILS = (1, 2, 3, 4, 5, 6, 7, 8, 1)
_SUM_D = sum(DISC_TAIL_DILS)
_LG = len(DISC_TAIL_DILS)


def fused_disc_supported(in_channels: int, out_channels: int,
                         kernel_size: int, layers: int,
                         conv_channels: int, dilation_factor: int) -> bool:
    return (in_channels == 1 and out_channels == 1 and kernel_size == 3
            and layers == 10 and conv_channels == 64
            and dilation_factor == 1)


def _fwd_kernel(x_hbm, wk, bk, out, saved, xdma, xw, tails, sem_x,
                *, t_signal: int, block: int, slope: float):
    """Forward layers 1..9 on a right-extended window.

    x_hbm: (B, (nblk+2)*BLOCK, 128) bf16 lead BLOCK; lanes 0:64 = the
    XLA layer-0 output.  wk: (9, 3, 64, 64) bf16 per-tap kernels
    [-d, 0, +d].  bk: (9, 1, 64) f32 (last layer's columns
    1..63 are zero, as are wk[8]'s, so its junk lanes are exactly 0).
    out: (1, BLOCK, 128) f32 logits block (column 0).  saved (save
    variant only): (1, 9, BLOCK, 128) bf16 per-layer input streams at
    lead BLOCK.  Scratch: xdma (r, 128) bf16; xw (HALO+r+SLACK, 64)
    f32 work buffer (tails at [HALO-d, HALO)); tails (sum_d, 64) f32
    carried across sequential grid steps.
    """
    r = block + _HALO
    bb = pl.program_id(0)
    f = pl.program_id(1)
    row0 = pl.multiple_of((f + 1) * block, 256)

    cp_x = pltpu.make_async_copy(x_hbm.at[bb, pl.ds(row0, r)], xdma, sem_x)
    cp_x.start()

    @pl.when(f == 0)
    def _():
        tails[:] = jnp.zeros_like(tails)

    gstart = f * block
    # full-width row mask: Mosaic rejects the (r, 1) -> (r, 64) i1
    # broadcast relayout, so the iota is materialized at select shape
    rows = gstart + jax.lax.broadcasted_iota(jnp.int32, (r, 64), 0)
    mask = rows < t_signal
    maskf = mask.astype(jnp.float32)

    cp_x.wait()
    xw[_HALO:_HALO + r] = jnp.where(
        mask, xdma[:, :64].astype(jnp.float32), 0.0)
    xw[_HALO + r:] = jnp.zeros_like(xw[_HALO + r:])

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    off = 0
    for j, d in enumerate(DISC_TAIL_DILS):
        xw[_HALO - d:_HALO] = tails[off:off + d]
        tails[off:off + d] = xw[_HALO + block - d:_HALO + block]
        off += d

        if saved is not None:
            saved[0, j] = jnp.concatenate(
                [xw[_HALO:_HALO + block].astype(jnp.bfloat16),
                 jnp.zeros((block, 64), jnp.bfloat16)], axis=1)

        # three accumulating K=64 dots, NOT one concat(192) matmul:
        # Mosaic rejects bf16 concats of sublane-offset slices
        # ('result/input offset mismatch'), and the gen stack measured
        # the concat temp as a net loss anyway (CLAUDE.md lore)
        left = xw[_HALO - d:_HALO - d + r].astype(jnp.bfloat16)
        ctr = xw[_HALO:_HALO + r].astype(jnp.bfloat16)
        right = xw[_HALO + d:_HALO + d + r].astype(jnp.bfloat16)
        pre = (dot(left, wk[j, 0]) + dot(ctr, wk[j, 1])
               + dot(right, wk[j, 2]) + bk[j])
        if j < _LG - 1:
            # max/min LeakyReLU: no i1 select (see the mask note above)
            pre = jnp.maximum(pre, 0.0) + slope * jnp.minimum(pre, 0.0)
        # multiply, not select: pre is finite by construction (the
        # load select zeroed all garbage), and the save variant's extra
        # layout pressure made Mosaic demand a replicated i1 it cannot
        # produce when the mask fed ten selects
        xw[_HALO:_HALO + r] = pre * maskf

    out[0] = jnp.concatenate(
        [xw[_HALO:_HALO + block], jnp.zeros((block, 64), jnp.float32)],
        axis=1)


def _fwd_save_kernel(x_hbm, wk, bk, out, saved, xdma, xw, tails, sem_x,
                     *, t_signal: int, block: int, slope: float):
    _fwd_kernel(x_hbm, wk, bk, out, saved, xdma, xw, tails, sem_x,
                t_signal=t_signal, block=block, slope=slope)


def _fwd_nosave_kernel(x_hbm, wk, bk, out, xdma, xw, tails, sem_x,
                       *, t_signal: int, block: int, slope: float):
    _fwd_kernel(x_hbm, wk, bk, out, None, xdma, xw, tails, sem_x,
                t_signal=t_signal, block=block, slope=slope)


def _run_fwd(x_pad, wk, bk, *, b, nblk, t_signal, interpret, save,
             block, slope):
    blk = block
    r = blk + _HALO

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, f: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_specs = [pl.BlockSpec((1, blk, 128), lambda bb, f: (bb, f, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, nblk * blk, 128), jnp.float32)]
    if save:
        kernel = _fwd_save_kernel
        out_specs.append(pl.BlockSpec(
            (1, _LG, blk, 128), lambda bb, f: (bb, 0, f + 1, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (b, _LG, (nblk + 2) * blk, 128), jnp.bfloat16))
    else:
        kernel = _fwd_nosave_kernel

    return pl.pallas_call(
        functools.partial(kernel, t_signal=t_signal, block=blk,
                          slope=slope),
        grid=(b, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  wspec((_LG, 3, 64, 64)), wspec((_LG, 1, 64))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.bfloat16),
                        pltpu.VMEM((_HALO + r + _SLACK, 64), jnp.float32),
                        pltpu.VMEM((_SUM_D, 64), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_pad, wk, bk)


def _bwd_kernel(saved_hbm, dlog_hbm, wkt,
                dx0, dwk, dbk,
                svdma, dlogb, dy, dnx, pbuf, tails, sem_s, sem_g,
                *, t_signal: int, block: int, slope: float, nblk: int):
    """Reverse-grid transpose of layers 1..9.

    Window = [k*block - HALO, k*block + block) (LEFT halo); the right
    boundary is exact via carried per-layer left-tap-gradient tails.
    Masks come from the SIGN of the saved next-layer input (LeakyReLU
    with positive slope preserves sign), so nothing is recomputed.
    wkt: (9, 64, 192) bf16 = [Wl^T | Wc^T | Wr^T] stacked on output, so
    one dot yields all three tap gradients.  dwk/dbk accumulate over
    center rows into revisited output blocks (zeroed on the first grid
    step, flushed at grid end).
    """
    w = _HALO + block
    xwn = w + 2 * _SLACK
    lead = block
    bb = pl.program_id(0)
    f = pl.program_id(1)
    k = nblk - 1 - f
    win0 = k * block - _HALO

    cp_s = pltpu.make_async_copy(
        saved_hbm.at[bb, :, pl.ds(lead + win0 - _SLACK, xwn)], svdma,
        sem_s)
    cp_g = pltpu.make_async_copy(
        dlog_hbm.at[bb, pl.ds(lead + win0, w)], dlogb, sem_g)
    # (window start win0 is negative only through the halo, which the
    # lead block absorbs for both arrays)
    cp_s.start()
    cp_g.start()

    @pl.when(f == 0)
    def _():
        tails[:] = jnp.zeros_like(tails)

    @pl.when(jnp.logical_and(bb == 0, f == 0))
    def _():
        dwk[:] = jnp.zeros_like(dwk)
        dbk[:] = jnp.zeros_like(dbk)

    # full-width row masks (see the forward kernel's relayout note)
    rows_w = win0 + jax.lax.broadcasted_iota(jnp.int32, (w, 64), 0)
    valid_w = (jnp.where(rows_w >= 0, 1.0, 0.0)
               * jnp.where(rows_w < t_signal, 1.0, 0.0))
    rows_x = (win0 - _SLACK
              + jax.lax.broadcasted_iota(jnp.int32, (xwn, 64), 0))
    valid_x = (jnp.where(rows_x >= 0, 1.0, 0.0)
               * jnp.where(rows_x < t_signal, 1.0, 0.0))

    cp_s.wait()
    cp_g.wait()
    # multiply, not select: dlog_pad is jnp.pad-built (real zeros,
    # never NaN), and a w-row i1 select here made Mosaic demand a
    # replicated i1 relayout it cannot produce
    dy[:] = dlogb[:, :64] * valid_w

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def dot_rows(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    offs = []
    o = 0
    for d in DISC_TAIL_DILS:
        offs.append(o)
        o += d

    for j in range(_LG - 1, -1, -1):
        d = DISC_TAIL_DILS[j]
        off = offs[j]
        if j < _LG - 1:
            # saved[j+1] is this layer's OUTPUT: sign(pre) == sign(out).
            # Arithmetic mask (no i1 select — Mosaic rejects w-row i1
            # relayouts in this kernel): sign(y) is +-1 away from 0;
            # exactly-zero activations get the midpoint, a measure-zero
            # set that only occurs on masked/padded rows where dy == 0.
            sg = jnp.sign(svdma[j + 1, _SLACK:_SLACK + w, :64]
                          .astype(jnp.float32))
            dpre = dy[:] * (0.5 * (1.0 + slope)
                            + 0.5 * (1.0 - slope) * sg)
        else:
            dpre = dy[:]
        dpre_bf = dpre.astype(jnp.bfloat16)

        # weight/bias grads over center rows only (per-tap dots — no
        # bf16 concat, see the forward kernel's note)
        # multiply: the VJP zeroes the saved streams' lead/trail pad
        # blocks in XLA, so out-of-window reads are finite zeros
        xs = (svdma[j, :, :64].astype(jnp.float32)
              * valid_x).astype(jnp.bfloat16)
        c0 = _SLACK + _HALO
        dpre_c = dpre_bf[_HALO:_HALO + block]
        dwk[j, 0] = dwk[j, 0] + dot_rows(xs[c0 - d:c0 - d + block], dpre_c)
        dwk[j, 1] = dwk[j, 1] + dot_rows(xs[c0:c0 + block], dpre_c)
        dwk[j, 2] = dwk[j, 2] + dot_rows(xs[c0 + d:c0 + d + block], dpre_c)
        dbk[j] = dbk[j] + jnp.sum(dpre[_HALO:_HALO + block], axis=0,
                                  keepdims=True)

        # input gradient: dx[i] = p_l[i+d] + p_c[i] + p_r[i-d]
        pbuf[:] = dot(dpre_bf, wkt[j])                     # (w, 192)
        dnx[:] = pbuf[:, 64:128]
        dnx[0:w - d] = dnx[0:w - d] + pbuf[d:w, 0:64]
        dnx[w - d:w] = dnx[w - d:w] + tails[off:off + d]
        tails[off:off + d] = pbuf[_HALO:_HALO + d, 0:64]
        dnx[d:w] = dnx[d:w] + pbuf[0:w - d, 128:192]
        dy[:] = dnx[:]

    dx0[0] = jnp.concatenate(
        [dy[_HALO:_HALO + block], jnp.zeros((block, 64), jnp.float32)],
        axis=1)


def _run_bwd(saved, dlog_pad, wkt, *, b, nblk, t_signal, interpret,
             block, slope):
    blk = block
    w = _HALO + blk
    xwn = w + 2 * _SLACK

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, f: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, t_signal=t_signal, block=blk,
                          slope=slope, nblk=nblk),
        grid=(b, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  wspec((_LG, 64, 192))],
        out_specs=[
            pl.BlockSpec((1, blk, 128),
                         lambda bb, f: (bb, nblk - 1 - f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LG, 3, 64, 64), lambda bb, f: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LG, 1, 64), lambda bb, f: (0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b, nblk * blk, 128), jnp.float32),
            jax.ShapeDtypeStruct((_LG, 3, 64, 64), jnp.float32),
            jax.ShapeDtypeStruct((_LG, 1, 64), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((_LG, xwn, 128), jnp.bfloat16),
                        pltpu.VMEM((w, 128), jnp.float32),
                        pltpu.VMEM((w, 64), jnp.float32),
                        pltpu.VMEM((w, 64), jnp.float32),
                        pltpu.VMEM((w, 192), jnp.float32),
                        pltpu.VMEM((_SUM_D, 64), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(saved, dlog_pad, wkt)


def _bwd_rc_kernel(x_hbm, dlog_hbm, wk, wkt, bk,
                   dx0, dwk, dbk,
                   xdma, dlogb, xwp, streams, dy, dnx, pbuf, tails,
                   sem_x, sem_g,
                   *, t_signal: int, block: int, slope: float, nblk: int):
    """Reverse-grid transpose with IN-VMEM STREAM RECOMPUTE (round 5).

    The save-variant VJP writes nine (B, T, 128) bf16 per-layer input
    streams in the forward and reads them back here — ~19 MB of HBM
    round-trip per (batch row, block), which round 4 measured as one of
    the two causes of the bf16 fused-disc regression (82.0 vs 94.2
    seq/s @ bs6).  This kernel instead DMAs ONE halo-extended window of
    the original padded input (the layer-0 output the forward already
    consumes) and re-runs layers 1..8 in VMEM to rebuild the streams:
    ~0.9 GFLOP of bf16 MXU work per block in place of the HBM traffic.

    Window arithmetic: the grad pass needs stream rows
    [win0 - SLACK, win0 + block + SLACK); producing layer j's input
    exactly there needs x0 extended by sum(dils[:j]) <= 36 rows on each
    side, so the DMA window is L = block + HALO + 2*SLACK + 2*E rows
    (E = 40).  Each recomputed layer applies the same mask-multiply as
    the forward, so central-region streams are bitwise identical to the
    save variant's (same dot order, same bf16 rounding points).
    """
    w = _HALO + block
    ll = w + 2 * _SLACK + 2 * _E          # recompute window length
    lead = block
    bb = pl.program_id(0)
    f = pl.program_id(1)
    k = nblk - 1 - f
    win0 = k * block - _HALO

    cp_x = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(lead + win0 - _SLACK - _E, ll)], xdma, sem_x)
    cp_g = pltpu.make_async_copy(
        dlog_hbm.at[bb, pl.ds(lead + win0, w)], dlogb, sem_g)
    cp_x.start()
    cp_g.start()

    @pl.when(f == 0)
    def _():
        tails[:] = jnp.zeros_like(tails)

    @pl.when(jnp.logical_and(bb == 0, f == 0))
    def _():
        dwk[:] = jnp.zeros_like(dwk)
        dbk[:] = jnp.zeros_like(dbk)

    # full-width row masks (float multiplies only — see _bwd_kernel)
    rows_w = win0 + jax.lax.broadcasted_iota(jnp.int32, (w, 64), 0)
    valid_w = (jnp.where(rows_w >= 0, 1.0, 0.0)
               * jnp.where(rows_w < t_signal, 1.0, 0.0))
    rows_l = (win0 - _SLACK - _E
              + jax.lax.broadcasted_iota(jnp.int32, (ll, 64), 0))
    valid_l = (jnp.where(rows_l >= 0, 1.0, 0.0)
               * jnp.where(rows_l < t_signal, 1.0, 0.0))

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def dot_rows(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    cp_x.wait()
    # ---- recompute streams 0..8 (inputs of layers 0..8) in VMEM ----
    xwp[:_SP] = jnp.zeros_like(xwp[:_SP])
    xwp[_SP + ll:] = jnp.zeros_like(xwp[_SP + ll:])
    xwp[_SP:_SP + ll] = xdma[:, :64].astype(jnp.float32) * valid_l
    for j in range(_LG):
        streams[j] = xwp[_SP:_SP + ll].astype(jnp.bfloat16)
        if j < _LG - 1:
            d = DISC_TAIL_DILS[j]
            left = xwp[_SP - d:_SP - d + ll].astype(jnp.bfloat16)
            ctr = xwp[_SP:_SP + ll].astype(jnp.bfloat16)
            right = xwp[_SP + d:_SP + d + ll].astype(jnp.bfloat16)
            pre = (dot(left, wk[j, 0]) + dot(ctr, wk[j, 1])
                   + dot(right, wk[j, 2]) + bk[j])
            pre = jnp.maximum(pre, 0.0) + slope * jnp.minimum(pre, 0.0)
            xwp[_SP:_SP + ll] = pre * valid_l

    cp_g.wait()
    dy[:] = dlogb[:, :64] * valid_w

    offs = []
    o = 0
    for d in DISC_TAIL_DILS:
        offs.append(o)
        o += d

    c0 = _E + _SLACK + _HALO          # center-row 0 within a stream
    for j in range(_LG - 1, -1, -1):
        d = DISC_TAIL_DILS[j]
        off = offs[j]
        if j < _LG - 1:
            # streams[j+1] is this layer's OUTPUT (sign-preserving
            # LeakyReLU): arithmetic mask, as in _bwd_kernel
            sg = jnp.sign(streams[j + 1, _E + _SLACK:_E + _SLACK + w, :]
                          .astype(jnp.float32))
            dpre = dy[:] * (0.5 * (1.0 + slope)
                            + 0.5 * (1.0 - slope) * sg)
        else:
            dpre = dy[:]
        dpre_bf = dpre.astype(jnp.bfloat16)

        # weight/bias grads over center rows (streams are already
        # mask-zeroed outside the signal, matching the save variant's
        # valid_x multiply)
        dpre_c = dpre_bf[_HALO:_HALO + block]
        dwk[j, 0] = dwk[j, 0] + dot_rows(
            streams[j, c0 - d:c0 - d + block], dpre_c)
        dwk[j, 1] = dwk[j, 1] + dot_rows(
            streams[j, c0:c0 + block], dpre_c)
        dwk[j, 2] = dwk[j, 2] + dot_rows(
            streams[j, c0 + d:c0 + d + block], dpre_c)
        dbk[j] = dbk[j] + jnp.sum(dpre[_HALO:_HALO + block], axis=0,
                                  keepdims=True)

        # input gradient: dx[i] = p_l[i+d] + p_c[i] + p_r[i-d]
        pbuf[:] = dot(dpre_bf, wkt[j])                     # (w, 192)
        dnx[:] = pbuf[:, 64:128]
        dnx[0:w - d] = dnx[0:w - d] + pbuf[d:w, 0:64]
        dnx[w - d:w] = dnx[w - d:w] + tails[off:off + d]
        tails[off:off + d] = pbuf[_HALO:_HALO + d, 0:64]
        dnx[d:w] = dnx[d:w] + pbuf[0:w - d, 128:192]
        dy[:] = dnx[:]

    dx0[0] = jnp.concatenate(
        [dy[_HALO:_HALO + block], jnp.zeros((block, 64), jnp.float32)],
        axis=1)


def _run_bwd_rc(x_pad, dlog_pad, wk, wkt, bk, *, b, nblk, t_signal,
                interpret, block, slope):
    blk = block
    w = _HALO + blk
    ll = w + 2 * _SLACK + 2 * _E

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, f: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_bwd_rc_kernel, t_signal=t_signal, block=blk,
                          slope=slope, nblk=nblk),
        grid=(b, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  wspec((_LG, 3, 64, 64)), wspec((_LG, 64, 192)),
                  wspec((_LG, 1, 64))],
        out_specs=[
            pl.BlockSpec((1, blk, 128),
                         lambda bb, f: (bb, nblk - 1 - f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LG, 3, 64, 64), lambda bb, f: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LG, 1, 64), lambda bb, f: (0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b, nblk * blk, 128), jnp.float32),
            jax.ShapeDtypeStruct((_LG, 3, 64, 64), jnp.float32),
            jax.ShapeDtypeStruct((_LG, 1, 64), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((ll, 128), jnp.bfloat16),
                        pltpu.VMEM((w, 128), jnp.float32),
                        pltpu.VMEM((ll + 2 * _SP, 64), jnp.float32),
                        pltpu.VMEM((_LG, ll, 64), jnp.bfloat16),
                        pltpu.VMEM((w, 64), jnp.float32),
                        pltpu.VMEM((w, 64), jnp.float32),
                        pltpu.VMEM((w, 192), jnp.float32),
                        pltpu.VMEM((_SUM_D, 64), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x_pad, dlog_pad, wk, wkt, bk)


def _pack_weights(kernels, biases):
    """kernels: list of 9 (3, 64, cout) f32 (cout 64, last 1);
    biases: list of 9 (cout,) f32.  Returns (wk, wkt, bk)."""
    wks, wkts, bks = [], [], []
    for ker, bias in zip(kernels, biases):
        if ker.shape[-1] != 64:                 # pad last layer 1 -> 64
            ker = jnp.pad(ker, ((0, 0), (0, 0), (0, 64 - ker.shape[-1])))
            bias = jnp.pad(bias, (0, 64 - bias.shape[0]))
        wks.append(ker)
        wkts.append(jnp.concatenate([ker[0].T, ker[1].T, ker[2].T],
                                    axis=1))
        bks.append(bias[None, :])
    wk = jnp.stack(wks).astype(jnp.bfloat16)          # (9, 3, 64, 64)
    wkt = jnp.stack(wkts).astype(jnp.bfloat16)        # (9, 64, 192)
    bk = jnp.stack(bks).astype(jnp.float32)           # (9, 1, 64)
    return wk, wkt, bk


def _pad_x(x, blk, nblk):
    b, t, c = x.shape
    return jnp.pad(x, ((0, 0), (blk, nblk * blk - t + blk),
                       (0, 128 - c))).astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _disc_apply(static, x, wk, wkt, bk):
    t, blk, nblk, slope, interpret, _vjp = static
    x_pad = _pad_x(x, blk, nblk)
    (out,) = _run_fwd(x_pad, wk, bk, b=x.shape[0], nblk=nblk, t_signal=t,
                      interpret=interpret, save=False, block=blk,
                      slope=slope)
    return out[:, :t, :1]


def _disc_fwd(static, x, wk, wkt, bk):
    t, blk, nblk, slope, interpret, vjp = static
    x_pad = _pad_x(x, blk, nblk)
    if vjp == "recompute":
        # saveless forward; the backward rebuilds the per-layer streams
        # in VMEM from x_pad (see _bwd_rc_kernel)
        (out,) = _run_fwd(x_pad, wk, bk, b=x.shape[0], nblk=nblk,
                          t_signal=t, interpret=interpret, save=False,
                          block=blk, slope=slope)
        return out[:, :t, :1], (x_pad, wk, wkt, bk)
    out, saved = _run_fwd(x_pad, wk, bk, b=x.shape[0], nblk=nblk,
                          t_signal=t, interpret=interpret, save=True,
                          block=blk, slope=slope)
    return out[:, :t, :1], (saved, wkt)


def _disc_bwd(static, res, dlogits):
    t, blk, nblk, slope, interpret, vjp = static
    b = dlogits.shape[0]
    dlog_pad = jnp.pad(dlogits.astype(jnp.float32),
                       ((0, 0), (blk, nblk * blk - t), (0, 127)))
    if vjp == "recompute":
        x_pad, wk, wkt, bk = res
        dx_pad, dwk, dbk = _run_bwd_rc(x_pad, dlog_pad, wk, wkt, bk,
                                       b=b, nblk=nblk, t_signal=t,
                                       interpret=interpret, block=blk,
                                       slope=slope)
    else:
        saved, wkt = res
        # the forward never writes the lead/trail pad blocks of the
        # saved streams: zero them so the backward's halo reads are
        # finite (a masked multiply then suffices — no i1 selects in
        # the kernel)
        zeros_pad = jnp.zeros(saved.shape[:2] + (blk, 128), saved.dtype)
        saved = saved.at[:, :, :blk].set(zeros_pad)
        saved = saved.at[:, :, -blk:].set(zeros_pad)
        dx_pad, dwk, dbk = _run_bwd(saved, dlog_pad, wkt, b=b, nblk=nblk,
                                    t_signal=t, interpret=interpret,
                                    block=blk, slope=slope)
    dx = dx_pad[:, :t, :64]
    zt = jnp.zeros_like
    # wk/wkt/bk are functions of the same kernels; route the whole
    # gradient through wk (the wrapper reconstructs d(kernel) from it)
    return dx, dwk.astype(jnp.float32), zt(wkt, dtype=jnp.float32), dbk


_disc_apply.defvjp(_disc_fwd, _disc_bwd)


def fused_disc_tail(h, kernels, biases, *, negative_slope: float = 0.2,
                    vjp_mode: str = "save"):
    """Fused discriminator layers 1..9: h (B, T, 64) = the XLA layer-0
    output; kernels/biases: 9 effective (weight-norm-folded) (3, 64,
    cout) kernels (cout = 64 x8, then 1).  Returns logits (B, T, 1)
    f32.  Differentiable (custom VJP; bf16 matmul semantics).

    ``vjp_mode='save'`` (default) streams the per-layer inputs to HBM
    in the forward; ``'recompute'`` keeps the forward saveless and
    rebuilds the streams in the backward's VMEM (bitwise-equal grads;
    wins the isolated kernel A/B but loses ~1% at GAN-step level —
    docs/tpu_performance.md round 5)."""
    b, t, c = h.shape
    assert c == 64
    assert vjp_mode in ("recompute", "save"), vjp_mode
    blk = _BLOCK
    nblk = -(-t // blk)
    interpret = jax.default_backend() not in ("tpu", "axon")
    wk, wkt, bk = _pack_weights(kernels, biases)
    # d(kernels) flows through _pack_weights automatically: the VJP
    # below yields packed-space dwk/dbk (and zero for the
    # backward-only wkt, whose value the function ignores), and XLA
    # transposes the stack/concat/pad packing
    static = (t, blk, nblk, float(negative_slope), interpret, vjp_mode)
    return _disc_apply(static, h.astype(jnp.float32), wk, wkt, bk)

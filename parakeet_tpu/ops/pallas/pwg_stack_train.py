"""Differentiable fused Parallel-WaveGAN residual stack (custom VJP).

Training the PWG generator in XLA rematerializes each gated layer
(models/parallel_wavegan.py:365), so a train step pays ~3 full-rate HBM
round-trips per layer (forward, recompute, backward) over 30 layers —
the measured 12% MFU bottleneck (docs/tpu_performance.md).  This module
gives the fused inference kernel (pwg_stack.py) a hand-written VJP so
the whole stack trains out of VMEM:

- **forward**: the inference group kernel *with saving*
  (pwg_stack._group_save_kernel): alongside x_next/skips it streams
  every layer's bf16 input rows (exactly the operand dtype the matmuls
  consume) to HBM -- one extra VMEM->HBM write per layer, ~free next
  to the matmuls.  Residual footprint: Lg * (B, T, 128) bf16 per group
  (all groups live until the backward) -- ~0.5 GB/group at the bs6
  reference point, far below the 30 full-rate fp32 gate tensors that
  forced remat in the XLA path.  Round 2 ran a separate *save pass*
  (recompute-in-backward) instead; folding it into the forward removed
  one full group forward per group from every training step.
- **backward**, per group, ONE reverse-grid kernel: the forward kernel
  kills its left halo with carried layer-input tails; the transpose
  needs d(left-tap) rows from the *next* block, so the backward kernel
  carries per-layer tails of ``dtaps_left`` across grid steps (exact,
  no halo) and pays a redundant LEFT halo of sum(dilations) rows
  instead (mirror image of the forward).  Gates are recomputed from
  the saved streams; weight gradients accumulate across the whole grid
  directly in revisited output blocks (VMEM resident, flushed once);
  dx/dc center blocks write per step.

Gradient semantics: this is the exact transpose of what the fused
kernel computes (bf16 matmuls, fp32 accumulation, fp32 residual/skip
streams), i.e. gradients OF the bf16 forward — not bf16 approximations
of the fp32 XLA gradients.  Grad-parity tests vs the XLA path therefore
carry the same ~bf16 tolerances as the forward parity tests.

Reference math being differentiated: parakeet/models/parallel_wavegan/
parallel_wavegan.py:144-316 (residual block) — upstream WaveNet gated
conv with skip/residual 1x1s and the sqrt(0.5) residual scaling.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pwg_stack as _ps

__all__ = ["fused_residual_stack_train", "fused_stack_train_supported"]

_BWD_BLOCK = 4096    # backward center rows per grid step; 4096 halves
                     # the redundant left halo (sum(dils)=1023 rows)
                     # vs 2048 — measured +3% step throughput


def fused_stack_train_supported(residual_channels: int, gate_channels: int,
                                skip_channels: int, kernel_size: int,
                                layers: int, stacks: int,
                                aux_channels: int = 80) -> bool:
    if not _ps.fused_stack_supported(residual_channels, gate_channels,
                                     skip_channels, kernel_size, layers,
                                     stacks, aux_channels=aux_channels):
        return False
    per = layers // stacks
    halo_needed = sum(2 ** (i % per) for i in range(layers)) // stacks
    # backward windows read the saved streams at lead _BLOCK, which must
    # cover halo+slack; the reverse grid tiles _BLOCK-aligned rows
    return (_ps._BLOCK % _BWD_BLOCK == 0
            and halo_needed + _ps._SLACK <= _ps._BLOCK
            and _ps._HALO <= _BWD_BLOCK)


def _bwd_kernel(saved_hbm, c_hbm, dxo_hbm, dsk_hbm,
                w02, w1, wa, w02t, w1t, wat, wsot,
                dx_out, dc_out, dw02, dw1, dwa, dwso, dbso,
                xdma, xf, cdma, dxob, dskb, dxc, dresb, dsob,
                tapsb, dgb, dtl, dtr, dxlb, dcacc, tails,
                sem_x, sem_c, sem_g, sem_s,
                *, dils, cr: int, ca: int, t_signal: int,
                block: int, halo: int, slack: int, nblk: int,
                lead_x: int, lead_sv: int, lead_sk: int):
    """Reverse-grid transpose of the group forward.

    Window = [k*block - halo, k*block + block) (LEFT halo; the right
    boundary is exact via carried per-layer tails of dtaps_left).  The
    saved layer streams are read with an extra +-slack extension for the
    gate recompute's +-d taps.  Validity shrinks from the LEFT by d per
    layer (halo >= sum(dils) covers the full group); center rows are
    always exact.  dgb rows outside the window are zeroed so dtaps slack
    reads contribute exactly the true zero gradient of non-existent /
    out-of-signal rows.  Weight grads accumulate over center rows only
    (each signal row is center in exactly one block) into the revisited
    output blocks; dbso likewise via fp32 row-sums.
    """
    w = block + halo                 # window rows that matter
    xwn = w + 2 * slack              # saved-stream window (+-d reads)
    bb = pl.program_id(0)
    f = pl.program_id(1)
    k = nblk - 1 - f                 # reverse time order
    win0 = k * block - halo

    cp_c = pltpu.make_async_copy(
        c_hbm.at[bb, pl.ds(lead_x + win0, w)], cdma, sem_c)
    cp_g = pltpu.make_async_copy(
        dxo_hbm.at[bb, pl.ds(lead_x + win0, w)], dxob, sem_g)
    cp_s = pltpu.make_async_copy(
        dsk_hbm.at[bb, pl.ds(lead_sk + win0, w)], dskb, sem_s)
    cp_c.start()
    cp_g.start()
    cp_s.start()

    @pl.when(f == 0)
    def _():
        tails[:] = jnp.zeros_like(tails)

    @pl.when(jnp.logical_and(bb == 0, f == 0))
    def _():
        dw02[:] = jnp.zeros_like(dw02)
        dw1[:] = jnp.zeros_like(dw1)
        dwa[:] = jnp.zeros_like(dwa)
        dwso[:] = jnp.zeros_like(dwso)
        dbso[:] = jnp.zeros_like(dbso)

    rows_w = win0 + jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    valid_w = jnp.logical_and(rows_w >= 0, rows_w < t_signal)
    m = jnp.where(valid_w, math.sqrt(0.5), 0.0)          # (w, 1) f32
    rows_x = (win0 - slack
              + jax.lax.broadcasted_iota(jnp.int32, (xwn, 1), 0))
    valid_x = jnp.logical_and(rows_x >= 0, rows_x < t_signal)

    cp_c.wait()
    cp_g.wait()
    cp_s.wait()
    cdma[:, ca:ca + 1] = jnp.ones((w, 1), jnp.bfloat16)
    cb = cdma[:, :ca + 1]
    dxob[:] = jnp.where(valid_w, dxob[:], 0.0)
    dskb[:] = jnp.where(valid_w, dskb[:], 0.0)
    dxc[:] = dxob[:, :cr]
    dgb[:] = jnp.zeros_like(dgb)
    dtl[:] = jnp.zeros_like(dtl)
    dtr[:] = jnp.zeros_like(dtr)
    dcacc[:] = jnp.zeros_like(dcacc)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def dot_rows(a, b):              # contraction over rows: a^T @ b
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    ctr = slice(halo, halo + block)          # center in w coords
    ctg = slice(slack + halo, slack + halo + block)  # center in xwn coords
    offs = []
    o = 0
    for d in dils:
        offs.append(o)
        o += d

    for j in range(len(dils) - 1, -1, -1):
        d = dils[j]
        off = offs[j]
        # saved layer-j input stream, [win0 - slack, win0 + w + slack)
        cp_x = pltpu.make_async_copy(
            saved_hbm.at[bb, j, pl.ds(lead_sv + win0 - slack, xwn)],
            xdma, sem_x)
        cp_x.start()

        dresb[:] = dxc[:] * m                     # d(res) and dx-residual
        dsob[:] = jnp.concatenate(
            [dskb[:, :cr], dresb[:]], axis=1).astype(jnp.bfloat16)

        cp_x.wait()
        xf[:] = jnp.where(valid_x, xdma[:, :cr].astype(jnp.float32), 0.0)

        # recompute the gate exactly as the forward computed it
        xc = xf[slack:slack + w].astype(jnp.bfloat16)
        left = xf[slack - d:slack - d + w].astype(jnp.bfloat16)
        right = xf[slack + d:slack + d + w].astype(jnp.bfloat16)
        tapsb[:] = jnp.concatenate([left, right], axis=1)
        g = dot(tapsb[:], w02[j]) + dot(xc, w1[j]) + dot(cb, wa[j])
        ta = jnp.tanh(g[:, :cr])
        sb = jax.nn.sigmoid(g[:, cr:])

        dh = dot(dsob[:], wsot[j])                         # (w, cr) f32
        da = dh * sb * (1.0 - ta * ta)
        db = dh * ta * sb * (1.0 - sb)
        dgb[slack:slack + w] = jnp.concatenate(
            [da, db], axis=1).astype(jnp.bfloat16)
        dgc = dgb[slack + halo:slack + halo + block]

        # input gradient: dx = dg@w1^T + shift(dtapsL,+d) + shift(dtapsR,-d)
        dt = dot(dgb[slack:slack + w], w02t[j])
        dtl[slack:slack + w] = dt[:, :cr]
        dtr[slack:slack + w] = dt[:, cr:]
        dx1 = dot(dgb[slack:slack + w], w1t[j])
        dxlb[:] = dtl[slack + d:slack + d + w]
        # the last d center rows read dtapsL of the NEXT block — carried
        dxlb[w - d:w] = tails[off:off + d]
        tails[off:off + d] = dtl[slack + halo:slack + halo + d]
        dxr = dtr[slack - d:slack - d + w]
        dxc[:] = dx1 + dxlb[:] + dxr + dresb[:]

        # conditioning gradient (center rows; summed over layers)
        dcacc[:] = dcacc[:] + dot(dgc, wat[j])

        # weight gradients over center rows only
        dwso[j] = dwso[j] + dot_rows(
            (ta[ctr] * sb[ctr]).astype(jnp.bfloat16), dsob[ctr])
        dw02[j] = dw02[j] + dot_rows(tapsb[ctr], dgc)
        dw1[j] = dw1[j] + dot_rows(xf[ctg].astype(jnp.bfloat16), dgc)
        dwa[j] = dwa[j] + dot_rows(cb[ctr], dgc)
        dbso[j] = dbso[j] + jnp.concatenate(
            [jnp.sum(dskb[ctr, :cr], axis=0, keepdims=True),
             jnp.sum(dresb[ctr], axis=0, keepdims=True)], axis=1)

    maskc = jnp.where(valid_w[ctr], 1.0, 0.0)
    dxv = dxc[ctr] * maskc
    if cr < 128:
        dxv = jnp.concatenate(
            [dxv, jnp.zeros((block, 128 - cr), jnp.float32)], axis=1)
    dx_out[0] = dxv
    dc_out[0] = dcacc[:]


def _run_bwd(saved, c_pad, dxo_pad, dsk_pad, wg, dils, *, b, n_rows,
             cr, ca, t_signal, lead_x, interpret):
    """Returns (dx_pad, dc_pad, dw02, dw1, dwa, dwso, dbso)."""
    lg = len(dils)
    blk = _BWD_BLOCK
    nblk = n_rows // blk
    halo, slack = _ps._HALO, _ps._SLACK
    w = blk + halo
    xwn = w + 2 * slack
    sum_d = int(sum(dils))
    w02, w1, wa, wso, _bso = wg
    w02t = jnp.swapaxes(w02, 1, 2)
    w1t = jnp.swapaxes(w1, 1, 2)
    wsot = jnp.swapaxes(wso, 1, 2)
    wat = jnp.swapaxes(wa, 1, 2)                        # (Lg, 2cr, ca+1)
    wat = jnp.pad(wat, ((0, 0), (0, 0), (0, 128 - (ca + 1))))
    lead_blk = lead_x // blk

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, f: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    t_pad = c_pad.shape[1]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, dils=tuple(dils), cr=cr, ca=ca,
                          t_signal=t_signal, block=blk, halo=halo,
                          slack=slack, nblk=nblk, lead_x=lead_x,
                          lead_sv=lead_x, lead_sk=lead_x),
        grid=(b, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [
            wspec((lg, 2 * cr, 2 * cr)), wspec((lg, cr, 2 * cr)),
            wspec((lg, ca + 1, 2 * cr)), wspec((lg, 2 * cr, 2 * cr)),
            wspec((lg, 2 * cr, cr)), wspec((lg, 2 * cr, 128)),
            wspec((lg, 2 * cr, cr))],
        out_specs=[
            pl.BlockSpec((1, blk, 128),
                         lambda bb, f: (bb, lead_blk + nblk - 1 - f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 128),
                         lambda bb, f: (bb, lead_blk + nblk - 1 - f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lg, 2 * cr, 2 * cr), lambda bb, f: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lg, cr, 2 * cr), lambda bb, f: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lg, ca + 1, 2 * cr), lambda bb, f: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lg, cr, 2 * cr), lambda bb, f: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lg, 1, 2 * cr), lambda bb, f: (0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((lg, 2 * cr, 2 * cr), jnp.float32),
            jax.ShapeDtypeStruct((lg, cr, 2 * cr), jnp.float32),
            jax.ShapeDtypeStruct((lg, ca + 1, 2 * cr), jnp.float32),
            jax.ShapeDtypeStruct((lg, cr, 2 * cr), jnp.float32),
            jax.ShapeDtypeStruct((lg, 1, 2 * cr), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((xwn, 128), jnp.bfloat16),   # xdma
                        pltpu.VMEM((xwn, cr), jnp.float32),     # xf
                        pltpu.VMEM((w, 128), jnp.bfloat16),     # cdma
                        pltpu.VMEM((w, 128), jnp.float32),      # dxob
                        pltpu.VMEM((w, 128), jnp.float32),      # dskb
                        pltpu.VMEM((w, cr), jnp.float32),       # dxc
                        pltpu.VMEM((w, cr), jnp.float32),       # dresb
                        pltpu.VMEM((w, 2 * cr), jnp.bfloat16),  # dsob
                        pltpu.VMEM((w, 2 * cr), jnp.bfloat16),  # tapsb
                        pltpu.VMEM((xwn, 2 * cr), jnp.bfloat16),  # dgb
                        pltpu.VMEM((xwn, cr), jnp.float32),     # dtl
                        pltpu.VMEM((xwn, cr), jnp.float32),     # dtr
                        pltpu.VMEM((w, cr), jnp.float32),       # dxlb
                        pltpu.VMEM((blk, 128), jnp.float32),    # dcacc
                        pltpu.VMEM((sum_d, cr), jnp.float32),   # tails
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(saved, c_pad, dxo_pad, dsk_pad, w02, w1, wa, w02t, w1t, wat, wsot)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _group_apply(static, x_pad, c_pad, w02, w1, wa, wso, bso):
    """One differentiable group.  x_pad/c_pad are fp32 in the forward
    padded layout; weights fp32 in the kernel's stacked shapes.  Returns
    (x_pad_next fp32, skips fp32 (B, n_rows, cr)).

    This primal body runs WITHOUT stream-saving — it executes only when
    the call is not differentiated (e.g. the GAN updater's
    stop-gradient'd fake regeneration); under jax.grad the custom-vjp
    machinery runs :func:`_group_fwd` (save=True) instead."""
    dils, b, nblk_f, cr, ca, t, interpret = static
    x_next, skips = _ps._run_group(
        x_pad.astype(jnp.bfloat16), c_pad.astype(jnp.bfloat16),
        _cast_wg(w02, w1, wa, wso, bso), dils, b=b, nblk=nblk_f, cr=cr,
        ca=ca, t_signal=t, interpret=interpret)
    return (x_next.astype(jnp.float32), skips)


def _cast_wg(w02, w1, wa, wso, bso):
    return (w02.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
            wa.astype(jnp.bfloat16), wso.astype(jnp.bfloat16),
            bso.astype(jnp.float32))


def _group_fwd(static, x_pad, c_pad, w02, w1, wa, wso, bso):
    dils, b, nblk_f, cr, ca, t, interpret = static
    x_bf = x_pad.astype(jnp.bfloat16)
    c_bf = c_pad.astype(jnp.bfloat16)
    wg = _cast_wg(w02, w1, wa, wso, bso)
    # forward-with-save: the group kernel also streams every layer's
    # bf16 input rows to HBM (one extra VMEM->HBM write per layer,
    # ~free next to the matmuls), so the backward needs no recompute
    # pass — measured 7% faster steps than the round-2
    # save-pass-in-backward design at the reference bs6 point
    x_next, skips, saved = _ps._run_group(
        x_bf, c_bf, wg, dils, b=b, nblk=nblk_f, cr=cr, ca=ca,
        t_signal=t, interpret=interpret, save=True)
    return ((x_next.astype(jnp.float32), skips), (saved, c_bf, wg))


def _group_bwd(static, res, cts):
    dils, b, nblk_f, cr, ca, t, interpret = static
    saved, c_bf, wg = res
    dx_next, dskips = cts
    lead_x = _ps._BLOCK
    n_rows = nblk_f * _ps._BLOCK

    # skip grads into the forward padded layout (lead _BLOCK, matching
    # the saved streams' lead)
    dsk_pad = jnp.pad(
        dskips.astype(jnp.float32),
        ((0, 0), (lead_x, lead_x), (0, 128 - cr)))
    dxo_pad = dx_next.astype(jnp.float32)
    dx, dc, dw02, dw1, dwa, dwso, dbso = _run_bwd(
        saved, c_bf, dxo_pad, dsk_pad, wg, dils, b=b, n_rows=n_rows,
        cr=cr, ca=ca, t_signal=t, lead_x=lead_x, interpret=interpret)
    return (dx, dc, dw02, dw1, dwa, dwso, dbso)


_group_apply.defvjp(_group_fwd, _group_bwd)


def fused_residual_stack_train(x, c, weights, *, dilations, stacks):
    """Differentiable twin of pwg_stack.fused_residual_stack.

    x: (B, T, cr) fp32, c: (B, T, ca) fp32, weights: the ResidualStack
    effective-weight dict (fp32; weight-norm folding happens OUTSIDE and
    differentiates through XLA).  Returns (x_final fp32, skips fp32).
    """
    b, t, cr = x.shape
    ca = c.shape[-1]
    l = weights["conv"].shape[0]
    lg = l // stacks

    conv = weights["conv"].astype(jnp.float32)
    w02 = jnp.concatenate([conv[:, 0], conv[:, 2]], axis=1)
    w1 = conv[:, 1]
    zeros_g = jnp.zeros((l, 1, 2 * cr), jnp.float32)
    bt_row = (zeros_g if weights.get("conv_b") is None
              else weights["conv_b"][:, None, :].astype(jnp.float32))
    wa = jnp.concatenate([weights["aux"].astype(jnp.float32), bt_row],
                         axis=1)
    wso = jnp.concatenate([weights["skip"], weights["out"]],
                          axis=2).astype(jnp.float32)
    if weights.get("skip_b") is None:
        bso = zeros_g
    else:
        bso = jnp.concatenate(
            [weights["skip_b"], weights["out_b"]],
            axis=1)[:, None, :].astype(jnp.float32)

    blk = _ps._BLOCK
    nblk = -(-t // blk)
    interpret = jax.default_backend() not in ("tpu", "axon")

    def pad_sig(a):
        a = jnp.pad(a, ((0, 0), (blk, nblk * blk - t + blk),
                        (0, 128 - a.shape[-1])))
        return a.astype(jnp.float32)

    c_pad = pad_sig(c)
    x_pad = pad_sig(x)
    skips = None
    for g in range(stacks):
        sl = slice(g * lg, (g + 1) * lg)
        static = (tuple(dilations[sl]), b, nblk, cr, ca, t, interpret)
        x_pad, sk = _group_apply(static, x_pad, c_pad, w02[sl], w1[sl],
                                 wa[sl], wso[sl], bso[sl])
        skips = sk if skips is None else skips + sk
    return x_pad[:, blk:blk + t, :cr], skips[:, :t]

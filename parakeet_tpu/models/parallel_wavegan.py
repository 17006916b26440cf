"""Parallel WaveGAN vocoder (generator + discriminators), TPU-native.

Behavioral equivalent of the reference (reference:
parakeet/models/parallel_wavegan/parallel_wavegan.py:26-790): a WaveNet-like
non-causal generator conditioned on upsampled mel, a dilated-conv
discriminator, and a residual (WaveNet-style) discriminator.  TPU-first
choices:

- Dilated convs are *shifted matmuls* (``conv1d_taps``): the time axis is
  the MXU row dimension, each tap is a (T, Cin) @ (Cin, Cout) matmul on a
  statically shifted view.  XLA's generic conv lowering handles the
  batch=1 / tiny-channel / quarter-million-sample shapes of vocoder
  inference poorly (measured ~2x slower than this formulation, and it
  also unlocks the fused Pallas path below).
- The residual stack stores its parameters *stacked over layers*
  ``(L, ...)`` so the whole 30-layer stack can be handed to one fused
  Pallas kernel (ops/pallas/pwg_stack.py) that keeps activations in VMEM
  across layers instead of round-tripping (T, C) tensors through HBM per
  conv.  ``impl='xla'`` keeps the pure-XLA shifted-matmul path
  (differentiable; used for training and on CPU).
- Nearest-upsample + FIR smoothing (reference UpsampleNet,
  parallel_wavegan.py:26-141) is computed *polyphase at frame rate*:
  nearest-stretch by s followed by a (2s+1)-tap FIR equals, per output
  phase r, a 3-tap combination of neighboring input frames.  The
  upsampled signal is never materialized before the final reshape.
- weight normalization is an explicit (kernel, scale) parameterization
  (effective = scale * kernel / ||kernel||, matching flax WeightNorm and
  the reference's paddle weight_norm, parallel_wavegan.py:474-496);
  folding for inference is a no-op cost (norms are over tiny kernels).
- generation is a single jit-compiled graph over a static number of
  frames; noise is passed explicitly (functional RNG).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PWGGenerator", "PWGDiscriminator", "ResidualPWGDiscriminator",
           "pwg_inference", "pwg_streaming_inference", "conv1d_taps",
           "WNConv1d", "ResidualStack"]

_WN_EPS = 1e-12


def _wn(kernel: jnp.ndarray, scale: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Weight norm over all axes but the last: scale * k / ||k||."""
    if scale is None:
        return kernel
    axes = tuple(range(kernel.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(kernel), axis=axes, keepdims=True)
                    + _WN_EPS)
    return kernel * (scale / norm)


from ..ops.geometry import time_shift as _shift  # noqa: E402


def conv1d_taps(x: jnp.ndarray, kernel: jnp.ndarray, dilation: int = 1,
                padding: str = "SAME",
                dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Dilated 1-D conv as k shifted matmuls (MXU-friendly on TPU).

    x: (B, T, Cin); kernel: (k, Cin, Cout).  SAME is zero-padded and
    requires odd k; VALID returns T - (k-1)*dilation frames.  Accumulates
    in fp32, returns ``dtype``.
    """
    k = kernel.shape[0]
    xd = x.astype(dtype)
    wd = kernel.astype(dtype)
    acc = None
    if padding == "SAME":
        assert k % 2 == 1, "SAME padding requires odd kernel size"
        c = k // 2
        for j in range(k):
            y = jnp.dot(_shift(xd, (j - c) * dilation), wd[j],
                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    elif padding == "VALID":
        out_t = x.shape[1] - (k - 1) * dilation
        for j in range(k):
            y = jnp.dot(xd[:, j * dilation:j * dilation + out_t], wd[j],
                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    elif padding == "CAUSAL":
        # y[t] = sum_j x[t - (k-1-j)*d] w[j]; left zero-pad only
        for j in range(k):
            y = jnp.dot(_shift(xd, (j - (k - 1)) * dilation), wd[j],
                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    else:
        raise ValueError(f"unsupported padding {padding!r}")
    return acc.astype(dtype)


class WNConv1d(nn.Module):
    """Weight-normalized dilated Conv1D via shifted matmuls (NWC)."""
    features: int
    kernel_size: int = 1
    dilation: int = 1
    padding: str = "SAME"
    use_bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        """``return_weights=True`` creates the (identical) params and
        returns the effective (weight-norm-folded) kernel and bias
        instead of convolving — fused kernels (ops/pallas/pwg_disc.py)
        consume the materialized weights directly; ``x`` then only
        supplies the input channel count."""
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(
            in_axis=-2, out_axis=-1), (self.kernel_size, cin, self.features))
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,)) if self.use_weight_norm else None
        eff = _wn(kernel, scale)
        if return_weights:
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,)) if self.use_bias
                    else jnp.zeros((self.features,), jnp.float32))
            return eff, bias
        y = conv1d_taps(x, eff, self.dilation, self.padding,
                        self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def _phase_masks(scale: int, causal: bool = False) -> np.ndarray:
    """Static (3, 2*scale+1, scale) masks: masks[m, j, r] == 1 iff FIR tap
    j of output phase r reads input frame n + (m - off/scale) after
    nearest-stretch by ``scale``.  Centered FIR (off = scale): frames
    n-1..n+1.  Causal FIR (off = 2*scale, reference's left-padded Conv2D,
    parallel_wavegan.py:107-137): frames n-2..n."""
    kt = 2 * scale + 1
    off = 2 * scale if causal else scale
    masks = np.zeros((3, kt, scale), np.float32)
    for r in range(scale):
        for j in range(kt):
            m = (r + j - off) // scale
            masks[m + (1 if not causal else 2), j, r] = 1.0
    return masks


class UpsampleNet(nn.Module):
    """Polyphase nearest-stretch + FIR; mel (B, N, F) -> (B, N*prod, F).

    Equals the reference's repeat-then-Conv2D(2s+1, kf) per scale
    (parallel_wavegan.py:26-66) but computed at frame rate: for each
    output phase the FIR collapses to a 3-tap combination of neighboring
    input frames, so the stretched signal is never materialized before
    the final reshape.
    """
    upsample_scales: Sequence[int]
    freq_axis_kernel_size: int = 1
    use_weight_norm: bool = True
    nonlinear_activation: Optional[str] = None
    nonlinear_activation_params: Dict[str, Any] = None
    interpolate_mode: str = "nearest"
    use_causal_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        if self.interpolate_mode != "nearest":
            raise NotImplementedError(
                "only interpolate_mode='nearest' is supported (the "
                "reference default; all released configs use it)")
        x = c.astype(self.dtype)
        kf = self.freq_axis_kernel_size
        assert kf % 2 == 1, "freq_axis_kernel_size must be odd"
        for i, s in enumerate(self.upsample_scales):
            kt = 2 * s + 1
            kernel = self.param(f"conv_{i}_kernel",
                                nn.initializers.lecun_normal(
                                    in_axis=-2, out_axis=-1),
                                (kt, kf, 1, 1))[..., 0, 0]
            if self.use_weight_norm:
                scale = self.param(f"conv_{i}_scale", nn.initializers.ones,
                                   (1,))
                w = _wn(kernel.reshape(-1, 1), scale).reshape(kt, kf)
            else:
                w = kernel
            w = w.astype(self.dtype)
            # K[m] (kt x kf -> s x kf): per-phase weights for frame n+m-1
            masks = jnp.asarray(_phase_masks(s, self.use_causal_conv),
                                self.dtype)
            base = -2 if self.use_causal_conv else -1
            b, n, f = x.shape
            if kf == 1:
                # dense phase matmul (the released-config case): the
                # per-phase 3-tap comb is one (n, 3f) @ (3f, s*f) dot
                # with weights K (x) I_f, writing the upsampled signal
                # ONCE.  The broadcast formulation below materializes
                # each (n, s, f) tap product separately — measured
                # ~2.7 ms of pure HBM layout traffic (3 broadcasts +
                # 3 relayout reshapes + 1 add) at the 11 s headline
                # shape vs ~0.5 ms for this path.
                km_all = jnp.einsum("mjr,j->mr", masks, w[:, 0])  # (3, s)
                xs = jnp.concatenate(
                    [_shift(x, m + base) for m in range(3)], axis=-1)
                wmat = jnp.reshape(
                    jnp.einsum("mr,fg->mfrg", km_all,
                               jnp.eye(f, dtype=self.dtype)),
                    (3 * f, s * f))
                y = jnp.dot(xs, wmat,
                            preferred_element_type=jnp.float32)
                x = y.reshape(b, n * s, f).astype(self.dtype)
            else:
                y = jnp.zeros((b, n, s, f), self.dtype)
                for m in range(3):
                    km = jnp.einsum("jr,ji->ri", masks[m], w)  # (s, kf)
                    xm = _shift(x, m + base)
                    for fi in range(kf):
                        foff = fi - kf // 2
                        if foff == 0:
                            xs = xm
                        elif foff > 0:
                            xs = jnp.concatenate(
                                [xm[:, :, foff:],
                                 jnp.zeros((b, n, foff), self.dtype)], 2)
                        else:
                            xs = jnp.concatenate(
                                [jnp.zeros((b, n, -foff), self.dtype),
                                 xm[:, :, :foff]], 2)
                        y = y + (xs[:, :, None, :]
                                 * km[None, None, :, fi:fi + 1])
                x = y.reshape(b, n * s, f)
            if self.nonlinear_activation is not None:
                # accept paddle class names from reference configs
                name = {"leakyrelu": "leaky_relu", "prelu": "leaky_relu"}\
                    .get(self.nonlinear_activation.lower(),
                         self.nonlinear_activation.lower())
                act = getattr(nn, name, None) or getattr(jax.nn, name)
                x = act(x, **(self.nonlinear_activation_params or {}))
        return x


class ConvInUpsampleNet(nn.Module):
    """Context conv (VALID, trims 2*aux_context_window) then UpsampleNet.

    Input mel must carry ``aux_context_window`` extra frames on both sides
    (the VocoderClip collator provides them).
    """
    upsample_scales: Sequence[int]
    aux_channels: int = 80
    aux_context_window: int = 2
    freq_axis_kernel_size: int = 1
    use_weight_norm: bool = True
    nonlinear_activation: Optional[str] = None
    nonlinear_activation_params: Dict[str, Any] = None
    interpolate_mode: str = "nearest"
    use_causal_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        w = self.aux_context_window
        causal = self.use_causal_conv and w > 0
        if causal:
            # k = w+1 past-only taps; frame i reads c[i..i+w] of the
            # collator's w-frame-left-padded input (reference
            # parallel_wavegan.py:183-215)
            n_out = c.shape[1] - 2 * w
            c = WNConv1d(self.aux_channels, w + 1, padding="VALID",
                         use_bias=False,
                         use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="conv_in")(c)[:, :n_out]
        else:
            c = WNConv1d(self.aux_channels, 2 * w + 1, padding="VALID",
                         use_bias=False,
                         use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="conv_in")(c)
        return UpsampleNet(
            self.upsample_scales, self.freq_axis_kernel_size,
            self.use_weight_norm,
            nonlinear_activation=self.nonlinear_activation,
            nonlinear_activation_params=self.nonlinear_activation_params,
            interpolate_mode=self.interpolate_mode,
            use_causal_conv=self.use_causal_conv,
            dtype=self.dtype, name="upsample")(c)


def _stacked_lecun(in_axis=-2, out_axis=-1):
    return nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal", in_axis=in_axis, out_axis=out_axis,
        batch_axis=(0,))


class ResidualStack(nn.Module):
    """L gated dilated-conv residual blocks with layer-stacked parameters.

    Equivalent to L chained reference ResidualBlocks
    (parallel_wavegan.py:144-316): per layer
    ``gate = conv_d(x) + aux(c); h = tanh(a)*sigmoid(b);
    skip += skip_conv(h); x = (out_conv(h) + x) * sqrt(0.5)``.
    Returns (x_final, skip_sum) — callers apply the sqrt(1/L) skip scale.

    Parameters are stacked ``(L, ...)`` so the fused Pallas TPU kernel can
    consume them directly; ``impl`` selects 'xla' (shifted matmuls,
    differentiable, any backend), 'pallas' (fused TPU kernel — custom-VJP
    differentiable when dropout == 0, see ops/pallas/pwg_stack_train.py),
    or 'auto' (fused forward on TPU, XLA elsewhere and under grad).
    """
    layers: int = 30
    stacks: int = 3
    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: Optional[int] = 80
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"

    def dilations(self):
        per = self.layers // self.stacks
        return tuple(2 ** (i % per) for i in range(self.layers))

    @nn.compact
    def __call__(self, x, c=None, *, deterministic: bool = True):
        L, k = self.layers, self.kernel_size
        cr, cg, cs = (self.residual_channels, self.gate_channels,
                      self.skip_channels)
        half = cg // 2
        wn = self.use_weight_norm

        def p(name, shape, init=None):
            return self.param(name, init or _stacked_lecun(), shape)

        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        conv_k = p("conv_kernel", (L, k, cr, cg))
        conv_s = p("conv_scale", (L, cg), ones) if wn else None
        conv_b = p("conv_bias", (L, cg), zeros) if self.bias else None
        if c is not None and self.aux_channels is not None:
            aux_k = p("aux_kernel", (L, self.aux_channels, cg))
            aux_s = p("aux_scale", (L, cg), ones) if wn else None
        else:
            aux_k = aux_s = None
        skip_k = p("skip_kernel", (L, half, cs))
        skip_s = p("skip_scale", (L, cs), ones) if wn else None
        skip_b = p("skip_bias", (L, cs), zeros) if self.bias else None
        out_k = p("out_kernel", (L, half, cr))
        out_s = p("out_scale", (L, cr), ones) if wn else None
        out_b = p("out_bias", (L, cr), zeros) if self.bias else None

        dil = self.dilations()
        dt = self.dtype

        from ..ops.pallas.pwg_stack import (fused_residual_stack,
                                            fused_stack_supported)
        supported = (c is not None and self.aux_channels is not None
                     and not self.use_causal_conv
                     and fused_stack_supported(
                         cr, cg, cs, k, L, self.stacks,
                         aux_channels=self.aux_channels))
        use_pallas = False
        use_pallas_train = False
        if self.impl == "pallas":
            if not supported:
                raise ValueError("fused pallas stack unsupported for this "
                                 "ResidualStack configuration")
            if deterministic:
                use_pallas = True
            else:
                from ..ops.pallas.pwg_stack_train import (
                    fused_stack_train_supported)
                if self.dropout != 0.0:
                    raise ValueError(
                        "impl='pallas' training has no dropout path; use "
                        "impl='xla' (or 'auto') when dropout > 0")
                if not fused_stack_train_supported(
                        cr, cg, cs, k, L, self.stacks,
                        aux_channels=self.aux_channels):
                    raise ValueError("fused pallas train stack unsupported "
                                     "for this configuration")
                use_pallas_train = True
        elif self.impl == "auto":
            use_pallas = (deterministic and supported
                          and jax.default_backend() in ("tpu", "axon"))
        if use_pallas or use_pallas_train:
            weights = dict(
                conv=jax.vmap(_wn)(conv_k, conv_s) if wn else conv_k,
                aux=jax.vmap(_wn)(aux_k, aux_s) if wn else aux_k,
                skip=jax.vmap(_wn)(skip_k, skip_s) if wn else skip_k,
                out=jax.vmap(_wn)(out_k, out_s) if wn else out_k,
                conv_b=conv_b, skip_b=skip_b, out_b=out_b)
            if use_pallas_train:
                from ..ops.pallas.pwg_stack_train import (
                    fused_residual_stack_train)
                xf, skips = fused_residual_stack_train(
                    x.astype(jnp.float32), c.astype(jnp.float32), weights,
                    dilations=dil, stacks=self.stacks)
                return xf.astype(dt), skips
            xf, skips = fused_residual_stack(x, c, weights, dilations=dil,
                                             stacks=self.stacks)
            return xf.astype(dt), skips

        drop = nn.Dropout(self.dropout)
        skips = jnp.zeros(x.shape[:2] + (cs,), jnp.float32)
        x = x.astype(dt)
        cdt = None if c is None else c.astype(dt)

        def layer_body(xi, x, skips, cdt, wl, *, d):
            """One gated residual layer as a pure function of its layer-
            sliced weights; rematerialized under grad in training so the
            backward pass does not keep L full-rate gate activations live
            (30 layers x (B, T, 2cr) fp32 OOMs HBM at the reference's
            batch-26 benchmark point)."""
            ck, cb_, ak, sk, sb_, ok, ob_ = wl
            pad = "CAUSAL" if self.use_causal_conv else "SAME"
            g = conv1d_taps(xi, ck, d, pad, dt).astype(jnp.float32)
            if cb_ is not None:
                g = g + cb_
            if ak is not None:
                g = g + jnp.dot(cdt, ak.astype(dt),
                                preferred_element_type=jnp.float32)
            a, b = g[..., :half], g[..., half:]
            h = (jnp.tanh(a) * jax.nn.sigmoid(b)).astype(dt)
            s = jnp.dot(h, sk.astype(dt),
                        preferred_element_type=jnp.float32)
            if sb_ is not None:
                s = s + sb_
            o = jnp.dot(h, ok.astype(dt),
                        preferred_element_type=jnp.float32)
            if ob_ is not None:
                o = o + ob_
            x = ((o + x.astype(jnp.float32)) * math.sqrt(0.5)).astype(dt)
            return x, skips + s

        for i in range(L):
            xi = drop(x, deterministic=deterministic)
            wl = (_wn(conv_k[i], None if conv_s is None else conv_s[i]),
                  None if conv_b is None else conv_b[i],
                  None if aux_k is None else
                  _wn(aux_k[i], None if aux_s is None else aux_s[i]),
                  _wn(skip_k[i], None if skip_s is None else skip_s[i]),
                  None if skip_b is None else skip_b[i],
                  _wn(out_k[i], None if out_s is None else out_s[i]),
                  None if out_b is None else out_b[i])
            body = functools.partial(layer_body, d=dil[i])
            if not deterministic:
                body = jax.checkpoint(body, static_argnums=())
            x, skips = body(xi, x, skips, cdt, wl)
        return x, skips


class PWGGenerator(nn.Module):
    """noise (B, T, 1) + mel (B, T', aux) -> waveform (B, T, 1).

    T = (T' - 2 * aux_context_window) * prod(upsample_scales).
    """
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    upsample_scales: Sequence[int] = (4, 4, 4, 4)
    interpolate_mode: str = "nearest"
    freq_axis_kernel_size: int = 1
    nonlinear_activation: Optional[str] = None
    nonlinear_activation_params: Dict[str, Any] = None
    dtype: jnp.dtype = jnp.float32
    stack_impl: str = "auto"

    @property
    def upsample_factor(self) -> int:
        out = 1
        for s in self.upsample_scales:
            out *= s
        return out

    @nn.compact
    def __call__(self, x, c, *, deterministic: bool = True):
        c = ConvInUpsampleNet(
            tuple(self.upsample_scales), self.aux_channels,
            self.aux_context_window, self.freq_axis_kernel_size,
            self.use_weight_norm,
            nonlinear_activation=self.nonlinear_activation,
            nonlinear_activation_params=self.nonlinear_activation_params,
            interpolate_mode=self.interpolate_mode,
            use_causal_conv=self.use_causal_conv,
            dtype=self.dtype, name="upsample_net")(c)
        x = WNConv1d(self.residual_channels, 1, use_bias=True,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="first_conv")(x)
        x, skips = ResidualStack(
            layers=self.layers, stacks=self.stacks,
            kernel_size=self.kernel_size,
            residual_channels=self.residual_channels,
            gate_channels=self.gate_channels,
            skip_channels=self.skip_channels,
            aux_channels=self.aux_channels,
            dropout=self.dropout, bias=self.bias,
            use_weight_norm=self.use_weight_norm,
            use_causal_conv=self.use_causal_conv, dtype=self.dtype,
            impl=self.stack_impl, name="stack")(
                x, c, deterministic=deterministic)
        skips = skips * math.sqrt(1.0 / self.layers)

        h = nn.relu(skips).astype(self.dtype)
        h = nn.relu(WNConv1d(self.skip_channels, 1, use_bias=True,
                             use_weight_norm=self.use_weight_norm,
                             dtype=self.dtype, name="last_conv_0")(h))
        return WNConv1d(self.out_channels, 1, use_bias=True,
                        use_weight_norm=self.use_weight_norm,
                        dtype=self.dtype, name="last_conv_1")(h)


_PWG_APPLY_CACHE: Dict[int, Any] = {}


def _pwg_apply(generator, variables, noise, mel):
    """Per-generator-instance jitted apply.  Modules built from YAML
    carry list fields, so they are not hashable static args; keyed by
    id() with a weakref + finalizer so entries (and their compiled
    executables) are evicted when the generator is garbage collected."""
    import weakref
    key = id(generator)
    entry = _PWG_APPLY_CACHE.get(key)
    if entry is None or entry[0]() is not generator:
        fn = jax.jit(generator.apply)
        _PWG_APPLY_CACHE[key] = (weakref.ref(generator), fn)
        weakref.finalize(generator, _PWG_APPLY_CACHE.pop, key, None)
        entry = _PWG_APPLY_CACHE[key]
    return entry[1](variables, noise, mel)


def pwg_inference(generator: PWGGenerator, variables, mel, rng=None,
                  noise=None):
    """Single/batched mel -> waveform.

    ``mel``: (T', aux) or (B, T', aux) log-mel (already normalizer-scaled).
    Pads ``aux_context_window`` frames on each side in replicate mode, as
    the reference does at inference (parallel_wavegan.py:498-520), so the
    output has exactly T' * upsample_factor samples.  The generator apply
    is jit-cached (flax modules hash by definition, so repeated calls for
    the same padded shape reuse the compiled program; eager dispatch of
    the 30-layer stack costs seconds per utterance on a remote backend).
    """
    if mel.ndim == 2:
        mel = mel[None]
        squeeze = True
    else:
        squeeze = False
    w = generator.aux_context_window
    mel = jnp.pad(mel, ((0, 0), (w, w), (0, 0)), mode="edge")
    t_out = (mel.shape[1] - 2 * w) * generator.upsample_factor
    if noise is None:
        noise = jax.random.normal(rng, (mel.shape[0], t_out, 1))
    wav = _pwg_apply(generator, variables, noise, mel)
    return (wav[0, :, 0] if squeeze else wav[..., 0])


def _pwg_receptive_frames(generator: PWGGenerator) -> int:
    """Mel-frame context that fully covers the generator's one-sided
    receptive field: the dilated residual stack (sum of dilations x
    (k-1)/2 samples per side) plus the polyphase upsampler's few frames
    of time taps."""
    per = generator.layers // generator.stacks
    rf_samples = (generator.stacks * sum(2 ** i for i in range(per))
                  * ((generator.kernel_size - 1) // 2))
    hop = generator.upsample_factor
    return -(-rf_samples // hop) + 4


def pwg_streaming_inference(generator: PWGGenerator, variables, mel,
                            rng=None, noise=None, *,
                            chunk_frames: int = 256,
                            context_frames: Optional[int] = None):
    """Chunked mel -> waveform, numerically identical to
    :func:`pwg_inference` on the full utterance.

    Production-serving path the reference lacks: each chunk of
    ``chunk_frames`` mel frames is vocoded with ``context_frames`` of
    overlap on both sides (>= the generator's receptive field, so the
    kept center samples are exact), with ONE fixed-shape compiled
    program regardless of utterance length.  Peak activation memory is
    O(chunk) instead of O(T), and the first audio chunk is ready after
    one chunk's latency instead of the whole utterance's.

    Yields nothing — returns the assembled waveform; chunk-by-chunk
    consumers can instead call the internals per chunk (the jit cache
    keyed on the padded chunk shape makes that equally cheap).
    """
    if mel.ndim == 2:
        mel = mel[None]
        squeeze = True
    else:
        squeeze = False
    b, t_mel, aux = mel.shape
    w = generator.aux_context_window
    hop = generator.upsample_factor
    c = (_pwg_receptive_frames(generator) if context_frames is None
         else context_frames)

    # replicate-pad once (like pwg_inference), then vocode clamped
    # fixed-size windows: every window stays inside the signal, so an
    # edge window's boundary IS the true signal boundary and the convs'
    # SAME zero-padding there matches the full-utterance run exactly;
    # interior windows keep only the center, >= c frames from either
    # window edge (past the receptive field)
    mel_pad = jnp.pad(mel, ((0, 0), (w, w), (0, 0)), mode="edge")
    t_out = t_mel * hop
    if noise is None:
        noise = jax.random.normal(rng, (b, t_out, 1))

    win_inner = chunk_frames + 2 * c          # upsampled frames per window
    if t_mel <= win_inner:                    # too short to chunk: one shot
        wav = _pwg_apply(generator, variables, noise, mel_pad)
        return (wav[0, :, 0] if squeeze else wav[..., 0])

    pieces = []
    for s in range(0, t_mel, chunk_frames):
        keep = min(chunk_frames, t_mel - s)
        w0 = min(max(s - c, 0), t_mel - win_inner)
        mel_win = jax.lax.dynamic_slice_in_dim(
            mel_pad, w0, win_inner + 2 * w, axis=1)
        noise_win = jax.lax.dynamic_slice_in_dim(
            noise, w0 * hop, win_inner * hop, axis=1)
        wav_win = _pwg_apply(generator, variables, noise_win, mel_win)
        off = (s - w0) * hop
        pieces.append(wav_win[:, off:off + keep * hop])
    wav = jnp.concatenate(pieces, axis=1)
    return (wav[0, :, 0] if squeeze else wav[..., 0])


class PWGDiscriminator(nn.Module):
    """Stack of dilated convs + leaky relu; (B, T, 1) -> (B, T, 1) logits.

    ``impl='pallas'`` fuses layers 1..9 into one Pallas TPU kernel with
    a custom VJP (ops/pallas/pwg_disc.py: bf16 matmuls, fp32
    accumulation) — the discriminator-side counterpart of the
    generator's ``stack_impl='pallas'`` and part of the same blessed
    training path; 'xla' (default) keeps the per-layer shifted matmuls
    in the model dtype; 'auto' picks the fused kernel exactly where it
    measured faster (TPU, fp32, supported config) and XLA otherwise.
    Param trees are identical for all three."""
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 10
    conv_channels: int = 64
    dilation_factor: int = 1
    negative_slope: float = 0.2
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Dict[str, Any] = None
    bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"
    # fused-kernel VJP design: 'save' streams per-layer inputs to HBM in
    # the forward; 'recompute' rebuilds them in the backward's VMEM.
    # Default 'save': recompute wins the isolated kernel A/B but loses
    # ~1% at GAN-step level on both dtypes (docs/tpu_performance.md r5)
    vjp_mode: str = "save"

    @nn.compact
    def __call__(self, x):
        if self.nonlinear_activation != "LeakyReLU":
            raise NotImplementedError(
                "only LeakyReLU is supported (the reference default)")
        slope = (self.nonlinear_activation_params or {}).get(
            "negative_slope", self.negative_slope)

        def conv(i, features, dilation):
            return WNConv1d(features, self.kernel_size, dilation=dilation,
                            use_bias=self.bias,
                            use_weight_norm=self.use_weight_norm,
                            dtype=self.dtype,
                            name=("conv_last" if i == self.layers - 1
                                  else f"conv_{i}"))

        use_pallas = False
        if self.impl in ("pallas", "auto"):
            from ..ops.pallas.pwg_disc import (fused_disc_supported,
                                               fused_disc_tail)
            supported = fused_disc_supported(
                self.in_channels, self.out_channels, self.kernel_size,
                self.layers, self.conv_channels, self.dilation_factor)
            if self.impl == "pallas":
                if not supported:
                    raise ValueError("fused pallas discriminator unsupported "
                                     "for this configuration")
                use_pallas = True
            else:
                # measured policy (docs/tpu_performance.md, round 4): the
                # fused kernel wins the fp32 GAN step (+20-38% ips) but
                # loses under dtype=bfloat16, where the XLA disc already
                # runs at MXU rate and the kernel's half-width K=64 dots
                # plus save streams cost more than they save.
                use_pallas = (supported
                              and self.dtype == jnp.float32
                              and jax.default_backend() in ("tpu", "axon"))
        if use_pallas:
            # layer 0 (1 -> 64, K=1 outer products) stays in XLA; the
            # kernel consumes the materialized weights of layers 1..9
            h = nn.leaky_relu(conv(0, self.conv_channels, 1)(x), slope)
            dummy = jnp.zeros((1, 1, self.conv_channels), x.dtype)
            kernels, biases = [], []
            for i in range(1, self.layers - 1):
                k, b = conv(i, self.conv_channels, i)(
                    dummy, return_weights=True)
                kernels.append(k)
                biases.append(b)
            k, b = conv(self.layers - 1, self.out_channels, 1)(
                dummy, return_weights=True)
            kernels.append(k)
            biases.append(b)
            return fused_disc_tail(h.astype(jnp.float32), kernels, biases,
                                   negative_slope=slope,
                                   vjp_mode=self.vjp_mode).astype(self.dtype)

        h = x
        for i in range(self.layers - 1):
            dilation = 1 if i == 0 else (
                i if self.dilation_factor == 1 else self.dilation_factor ** i)
            h = conv(i, self.conv_channels, dilation)(h)
            h = nn.leaky_relu(h, slope)
        return conv(self.layers - 1, self.out_channels, 1)(h)


class ResidualPWGDiscriminator(nn.Module):
    """WaveNet-style discriminator (no aux conditioning)."""
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = WNConv1d(self.residual_channels, 1, use_bias=True,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="first_conv")(x)
        h = nn.leaky_relu(h, self.negative_slope)
        h, skips = ResidualStack(
            layers=self.layers, stacks=self.stacks,
            kernel_size=self.kernel_size,
            residual_channels=self.residual_channels,
            gate_channels=self.gate_channels,
            skip_channels=self.skip_channels, aux_channels=None,
            dropout=self.dropout, bias=self.bias,
            use_weight_norm=self.use_weight_norm, dtype=self.dtype,
            impl="xla", name="stack")(h, None, deterministic=deterministic)
        skips = skips * math.sqrt(1.0 / self.layers)

        h = nn.leaky_relu(skips.astype(self.dtype), self.negative_slope)
        h = nn.leaky_relu(
            WNConv1d(self.skip_channels, 1, use_bias=True,
                     use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                     name="last_conv_0")(h), self.negative_slope)
        return WNConv1d(self.out_channels, 1, use_bias=True,
                        use_weight_norm=self.use_weight_norm,
                        dtype=self.dtype, name="last_conv_1")(h)

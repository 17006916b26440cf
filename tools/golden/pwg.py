"""Torch golden oracle for the Parallel WaveGAN generator.

Implements the reference PWGGenerator forward math (reference:
parakeet/models/parallel_wavegan/parallel_wavegan.py:318-472) as plain
functional torch, consuming a paddle-layout state dict
(Conv1D weight (out, in, k); weight-normed convs stored as
weight_v/weight_g with dim=0).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from .common import make_grad_state, to_tensor as _f64


def _wn(state, prefix):
    """Fold paddle weight norm: weight = g * v / ||v||, norm over all
    axes but 0 (parallel_wavegan.py:474-483 applies nn.utils.weight_norm
    with the default dim=0)."""
    v = _f64(state[f"{prefix}.weight_v"])
    g = _f64(state[f"{prefix}.weight_g"])
    norm = v.flatten(1).norm(dim=1).reshape((-1,) + (1,) * (v.ndim - 1))
    return v * (g.reshape_as(norm) / norm)


def _bias(state, prefix):
    b = state.get(f"{prefix}.bias")
    return None if b is None else _f64(b)


def golden_pwg_forward_t(state, noise_ncl, mel_ncl, *, layers, stacks,
                         upsample_scales, aux_context_window):
    """noise (N, C_in, T) and pre-padded mel (N, C_aux, T'+2w) ->
    waveform (N, 1, T), float64 torch (grad-capable when ``state``
    holds requires_grad tensors)."""
    x = _f64(noise_ncl)
    c = _f64(mel_ncl)

    # ConvInUpsampleNet: valid conv_in over the padded mel, then per
    # scale nearest-stretch (time) + (1, 2s+1) SAME conv
    c = F.conv1d(c, _wn(state, "upsample_net.conv_in"))
    c = c.unsqueeze(1)                                   # (N, 1, F, T)
    for i, s in enumerate(upsample_scales):
        c = F.interpolate(c, scale_factor=(1, s), mode="nearest")
        w = _wn(state, f"upsample_net.upsample.up_layers.{i * 2 + 1}")
        c = F.conv2d(c, w, padding=(0, s))
    c = c.squeeze(1)                                     # (N, F, T_up)

    x = F.conv1d(x, _wn(state, "first_conv"), _bias(state, "first_conv"))
    assert c.shape[-1] == x.shape[-1], (c.shape, x.shape)

    layers_per_stack = layers // stacks
    skips = 0.0
    for i in range(layers):
        d = 2 ** (i % layers_per_stack)
        p = f"conv_layers.{i}"
        kernel = _wn(state, f"{p}.conv")
        pad = (kernel.shape[-1] - 1) // 2 * d
        h = F.conv1d(x, kernel, _bias(state, f"{p}.conv"),
                     dilation=d, padding=pad)
        h = h + F.conv1d(c, _wn(state, f"{p}.conv1x1_aux"))
        a, b = torch.chunk(h, 2, dim=1)
        h = torch.tanh(a) * torch.sigmoid(b)
        skips = skips + F.conv1d(h, _wn(state, f"{p}.conv1x1_skip"),
                                 _bias(state, f"{p}.conv1x1_skip"))
        x = (F.conv1d(h, _wn(state, f"{p}.conv1x1_out"),
                      _bias(state, f"{p}.conv1x1_out")) + x) * math.sqrt(0.5)
    skips = skips * math.sqrt(1.0 / layers)

    y = F.relu(skips)
    y = F.conv1d(y, _wn(state, "last_conv_layers.1"),
                 _bias(state, "last_conv_layers.1"))
    y = F.relu(y)
    y = F.conv1d(y, _wn(state, "last_conv_layers.3"),
                 _bias(state, "last_conv_layers.3"))
    return y


def golden_pwg_forward(state, noise_ncl, mel_ncl, **cfg):
    """numpy wrapper around :func:`golden_pwg_forward_t`."""
    return golden_pwg_forward_t(state, noise_ncl, mel_ncl, **cfg).numpy()


def golden_pwg_discriminator(state, x_ncl, *, layers=10):
    """Reference PWGDiscriminator forward (parallel_wavegan.py:554-598):
    [weight-normed dilated conv + leaky_relu(0.2)] x (layers-1), then a
    final conv.  Convs sit at even Sequential indices.  x (N, 1, T)."""
    h = _f64(x_ncl)
    for i in range(layers - 1):
        d = 1 if i == 0 else i
        p = f"conv_layers.{2 * i}"
        w = _wn(state, p)
        pad = (w.shape[-1] - 1) // 2 * d
        h = F.conv1d(h, w, _bias(state, p), dilation=d, padding=pad)
        h = F.leaky_relu(h, 0.2)
    p = f"conv_layers.{2 * (layers - 1)}"
    w = _wn(state, p)
    return F.conv1d(h, w, _bias(state, p), padding=(w.shape[-1] - 1) // 2)


def golden_mrstft_loss(x, y, fft_sizes, hop_sizes, win_lengths):
    """Reference MultiResolutionSTFTLoss (stft_loss.py:70-219) in fp64
    torch: per resolution, sc = ||Y - X||_F / ||Y||_F and
    mag = mean |log Y - log X| on sqrt(clip(|STFT|^2, 1e-7)) magnitudes
    (center/reflect framing, hann window); averaged over resolutions."""
    sc_total, mag_total = 0.0, 0.0
    for fs, hs, wl in zip(fft_sizes, hop_sizes, win_lengths):
        win = torch.hann_window(wl, dtype=torch.float64)
        sx = torch.stft(x, fs, hs, wl, win, center=True,
                        pad_mode="reflect", return_complex=True)
        sy = torch.stft(y, fs, hs, wl, win, center=True,
                        pad_mode="reflect", return_complex=True)
        xm = torch.sqrt(torch.clamp(sx.real ** 2 + sx.imag ** 2,
                                    min=1e-7))
        ym = torch.sqrt(torch.clamp(sy.real ** 2 + sy.imag ** 2,
                                    min=1e-7))
        sc_total = sc_total + (ym - xm).norm() / ym.norm().clamp(min=1e-10)
        mag_total = mag_total + (ym.clamp(min=1e-7).log()
                                 - xm.clamp(min=1e-7).log()).abs().mean()
    n = len(fft_sizes)
    return sc_total / n, mag_total / n


def golden_pwg_gan_grads(gen_state, disc_state, noise_ncl, mel_ncl, wav,
                         *, gen_cfg, disc_layers, lambda_adv=4.0,
                         fft_sizes=(256, 128), hop_sizes=(64, 32),
                         win_lengths=(128, 64)):
    """Training-numerics oracle for the two-optimizer GAN step
    (reference updater semantics, parallel_wavegan_updater.py:76-151):

    - generator grads of  sc + mag + lambda_adv * MSE(D(G(z)), 1)
      (discriminator past warmup, so the adversarial term is live);
    - discriminator grads of  MSE(D(y), 1) + MSE(D(stopgrad G(z)), 0).

    Returns (metrics dict, gen_grads {paddle name: fp64 np},
    disc_grads).  fp64 end to end.
    """
    gs = make_grad_state(gen_state)
    ds = make_grad_state(disc_state)
    wav_t = _f64(wav)

    fake = golden_pwg_forward_t(gs, noise_ncl, mel_ncl, **gen_cfg)
    sc, mag = golden_mrstft_loss(fake[:, 0], wav_t, fft_sizes,
                                 hop_sizes, win_lengths)
    adv_logits = golden_pwg_discriminator(ds, fake, layers=disc_layers)
    adv = ((adv_logits - 1.0) ** 2).mean()
    gen_loss = sc + mag + lambda_adv * adv
    gen_loss.backward()
    gen_grads = {k: t.grad.detach().numpy() if t.grad is not None
                 else np.zeros(t.shape, np.float64)
                 for k, t in gs.items()}
    # discriminator update sees a fresh graph with the fake detached
    for t in ds.values():
        t.grad = None
    real_logits = golden_pwg_discriminator(ds, wav_t.unsqueeze(1),
                                           layers=disc_layers)
    fake_logits = golden_pwg_discriminator(ds, fake.detach(),
                                           layers=disc_layers)
    real_loss = ((real_logits - 1.0) ** 2).mean()
    fake_loss = (fake_logits ** 2).mean()
    disc_loss = real_loss + fake_loss
    disc_loss.backward()
    disc_grads = {k: t.grad.detach().numpy() if t.grad is not None
                  else np.zeros(t.shape, np.float64)
                  for k, t in ds.items()}
    metrics = {"generator_loss": float(gen_loss.detach()),
               "spectral_convergence_loss": float(sc.detach()),
               "log_stft_magnitude_loss": float(mag.detach()),
               "adversarial_loss": float(adv.detach()),
               "discriminator_loss": float(disc_loss.detach()),
               "real_loss": float(real_loss.detach()),
               "fake_loss": float(fake_loss.detach())}
    return metrics, gen_grads, disc_grads

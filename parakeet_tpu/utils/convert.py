"""Convert released Paddle Parakeet checkpoints to parakeet_tpu pytrees.

The reference ships weight-normalized Paddle state dicts (reference:
parakeet/models/parallel_wavegan/parallel_wavegan.py:401-496; released
checkpoints listed in README.md:90-120).  Layout differences handled
here:

- Paddle Conv1D weight (out, in, k)  ->  flax kernel (k, in, out)
- Paddle Conv2D weight (out=1, in=1, kf, kt) -> UpsampleNet kernel
  (kt, kf, 1, 1)  (the reference's mel "image" is (B, 1, F, T'): freq is
  H, time is W, parallel_wavegan.py:101-133)
- paddle weight_norm (weight_g, weight_v) -> our (scale, kernel): both
  parameterize weight = g * v / ||v|| with the norm over every axis but
  the output channel, so scale = g.flatten(), kernel = transposed v
- per-block ResidualBlock weights (conv_layers.{i}.*) -> layer-stacked
  (L, ...) arrays of ResidualStack

Input format: a dict of numpy arrays keyed by Paddle parameter names
(e.g. ``np.load("ckpt.npz")`` of a paddle-side
``np.savez(path, **{k: np.asarray(v) for k, v in sd.items()})`` dump, or
a pickle of the same).  Loading ``.pdparams`` directly requires paddle
to unpickle; dump to npz on the paddle side first.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["load_paddle_state", "convert_pwg_generator",
           "convert_fastspeech2"]


def load_paddle_state(path) -> Dict[str, np.ndarray]:
    path = str(path)
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: np.asarray(data[k]) for k in data.files}
    import pickle
    with open(path, "rb") as f:
        state = pickle.load(f)
    return {k: np.asarray(v) for k, v in state.items()}


def _wn_conv1d(state, prefix, bias=True):
    """paddle weight-normed Conv1D -> {kernel, scale[, bias]}."""
    v = state[f"{prefix}.weight_v"]
    g = state[f"{prefix}.weight_g"]
    out = {"kernel": v.transpose(2, 1, 0).astype(np.float32),
           "scale": g.reshape(-1).astype(np.float32)}
    if bias:
        out["bias"] = state[f"{prefix}.bias"].astype(np.float32)
    return out


def convert_pwg_generator(state: Dict[str, np.ndarray],
                          layers: int = 30,
                          upsample_scales=(4, 5, 3, 5),
                          nonlinear_activation: bool = False
                          ) -> Dict[str, dict]:
    """Paddle PWGGenerator state dict -> parakeet_tpu params pytree
    (drop-in for ``PWGGenerator(...).init(...)['params']``)."""
    params: Dict[str, dict] = {}
    params["first_conv"] = _wn_conv1d(state, "first_conv")

    up: Dict[str, np.ndarray] = {}
    up_net = {"conv_in": _wn_conv1d(state, "upsample_net.conv_in",
                                    bias=False)}
    # up_layers = [Stretch2D, Conv2D(, activation)] per scale; convs sit
    # at index 1 within each group (parallel_wavegan.py:101-117)
    group = 3 if nonlinear_activation else 2
    for i, _scale in enumerate(upsample_scales):
        idx = i * group + 1
        v = state[f"upsample_net.upsample.up_layers.{idx}.weight_v"]
        g = state[f"upsample_net.upsample.up_layers.{idx}.weight_g"]
        # (1, 1, kf, kt) -> (kt, kf, 1, 1)
        up[f"conv_{i}_kernel"] = v[0, 0].T[..., None, None].astype(
            np.float32)
        up[f"conv_{i}_scale"] = g.reshape(-1).astype(np.float32)
    up_net["upsample"] = up
    params["upsample_net"] = up_net

    stack: Dict[str, np.ndarray] = {}

    def stack_conv(name, paddle_attr, bias):
        ks, gs, bs = [], [], []
        for i in range(layers):
            p = f"conv_layers.{i}.{paddle_attr}"
            ks.append(state[f"{p}.weight_v"].transpose(2, 1, 0))
            gs.append(state[f"{p}.weight_g"].reshape(-1))
            if bias:
                bs.append(state[f"{p}.bias"])
        stack[f"{name}_kernel"] = np.stack(ks).astype(np.float32)
        stack[f"{name}_scale"] = np.stack(gs).astype(np.float32)
        if bias:
            stack[f"{name}_bias"] = np.stack(bs).astype(np.float32)

    stack_conv("conv", "conv", bias=True)
    stack_conv("aux", "conv1x1_aux", bias=False)
    stack_conv("skip", "conv1x1_skip", bias=True)
    stack_conv("out", "conv1x1_out", bias=True)
    # stacked dilated kernels: (L, k, in, out); 1x1 convs collapse to
    # (L, in, out)
    stack["aux_kernel"] = stack["aux_kernel"][:, 0]
    stack["skip_kernel"] = stack["skip_kernel"][:, 0]
    stack["out_kernel"] = stack["out_kernel"][:, 0]
    params["stack"] = stack

    # last_conv_layers = Sequential(ReLU, Conv1D, ReLU, Conv1D)
    params["last_conv_0"] = _wn_conv1d(state, "last_conv_layers.1")
    params["last_conv_1"] = _wn_conv1d(state, "last_conv_layers.3")
    return params


def _conv1d(state, prefix, bias=True):
    """paddle Conv1D (out, in, k) -> flax kernel (k, in, out)."""
    out = {"kernel": state[f"{prefix}.weight"].transpose(2, 1, 0).astype(
        np.float32)}
    if bias:
        out["bias"] = state[f"{prefix}.bias"].astype(np.float32)
    return out


def _dense(state, prefix):
    """paddle Linear (in, out) -> flax kernel (in, out): direct copy."""
    return {"kernel": state[f"{prefix}.weight"].astype(np.float32),
            "bias": state[f"{prefix}.bias"].astype(np.float32)}


def _layernorm(state, prefix):
    return {"scale": state[f"{prefix}.weight"].astype(np.float32),
            "bias": state[f"{prefix}.bias"].astype(np.float32)}


def _mha(state, prefix, heads):
    """ESPnet MultiHeadedAttention linear_{q,k,v,out} -> flax q/k/v/out.

    paddle Linear weight is (in, out); q/k/v reshape the OUT dim into
    (heads, head_dim), the out-projection reshapes the IN dim — matching
    the contiguous head split of the reference (fastspeech2_transformer/
    attention.py:42-90).
    """
    feat = state[f"{prefix}.linear_q.weight"].shape[0]
    dk = feat // heads
    out = {}
    for name in ("q", "k", "v"):
        w = state[f"{prefix}.linear_{name}.weight"].astype(np.float32)
        b = state[f"{prefix}.linear_{name}.bias"].astype(np.float32)
        out[name] = {"kernel": w.reshape(feat, heads, dk),
                     "bias": b.reshape(heads, dk)}
    w = state[f"{prefix}.linear_out.weight"].astype(np.float32)
    out["out"] = {"kernel": w.reshape(heads, dk, feat),
                  "bias": state[f"{prefix}.linear_out.bias"].astype(
                      np.float32)}
    return out


def _transformer_stack(state, prefix, n_layers, heads, pos_alpha_idx):
    """ESPnet TransformerEncoder -> our encoder/decoder subtree.

    ``pos_alpha_idx``: index of ScaledPositionalEncoding inside the
    paddle ``embed`` Sequential (1 when preceded by an Embedding, 0 for
    the decoder's input_layer=None case, fastspeech2.py:171-269).
    """
    tree = {"pos_enc": {"alpha": state[
        f"{prefix}.embed.{pos_alpha_idx}.alpha"].reshape(1).astype(
            np.float32)}}
    if pos_alpha_idx == 1:
        tree["embed"] = {"embedding": state[
            f"{prefix}.embed.0.weight"].astype(np.float32)}
    for i in range(n_layers):
        lp = f"{prefix}.encoders.{i}"
        tree[f"layer_{i}"] = {
            "self_attn": _mha(state, f"{lp}.self_attn", heads),
            "norm1": _layernorm(state, f"{lp}.norm1"),
            "norm2": _layernorm(state, f"{lp}.norm2"),
            "MultiLayerConv_0": {
                "Conv_0": _conv1d(state, f"{lp}.feed_forward.w_1"),
                "Conv_1": _conv1d(state, f"{lp}.feed_forward.w_2"),
            },
        }
    tree["after_norm"] = _layernorm(state, f"{prefix}.after_norm")
    return tree


def _predictor(state, prefix, n_layers):
    """Duration/variance predictor conv stack (duration_predictor.py:
    69-83: conv.{i} = Sequential(Conv1D, ReLU, LayerNorm, Dropout))."""
    stack = {}
    for i in range(n_layers):
        stack[f"conv_{i}"] = _conv1d(state, f"{prefix}.conv.{i}.0")
        stack[f"norm_{i}"] = _layernorm(state, f"{prefix}.conv.{i}.2")
    stack["linear"] = _dense(state, f"{prefix}.linear")
    return {"stack": stack}


def convert_fastspeech2(state: Dict[str, np.ndarray],
                        elayers: int = 4, dlayers: int = 4,
                        aheads: int = 2, postnet_layers: int = 5,
                        predictor_layers: int = 2,
                        pitch_predictor_layers: int = 5,
                        energy_predictor_layers: int = 2):
    """Paddle FastSpeech2 state dict -> (params, batch_stats) pytrees
    (drop-in for ``FastSpeech2(...).init(...)``); reference module tree
    at parakeet/models/fastspeech2/fastspeech2.py:171-274."""
    params = {
        "encoder": _transformer_stack(state, "encoder", elayers, aheads,
                                      pos_alpha_idx=1),
        "decoder": _transformer_stack(state, "decoder", dlayers, aheads,
                                      pos_alpha_idx=0),
        "duration_predictor": _predictor(state, "duration_predictor",
                                         predictor_layers),
        "pitch_predictor": _predictor(state, "pitch_predictor",
                                      pitch_predictor_layers),
        "energy_predictor": _predictor(state, "energy_predictor",
                                       energy_predictor_layers),
        "pitch_embed": {"conv": _conv1d(state, "pitch_embed.0")},
        "energy_embed": {"conv": _conv1d(state, "energy_embed.0")},
        "feat_out": _dense(state, "feat_out"),
    }
    batch_stats = {}
    postnet = {}
    bn_stats = {}
    for i in range(postnet_layers):
        postnet[f"conv_{i}"] = _conv1d(state, f"postnet.postnet.{i}.0",
                                       bias=False)
        bn = f"postnet.postnet.{i}.1"
        postnet[f"bn_{i}"] = _layernorm(state, bn)
        bn_stats[f"bn_{i}"] = {
            "mean": state[f"{bn}._mean"].astype(np.float32),
            "var": state[f"{bn}._variance"].astype(np.float32)}
    params["postnet"] = postnet
    batch_stats["postnet"] = bn_stats
    return params, batch_stats

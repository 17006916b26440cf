"""Global weight-initialization dispatch (reference:
parakeet/modules/nets_utils.py:128-165 `initialize`).

The reference installs a paddle global initializer (scheme for weights,
zeros for biases) before building ESPnet-style models, selected by the
recipe's ``init_type`` (e.g. ``xavier_uniform`` in the TransformerTTS /
FastSpeech2 configs).  The functional equivalent here re-samples an
already-initialized params pytree: every rank>=2 kernel (dense/conv
kernels, embeddings) is redrawn from the chosen scheme and every rank<2
leaf (biases, LayerNorm/BatchNorm scales, scalar alphas) is left
untouched — matching what survives the reference's dispatch after its
explicit per-module overrides run.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["initialize_pytree", "INIT_SCHEMES"]

INIT_SCHEMES = {
    "xavier_uniform": jax.nn.initializers.glorot_uniform,
    "xavier_normal": jax.nn.initializers.glorot_normal,
    "kaiming_uniform": jax.nn.initializers.he_uniform,
    "kaiming_normal": jax.nn.initializers.he_normal,
}


def initialize_pytree(params, rng, init_type: str):
    """Redraw every rank>=2 leaf of ``params`` from ``init_type``.

    Fans follow the flax kernel convention (leading axes = receptive
    field, then in, out), which matches paddle's fan computation for
    both Linear and Conv weights.
    """
    if init_type not in INIT_SCHEMES:
        raise ValueError(
            f"Unknown initialization: {init_type} "
            f"(choose from {sorted(INIT_SCHEMES)})")
    init = INIT_SCHEMES[init_type]()
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for leaf, key in zip(leaves, keys):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            out.append(init(key, leaf.shape, jnp.asarray(leaf).dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)

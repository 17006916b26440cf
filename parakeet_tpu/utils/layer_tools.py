"""Parameter pytree inspection helpers.

Equivalent of the reference layer tools (reference:
parakeet/utils/layer_tools.py:12-57) reworked for immutable pytrees:
summary, parameter count, gradient norm; freeze/unfreeze become optax
masks (freezing in a functional framework = zeroing updates, not flags).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["summary", "num_parameters", "gradient_norm", "freeze_mask",
           "freeze_optimizer"]


def num_parameters(params: Any) -> int:
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params))


def summary(params: Any, print_fn: Callable[[str], None] = print) -> int:
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        n = int(np.prod(leaf.shape))
        total += n
        print_fn(f"{name:<60s} {str(leaf.shape):<20s} {n}")
    print_fn(f"total parameters: {total}")
    return total


def gradient_norm(grads: Any) -> jnp.ndarray:
    return optax.global_norm(grads)


def freeze_mask(params: Any, predicate: Callable[[str], bool]) -> Any:
    """True where the parameter (by '/'-joined path) should be FROZEN."""
    def mask(path, leaf):
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        return predicate(name)
    return jax.tree_util.tree_map_with_path(mask, params)


def freeze_optimizer(tx: optax.GradientTransformation,
                     params: Any,
                     predicate: Callable[[str], bool]
                     ) -> optax.GradientTransformation:
    """Wrap ``tx`` so parameters matching ``predicate`` receive zero
    updates (the functional analog of the reference's ``freeze``)."""
    mask = freeze_mask(params, predicate)
    return optax.multi_transform(
        {"frozen": optax.set_to_zero(), "trainable": tx},
        jax.tree_util.tree_map(
            lambda m: "frozen" if m else "trainable", mask))
